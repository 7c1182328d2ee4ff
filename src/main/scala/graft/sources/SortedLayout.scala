package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import scala.jdk.CollectionConverters._

/** Pinot sorted-column index analog (tableIndexConfig `sortedColumn`): Pinot
  * keeps each segment sorted on one column so lookups binary-search instead
  * of scan, and the broker prunes whole segments whose [min,max] metadata
  * excludes the predicate (`README.md:22` "optimizes segment pruning").
  *
  * The Spark-native form: write the table `repartitionByRange` +
  * `sortWithinPartitions` on the sort column, so every parquet file owns a
  * DISJOINT value range and every row group inside it is sorted. Two
  * pruning layers then answer point/range predicates:
  *
  *  - file-level: [[fileRanges]] reads ONLY parquet footers (one (min,max)
  *    pair per file — Pinot's segment metadata, ~bytes per segment at any
  *    scale) and [[prunedRead]] scans just the files whose range matches;
  *  - row-group-level: parquet min/max stats inside the chosen files, free
  *    via Spark's pushed filters on the sorted data.
  *
  * At 100 TB the footer manifest is ~1 (min,max) pair per 512 MB file —
  * a few hundred KB of driver metadata for the whole table — while an
  * unsorted layout leaves every file's range ≈ the full domain and prunes
  * nothing. (Production deployments park the same manifest in a catalog —
  * Delta/Iceberg file stats; this op shows the engine-level mechanism.)
  */
object SortedLayout {

  /** One file's footer metadata for the sort column. */
  final case class FileRange(path: String, min: Comparable[Any], max: Comparable[Any], rows: Long)

  /** Write `df` sorted on `sortCol` into `nFiles` disjoint-range files. */
  def write(df: DataFrame, dir: String, sortCol: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dir)

  /** Footer-only (min,max) per file — no data pages are read. */
  def fileRanges(spark: SparkSession, dir: String, sortCol: String): Seq[FileRange] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(s.getPath, conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala
          val stats = blocks.flatMap { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == sortCol).map(_.getStatistics)
          }
          require(stats.nonEmpty, s"no footer stats for $sortCol in ${s.getPath}")
          // BYTE_ARRAY stats surface as parquet Binary — keep them as
          // UTF8String, NOT java.lang.String: the files were range-ordered
          // by Spark's UTF8String (UTF-8 byte) order, and String's UTF-16
          // order diverges for supplementary-plane code points (emoji sorts
          // below U+FFFF in UTF-16 but above it in UTF-8 bytes), which
          // would prune the file that actually holds a probe term
          def unwrap(v: Any): Comparable[Any] = (v match {
            case b: org.apache.parquet.io.api.Binary =>
              org.apache.spark.unsafe.types.UTF8String.fromBytes(b.getBytes)
            case o => o
          }).asInstanceOf[Comparable[Any]]
          val mins = stats.map(s => unwrap(s.genericGetMin))
          val maxs = stats.map(s => unwrap(s.genericGetMax))
          FileRange(
            s.getPath.toString,
            mins.reduce((a, b) => if (a.compareTo(b) <= 0) a else b),
            maxs.reduce((a, b) => if (a.compareTo(b) >= 0) a else b),
            blocks.map(_.getRowCount).sum)
        } finally reader.close()
      }
      .toSeq
  }

  /** Probes arrive as java Strings from callers; string stats are stored as
    * UTF8String (see [[fileRanges]]) — align the probe to the stat domain so
    * both compare in UTF-8 byte order. */
  private def toStatDomain(v: Comparable[Any]): Comparable[Any] = ((v: Any) match {
    case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case o => o
  }).asInstanceOf[Comparable[Any]]

  /** Files whose [min,max] may contain a value in [lo,hi] — the broker-side
    * segment-pruning decision, made entirely from footer metadata. */
  def pruneFiles(ranges: Seq[FileRange], lo: Comparable[Any], hi: Comparable[Any]): Seq[FileRange] = {
    val (l, h) = (toStatDomain(lo), toStatDomain(hi))
    ranges.filter(r => r.max.compareTo(l) >= 0 && r.min.compareTo(h) <= 0)
  }

  /** Read only the files that can hold `sortCol ∈ [lo,hi]`, with the exact
    * predicate still applied (and pushed to parquet row-group stats) on the
    * survivors. */
  def prunedRead(
      spark: SparkSession, dir: String, sortCol: String,
      lo: Comparable[Any], hi: Comparable[Any]): DataFrame = {
    val keep = pruneFiles(fileRanges(spark, dir, sortCol), lo, hi)
    if (keep.isEmpty)
      spark.read.parquet(dir).limit(0)
    else
      spark.read.parquet(keep.map(_.path): _*)
        .filter(col(sortCol) >= lo.asInstanceOf[Any] && col(sortCol) <= hi.asInstanceOf[Any])
  }
}
