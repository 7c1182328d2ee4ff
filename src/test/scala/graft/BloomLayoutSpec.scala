package graft

import graft.sources.{BloomLayout, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Pinot bloom-filter index analog: per-file bloom bitsets over a
  * hash-partitioned layout let an equality probe skip files from driver-side
  * metadata alone. Proven from real scan metrics: present values scan few
  * files, absent values scan zero (or only false-positive files, still
  * returning zero rows). */
class BloomLayoutSpec extends GraftSuite {

  test("bloom manifest prunes point lookups to the owning file; parity with full scan") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    val ev = Tables.t(spark, sfDir, "events").select("event_id", "user_id", "value")
    BloomLayout.write(ev, dir, "user_id", nFiles = 8)
    val manifest = BloomLayout.buildManifest(spark, dir, "user_id")

    // hash layout may leave a partition empty (no file written for it)
    assert(manifest.nonEmpty && manifest.size <= 8)
    assert(manifest.map(_.rows).sum === ev.count())

    // probe a real key: hash layout puts it in exactly one file; the bloom
    // must admit that file and (with high probability at this density)
    // reject most others
    val probe = ev.select("user_id").head().getLong(0)
    val hit = BloomLayout.pruneFiles(manifest, BloomLayout.hashPositions(spark, probe))
    assert(hit.nonEmpty && hit.size < manifest.size,
      s"bloom pruned nothing: ${hit.size}/${manifest.size} files admitted")

    val expected = ev.filter(col("user_id") === probe).collect().map(_.toString).sorted
    val pruned = BloomLayout.prunedRead(spark, dir, "user_id", probe, manifest)
    val got = pruned.collect().map(_.toString).sorted
    assert(got === expected && got.nonEmpty)

    // physical evidence: the executed scan opened exactly the admitted files
    val plan = pruned.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value === hit.size.toLong)
    assert(scan.metadata("PushedFilters").contains("user_id"))
  }

  test("absent value: bloom rejects all (or nearly all) files and the result is empty") {
    val dir = Files.createTempDirectory("graft-bloom-absent").toString
    val ev = Tables.t(spark, sfDir, "events").select("event_id", "user_id")
    BloomLayout.write(ev, dir, "user_id", nFiles = 8)
    val manifest = BloomLayout.buildManifest(spark, dir, "user_id")

    val absent = -987654321L // far outside the generated id domain
    val hit = BloomLayout.pruneFiles(manifest, BloomLayout.hashPositions(spark, absent))
    // false positives allowed, but at 2^16 bits / file they must be rare
    assert(hit.size <= 2, s"bloom admitted ${hit.size}/8 files for an absent key")
    assert(BloomLayout.prunedRead(spark, dir, "user_id", absent, manifest).count() === 0L)
  }

  test("string column: low-cardinality values map to their owning files only") {
    val dir = Files.createTempDirectory("graft-bloom-str").toString
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "source", "lang")
    BloomLayout.write(docs, dir, "source", nFiles = 8)
    val manifest = BloomLayout.buildManifest(spark, dir, "source")

    val sources = docs.select("source").distinct().collect().map(_.getString(0))
    sources.foreach { s =>
      val hit = BloomLayout.pruneFiles(manifest, BloomLayout.hashPositions(spark, s))
      // hash layout ⇒ one owning file; bloom may admit the odd extra
      assert(hit.nonEmpty && hit.size <= 3, s"source=$s admitted ${hit.size} files")
      val n = BloomLayout.prunedRead(spark, dir, "source", s, manifest).count()
      assert(n === docs.filter(col("source") === s).count())
    }
    // every row accounted for exactly once across the per-source reads
    val total = sources.map(s =>
      BloomLayout.prunedRead(spark, dir, "source", s, manifest).count()).sum
    assert(total === docs.count())
  }
}
