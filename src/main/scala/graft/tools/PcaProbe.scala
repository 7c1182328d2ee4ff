package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-level timing of ops.Pca at a fixture dir. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.t(spark, sfDir, "embeddings")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[pca] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warm count")(e.count())
    val g = t("gram collect")(
      graft.ops.Pca.gram(e, "embedding", 64, 10000).collect().length)
    System.err.println(s"[pca] gram rows $g")
    val x = t("direction (incl. 2nd gram run)")(
      graft.ops.Pca.dominantDirection(e, "embedding", 64, 10000, 8, 1000000L))
    t("project")(
      graft.ops.Pca.project(e, "vec_id", "embedding", 10000, x).count())
    graft.ops.Pca.gram(e, "embedding", 64, 10000).explain("formatted")
    spark.stop()
  }
}
