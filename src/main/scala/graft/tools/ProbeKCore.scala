package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 12): dump the PER-ROUND degree-aggregation plan of the
  * k-core peel under the new persisted-partitioned edge chain — the
  * declared q_graph_kcore plan only shows the post-loop trajectory frame
  * (the loop runs eagerly at query construction), so the
  * no-exchange-per-round claim needs this dump. The round-2 construction
  * below replays `ops/KCore.peelTrajectory`'s loop shape verbatim (same
  * repartition/sortWithinPartitions/persist chain, same checkpointed deg,
  * same semi-joins); if the op's shape changes, regenerate this dump —
  * the ProbeGraph drift caveat applies.
  */
object ProbeKCore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nPart = cpus.toInt
    // the same canonical co-purchase edge frame family the declared query
    // peels (kept tiny: the PLAN SHAPE is what this probe documents)
    val li = graft.sources.Tables.t(spark, sfDir, "lineitem")
    val und = li.select(col("l_orderkey").as("u"), col("l_partkey").as("v"))
      .where(col("u") =!= col("v")).distinct()
    val sym = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .toDF("src", "dst").distinct()
    var e = sym.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .repartition(nPart, col("src"))
      .sortWithinPartitions("src")
      .persist()
    val k = 3L
    var r = 0
    while (r < 2) {
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      if (r == 1) {
        println("===== round-1 degree aggregation over the persisted chain =====")
        deg.explain("formatted")
      }
      val degC = deg.localCheckpoint(true)
      val alive = degC.filter(col("d") >= k).select(col("src").as("node"))
      val kept = e
        .join(alive.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(alive.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
      val old = e
      e = kept.persist()
      e.count()
      old.unpersist()
      r += 1
    }
    e.unpersist()
    spark.stop()
  }
}
