package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-round timing + plan for the iterative graph ops at bench
  * configs (round-11 optimization work). Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProbeGraph pagerank
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.4)
          println(f"[stage] ${i.stageId}%4d ${dur}%7.2fs tasks=${i.numTasks}%4d  ${i.name.take(90)}")
      }
    })
    val t0 = System.nanoTime()
    def mark(msg: String): Unit =
      println(f"[probe] ${(System.nanoTime() - t0) / 1e9}%8.2fs  $msg")

    val which = if (args.nonEmpty) args(0) else "pagerank"
    val orders = graft.sources.Tables.t(spark, sfDir, "orders")
    val li = graft.sources.Tables.t(spark, sfDir, "lineitem")

    which match {
      case "pagerank" =>
        val pairs = orders
          .join(li, orders("o_orderkey") === li("l_orderkey"))
          .select(col("o_custkey").cast("long").as("c"),
            (col("l_suppkey").cast("long") + lit(1000000L)).as("s"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
          .union(pairs.select(col("s").as("src"), col("c").as("dst")))
          .persist()
        mark(s"edges built: ${edges.count()} rows")
        val nPart = cpus.toInt
        val e = edges
        val ewd = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
          .repartition(nPart, col("src"))
          .sortWithinPartitions("src")
          .persist()
        mark(s"ewd built: ${ewd.count()} rows")
        val base = 1000000000000L / 100 * 15
        val rFromMsum =
          s"(CAST($base AS BIGINT) + CAST(85 AS DECIMAL(38,0)) " +
            s"* coalesce(msum, CAST(0 AS DECIMAL(38,0))) div 100)"
        def sumByDst(contribs: org.apache.spark.sql.DataFrame) = contribs
          .repartition(nPart, col("dst"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("contrib").cast("decimal(38,0)")).as("msum"))
        var msum = sumByDst(ewd
            .select(col("dst"), expr(s"CAST(1000000000000 AS BIGINT) div outdeg").as("contrib")))
          .localCheckpoint(true)
        mark(s"round 1 done (${msum.rdd.getNumPartitions} parts)")
        var i = 1
        while (i < 8) {
          val rstate = msum.select(col("node"), expr(rFromMsum).as("r"))
          val next = sumByDst(ewd.join(rstate, ewd("src") === rstate("node"), "left")
            .select(col("dst"),
              expr(s"coalesce(r, CAST($base AS BIGINT)) div outdeg").as("contrib")))
          if (i == 1) next.explain("formatted")
          msum = next.localCheckpoint(true)
          mark(s"round ${i + 1} done")
          i += 1
        }
        // OLD shape for same-process comparison: checkpointed ewd (unknown
        // partitioning), per-round ranks materialization + nodes join
        val ewdOld = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
          .repartition(nPart, col("src"))
          .localCheckpoint(true)
        val nodesOld = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node")))
          .distinct()
          .localCheckpoint(true)
        mark("old: ewd+nodes built")
        var ranks = nodesOld.withColumn("r", lit(1000000000000L)).localCheckpoint(true)
        var j = 0
        while (j < 8) {
          val ms = ewdOld.join(ranks, ewdOld("src") === ranks("node"))
            .select(col("dst"), expr("r div outdeg").as("contrib"))
            .groupBy(col("dst").as("node"))
            .agg(sum(col("contrib").cast("decimal(38,0)")).as("msum"))
          ranks = nodesOld.join(ms, Seq("node"), "left")
            .select(col("node"),
              (lit(base) + expr(
                s"CAST(85 AS DECIMAL(38,0)) * coalesce(msum, CAST(0 AS DECIMAL(38,0))) div 100"))
                .as("r"))
            .localCheckpoint(true)
          mark(s"old round ${j + 1} done")
          j += 1
        }
      case "lpa" =>
        val liPairs = li.select(col("l_orderkey"), col("l_partkey"))
        val edges = liPairs.as("x").join(liPairs.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") =!= col("y.l_partkey"))
          .select(col("x.l_partkey").cast("long").as("src"),
            col("y.l_partkey").cast("long").as("dst"))
          .distinct()
          .persist()
        mark(s"edges built: ${edges.count()} rows")
        val labsNew = graft.ops.LabelProp
          .census(edges, 4, assumeSymmetric = true)
        val gotNew = labsNew.agg(sum(col("size")), count(lit(1))).head()
        mark(s"NEW lpa census done: $gotNew")
        // OLD shape inline
        val nPart = cpus.toInt
        val e = edges.select(col("src"), col("dst"))
          .repartition(nPart, col("src"))
          .localCheckpoint(true)
        var labels = e.select(col("src").as("node")).distinct()
          .withColumn("label", col("node"))
          .localCheckpoint(true)
        var i = 0
        while (i < 4) {
          val counts = e.join(labels, e("src") === labels("node"))
            .groupBy(col("dst"), col("label"))
            .agg(count(lit(1)).as("cnt"))
          labels = counts
            .groupBy(col("dst").as("node"))
            .agg(min(struct((-col("cnt")).as("neg"), col("label"))).as("best"))
            .select(col("node"), col("best.label").as("label"))
            .localCheckpoint(true)
          mark(s"old lpa round ${i + 1} done")
          i += 1
        }
        val gotOld = labels.groupBy(col("label"))
          .agg(count(lit(1)).as("size"))
          .agg(sum(col("size")), count(lit(1))).head()
        mark(s"OLD lpa census done: $gotOld")
      case "tri" =>
        val liPairs = li.select(col("l_orderkey"), col("l_partkey"))
        def triOver(edges: org.apache.spark.sql.DataFrame, tag: String): Unit = {
          val eSym = edges.persist()
          mark(s"$tag edges built: ${eSym.count()} rows")
          val deg = eSym.groupBy(col("src")).agg(count(lit(1)).as("d")).persist()
          val canon = eSym.filter(col("src") < col("dst"))
          val tris = graft.ops.Triangles
            .trianglesCanonical(canon, Some(deg)).persist()
          val perNode = tris
            .select(explode(array(col("x"), col("y"), col("z"))).as("part"))
            .groupBy("part").agg(count(lit(1)).as("tri"))
          val total = tris.groupBy().agg(count(lit(1)).as("total_tri"))
          val out = perNode.crossJoin(broadcast(total))
            .orderBy(col("tri").desc, col("part"))
            .limit(20)
          out.write.format("noop").mode("overwrite").save()
          mark(s"$tag triangles done")
          eSym.unpersist(); deg.unpersist(); tris.unpersist()
        }
        val newEdges = liPairs.as("x").join(liPairs.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").cast("long").as("a"),
            col("y.l_partkey").cast("long").as("b"))
          .distinct()
          .select(explode(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val oldEdges = liPairs.as("x").join(liPairs.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") =!= col("y.l_partkey"))
          .select(col("x.l_partkey").cast("long").as("src"),
            col("y.l_partkey").cast("long").as("dst"))
          .distinct()
        triOver(newEdges, "NEW")
        triOver(oldEdges, "OLD")
        triOver(newEdges, "NEW2")
        triOver(oldEdges, "OLD2")
      case _ => sys.error(s"unknown probe $which")
    }
    spark.stop()
  }
}
