package graft

import graft.sources.AnnIndex
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Persisted incremental IVF index (sources/AnnIndex): bit-parity with the
  * in-memory IVF declared query, append-without-retrain parity, static
  * partition pruning evidence, and the k-means build path's recall. */
class AnnIndexSpec extends GraftSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_annidx").toString

  private def queriesFrame = Tables.t(spark, sfDir, "embeddings")
    .filter(col("vec_id") >= 20 && col("vec_id") < 40)

  test("index answers are bit-identical to the in-memory IVF declared query") {
    val dir = tmp()
    val e = Tables.t(spark, sfDir, "embeddings")
    AnnIndex.build(e, dir, "vec_id", "embedding", nCells = 16)
    val viaIndex = AnnIndex.topK(spark, dir, queriesFrame, "vec_id", "embedding",
        k = 3, probes = 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val viaMemory = SparkEntry.queries("q_sim_ann_ivf")(spark, sfDir)
      .collect().toSeq
    assert(viaIndex.map(_.toSeq) === viaMemory.map(_.toSeq))
  }

  test("append assigns against existing centroids: equals a full build") {
    val dir1 = tmp(); val dir2 = tmp()
    val e = Tables.t(spark, sfDir, "embeddings")
    val n = e.count()
    AnnIndex.build(e, dir1, "vec_id", "embedding", nCells = 16)
    // incremental: first half builds (contains vec_id < 16, so centroids
    // are identical), second half appends with NO retrain
    AnnIndex.build(e.filter(col("vec_id") < n / 2), dir2, "vec_id", "embedding", nCells = 16)
    AnnIndex.append(e.filter(col("vec_id") >= n / 2), dir2, "vec_id", "embedding")
    val full = spark.read.parquet(s"$dir1/assignments")
      .select("id", "cell").orderBy("id").collect().toSeq
    val incr = spark.read.parquet(s"$dir2/assignments")
      .select("id", "cell").orderBy("id").collect().toSeq
    assert(incr === full, "incremental assignments must equal the full build")
    val a = AnnIndex.topK(spark, dir1, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val b = AnnIndex.topK(spark, dir2, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(a.map(_.toSeq) === b.map(_.toSeq))
  }

  test("probing k cells statically prunes the partitioned scan to k directories") {
    val dir = tmp()
    val e = Tables.t(spark, sfDir, "embeddings")
    AnnIndex.build(e, dir, "vec_id", "embedding", nCells = 16)
    val oneQuery = queriesFrame.limit(1)
    val cand = AnnIndex.candidates(spark, dir, oneQuery, "vec_id", "embedding", probes = 2)
    cand.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case o => o.children.flatMap(scans)
    }
    // the assignments scan reads ≤ 2 of the 16 cell partitions
    val partScan = scans(cand.queryExecution.executedPlan)
      .find(_.relation.partitionSchema.nonEmpty).get
    val files = partScan.metrics("numFiles").value
    val total = spark.read.parquet(s"$dir/assignments").inputFiles.length
    assert(files < total, s"pruning lost: $files of $total files")
    assert(partScan.metrics.get("numPartitions").forall(_.value <= 2L),
      "at most the probed cell directories may be listed")
  }

  test("streaming vector ingest: foreachBatch appends land in query results") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = tmp()
    val e = Tables.t(spark, sfDir, "embeddings")
    val n = e.count()
    // standing corpus builds; the live tail arrives as a stream
    AnnIndex.build(e.filter(col("vec_id") < n / 2), dir, "vec_id", "embedding", nCells = 16)
    val tail = e.filter(col("vec_id") >= n / 2)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val ms = MemoryStream[(Long, Seq[Float])]
    ms.addData(tail.toSeq)
    val q = ms.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        AnnIndex.append(b, dir, "vec_id", "embedding"): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(AnnIndex.stats(spark, dir).nTotal === n)
    // a query whose true neighbors include streamed vectors finds them:
    // identical answers to the all-batch index (same centroids)
    val dirAll = tmp()
    AnnIndex.build(e, dirAll, "vec_id", "embedding", nCells = 16)
    val a = AnnIndex.topK(spark, dir, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val b = AnnIndex.topK(spark, dirAll, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(a.map(_.toSeq) === b.map(_.toSeq))
  }

  test("compaction collapses per-append small files; answers unchanged") {
    val dir = tmp()
    val e = Tables.t(spark, sfDir, "embeddings")
    val n = e.count()
    AnnIndex.build(e.filter(col("vec_id") < n / 4), dir, "vec_id", "embedding", nCells = 16)
    // six small appends: each leaves one file per touched cell
    (1 to 6).foreach { i =>
      val lo = n / 4 + (i - 1) * (n / 8)
      val hi = math.min(n, lo + n / 8)
      val batch = e.filter(col("vec_id") >= lo && col("vec_id") < hi)
      if (batch.count() > 0) AnnIndex.append(batch, dir, "vec_id", "embedding")
    }
    val before = spark.read.parquet(AnnIndex.assignDir(spark, dir)).inputFiles.length
    val answersBefore = AnnIndex.topK(spark, dir, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val totalBefore = AnnIndex.stats(spark, dir).nTotal
    AnnIndex.compact(spark, dir)
    val after = spark.read.parquet(AnnIndex.assignDir(spark, dir)).inputFiles.length
    assert(after < before, s"compaction must reduce files: $before -> $after")
    assert(after <= 16, s"expected ~one file per cell, got $after")
    assert(AnnIndex.stats(spark, dir).nTotal === totalBefore)
    val answersAfter = AnnIndex.topK(spark, dir, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(answersAfter.map(_.toSeq) === answersBefore.map(_.toSeq))
  }

  test("compact swap is pointer-atomic: live path always resolvable, " +
      "superseded layout retained one cycle then GC'd") {
    val dir = tmp()
    val e = Tables.t(spark, sfDir, "embeddings")
    val n = e.count()
    AnnIndex.build(e.filter(col("vec_id") < n / 2), dir, "vec_id", "embedding", nCells = 8)
    AnnIndex.append(e.filter(col("vec_id") >= n / 2), dir, "vec_id", "embedding")
    val answers0 = AnnIndex.topK(spark, dir, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    def layouts(): Set[String] = new java.io.File(dir).listFiles()
      .map(_.getName).filter(nm => nm == "assignments" || nm.startsWith("assignments.v")).toSet

    AnnIndex.compact(spark, dir)
    // cutover happened: pointer resolves to v1; the superseded base layout
    // is RETAINED so an in-flight reader that resolved pre-swap still scans
    assert(AnnIndex.assignDir(spark, dir).endsWith("assignments.v1"))
    assert(layouts() === Set("assignments", "assignments.v1"))
    // appends after a compact land in the live (resolved) layout
    AnnIndex.append(e.filter(col("vec_id") < 4), dir, "vec_id", "embedding")
    assert(AnnIndex.stats(spark, dir).nTotal === n + 4)

    AnnIndex.compact(spark, dir)
    // second cycle GCs the layout superseded in the first
    assert(AnnIndex.assignDir(spark, dir).endsWith("assignments.v2"))
    assert(layouts() === Set("assignments.v1", "assignments.v2"))
    val answers2 = AnnIndex.topK(spark, dir, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    // the doubled ids don't change cosine top-k identities vs answers0 only
    // if the dup ids are excluded — so just assert non-empty + rebuild reset
    assert(answers2.nonEmpty)
    AnnIndex.build(e, dir, "vec_id", "embedding", nCells = 8)
    assert(AnnIndex.assignDir(spark, dir).endsWith("/assignments"))
    assert(layouts() === Set("assignments"))
    val answersRebuilt = AnnIndex.topK(spark, dir, queriesFrame, "vec_id", "embedding", 3, 2)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(answersRebuilt.map(_.toSeq) === answers0.map(_.toSeq))
  }

  test("VECTOR_SIMILARITY spelling: same SQL routes through the AnnIndex " +
      "when registered, exact brute force otherwise; recall asserted") {
    val e = Tables.t(spark, sfDir, "embeddings")
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0)
    val arr = qv.map(_.toString).mkString(", ")
    val sql = s"""SELECT vec_id FROM embeddings
                 |WHERE VECTOR_SIMILARITY(embedding, CAST(ARRAY($arr) AS ARRAY<FLOAT>), 5)
                 |ORDER BY vec_id""".stripMargin
    // no registration → exact brute-force top-k (TakeOrdered plan shape)
    val s1 = spark.newSession()
    PinotFunctions.register(s1); Tables.registerViews(s1, sfDir)
    val bruteDf = s1.sql(sql)
    val brute = bruteDf.collect().map(_.getLong(0)).toSet
    assert(brute.size === 5 && brute.contains(0L),
      s"self row (sim 1.0) must rank first; got $brute")
    assert(bruteDf.queryExecution.optimizedPlan.toString.contains("Sort"),
      "fallback must be the sort+limit retrieval plan")
    // registered → planning-time index probe, IN-list filter, no Sort scan
    val dir = tmp()
    AnnIndex.build(e, dir, "vec_id", "embedding", nCells = 16)
    val s2 = spark.newSession()
    PinotFunctions.register(s2); Tables.registerViews(s2, sfDir)
    graft.plans.VectorSimilarity.register(
      s2, s"$sfDir/embeddings.parquet", "embedding", "vec_id", dir, probes = 4)
    val idxDf = s2.sql(sql)
    val indexed = idxDf.collect().map(_.getLong(0)).toSet
    assert(indexed.size === 5 && indexed.contains(0L))
    val opt = idxDf.queryExecution.optimizedPlan.toString
    assert(opt.contains(" IN ") || opt.toLowerCase.contains("in ("),
      s"indexed route must rewrite to an IN-list filter, got:\n$opt")
    assert(!opt.contains("Sort ("), "indexed route must not brute-force sort")
    val recall = (indexed & brute).size.toDouble / 5
    assert(recall >= 0.6, s"indexed recall vs brute force too low: $recall " +
      s"(indexed=$indexed brute=$brute)")
  }

  test("VECTOR_SIMILARITY probe memo sees appends: newly ingested exact match wins") {
    val dir = tmp()
    val e = Tables.t(spark, sfDir, "embeddings")
    val n = e.count()
    // hold the last vector OUT of the initial build
    AnnIndex.build(e.filter(col("vec_id") < n - 1), dir, "vec_id", "embedding", nCells = 8)
    val held = e.filter(col("vec_id") === n - 1)
    val qv = held.select("embedding").collect()(0).getSeq[Float](0)
    val arr = qv.map(_.toString).mkString(", ")
    val s = spark.newSession()
    PinotFunctions.register(s); Tables.registerViews(s, sfDir)
    graft.plans.VectorSimilarity.register(
      s, s"$sfDir/embeddings.parquet", "embedding", "vec_id", dir, probes = 8)
    val sql = s"""SELECT vec_id FROM embeddings
                 |WHERE VECTOR_SIMILARITY(embedding, CAST(ARRAY($arr) AS ARRAY<FLOAT>), 3)
                 |ORDER BY vec_id""".stripMargin
    val before = s.sql(sql).collect().map(_.getLong(0)).toSet
    assert(!before.contains(n - 1), "held-out id cannot be served before ingest")
    AnnIndex.append(held, dir, "vec_id", "embedding")
    // same session, same SQL: the probe memo must key on the CHANGED
    // layout and re-probe — the exact match (sim 1.0) now wins
    val after = s.sql(sql).collect().map(_.getLong(0)).toSet
    assert(after.contains(n - 1),
      s"memo served stale pre-append top-k: $after")
  }

  test("k-means build path: distributed training, recall vs brute force") {
    val dir = tmp()
    val e = Tables.t(spark, sfDir, "embeddings")
    AnnIndex.build(e, dir, "vec_id", "embedding", nCells = 8, kmeansIters = 3)
    val st = AnnIndex.stats(spark, dir)
    assert(st.nTotal === e.count() && st.nCells > 1)
    assert(st.imbalance >= 1.0)
    val q = queriesFrame.limit(8)
    val approx = AnnIndex.topK(spark, dir, q, "vec_id", "embedding", k = 3, probes = 3)
      .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force truth over the same queries
    val bf = q.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(e.select(col("vec_id").as("nid"), col("embedding").as("emb")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        graft.functions.cosine_sim(col("qe"), col("emb")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    val truth = bf.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"ivf-kmeans probe-3/8-cell recall too low: $recall")
  }
}
