package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** Randomized ground-truth check for the MV aggregates: on seeded random
  * frames (nulls, empty arrays, duplicate elements, many groups, many
  * partitions) every MV aggregate must equal its explode-based equivalent
  * computed by Spark's own battle-tested aggregates. */
class MvAggPropertySpec extends GraftSuite {
  import spark.implicits._

  private lazy val frame = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 3000).map { i =>
      val g = rnd.nextInt(40)
      val n = rnd.nextInt(6) // 0..5 elements, empties included
      val arr = Seq.fill(n)(rnd.nextInt(25))
      val toks = Seq.fill(rnd.nextInt(4))(s"t${rnd.nextInt(12)}")
      (g, arr, toks)
    }
    rows.toDF("g", "nums", "toks").repartition(16).cache()
  }

  test("distinct/sum/avg/minmaxrange MV aggregates equal their explode equivalents") {
    val mv = frame.groupBy($"g").agg(
      distinct_count_mv($"nums").as("dc"),
      distinct_sum_mv($"nums").as("ds"),
      distinct_avg_mv($"nums").as("da"),
      min_max_range_mv($"nums").as("mmr"),
      distinct_count_mv($"toks").as("dct")).orderBy($"g").collect()
    val ex = frame.select($"g", explode($"nums").as("v"))
      .groupBy($"g").agg(
        countDistinct($"v").as("dc"),
        sum_distinct($"v").cast("long").as("ds"),
        (max($"v") - min($"v")).as("mmr")).orderBy($"g").collect()
    val exAvg = frame.select($"g", explode($"nums").as("v"))
      .groupBy($"g").agg((sum_distinct($"v").cast("double") / countDistinct($"v")).as("da"))
      .orderBy($"g").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val exToks = frame.select($"g", explode($"toks").as("t"))
      .groupBy($"g").agg(countDistinct($"t").as("dct"))
      .orderBy($"g").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exMap = ex.map(r => r.getInt(0) -> r).toMap
    mv.foreach { r =>
      val g = r.getInt(0)
      exMap.get(g) match {
        case Some(e) =>
          assert(r.getLong(1) === e.getLong(1), s"dc g=$g")
          assert(r.getLong(2) === e.getLong(2), s"ds g=$g")
          assert(math.abs(r.getDouble(3) - exAvg(g)) < 1e-9, s"da g=$g")
          assert(r.getInt(4) === e.getInt(3), s"mmr g=$g")
        case None =>
          // group whose arrays were ALL empty: explode drops it entirely
          assert(r.getLong(1) === 0L, s"dc empty g=$g")
          assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), s"nulls g=$g")
      }
      assert(r.getLong(5) === exToks.getOrElse(g, 0L), s"dct g=$g")
    }
  }

  test("PERCENTILEMV equals exact percentile over exploded elements at 5 quantiles") {
    for (p <- Seq(0.0, 10.0, 50.0, 90.0, 100.0)) {
      val mv = frame.groupBy($"g").agg(percentile_mv($"nums", p).as("v"))
        .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      val ex = frame.select($"g", explode($"nums").as("v"))
        .groupBy($"g").agg(expr(s"percentile(v, ${p / 100})").as("v"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      ex.foreach { case (g, want) =>
        assert(mv(g) === want, s"p=$p g=$g")
      }
    }
  }
}
