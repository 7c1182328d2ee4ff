package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** Skew salting (SURVEY.md §2.3 J7): a hot-key join salted into n sub-keys
  * must produce identical results to the plain join while spreading the hot
  * key across n shuffle partitions. (AQE's skew-join split handles this
  * automatically at runtime; salting is the explicit form for when the skew
  * is known ahead of planning.) */
class SaltedJoinSpec extends GraftSuite {
  import spark.implicits._

  test("salted join equals plain join and spreads the hot key") {
    val n = 8
    // 10k facts, 90% on one hot key
    val fact = (0 until 10000)
      .map(i => (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "HOT", i * 1.5))
      .toDF("row_id", "key", "v")
    val dim = Seq(("HOT", "hot-dim"), ("k0", "d0"), ("k3", "d3"))
      .toDF("key", "label")

    val plain = fact.join(dim, Seq("key"))
      .groupBy($"key", $"label").agg(count(lit(1)).as("n"), round(sum($"v"), 2).as("sv"))

    val saltedFact = fact.withColumn("sk", saltKey($"key", $"row_id", n))
    val saltedDim = dim.select($"label", explodeSalts($"key", n).as("sk"))
    val salted = saltedFact.join(saltedDim, Seq("sk"))
      .groupBy($"sk.k".as("key"), $"label")
      .agg(count(lit(1)).as("n"), round(sum($"v"), 2).as("sv"))

    val a = plain.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val b = salted.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === b)

    // the hot key really fans out across salts
    val spread = saltedFact.filter($"key" === "HOT")
      .select($"sk.salt").distinct().count()
    assert(spread === n.toLong)
  }
}
