package graft

import graft.ops.Par

/** Contract of the scan-parallelism guard (ops/Par): it must fan out an
  * under-parallelized source AND stay a strict no-op on already-parallel
  * input — the difference between "unlock idle cores on a one-row-group
  * file" and "add a pointless full shuffle at 100 TB". */
class ParSpec extends GraftSuite {
  import spark.implicits._

  test("fanOut raises an under-parallelized source to default parallelism") {
    val one = (1 to 1000).toDF("x").coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val fanned = Par.fanOut(one)
    assert(fanned.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(fanned.count() === 1000L)
  }

  test("fanOut is a no-op (same plan, no Repartition) on already-parallel input") {
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 1000).toDF("x").repartition(target)
    val out = Par.fanOut(wide)
    assert(out.queryExecution.logical eq wide.queryExecution.logical,
      "fanOut must return the input untouched when parallelism suffices")
  }
}
