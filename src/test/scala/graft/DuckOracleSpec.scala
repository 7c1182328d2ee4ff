package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** Preconditions + golden values for the DuckDB-replicated hash oracles
  * (graft.tools.DuckDbSql). The golden constants freeze the hash spec: if
  * either the native expressions or the SQL generator drift, one of these
  * (or the driver's oracle hash compare) breaks. */
class DuckOracleSpec extends GraftSuite {
  import spark.implicits._

  test("stable_hash64 golden values (spec frozen for the SQL replica)") {
    val r = Seq("abc").toDF("s")
      .select(
        stable_hash64(col("s")).as("h0"),
        stable_hash64(col("s"), 1L).as("h1"))
      .head()
    assert(r.getLong(0) === 3018304574923447344L)
    assert(r.getLong(1) === 2275194758516555833L)
  }

  test("fold_hash64 golden value") {
    val r = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
      .select(fold_hash64(array(col("a"), col("b"), col("c"))).as("f"))
      .head().getLong(0)
    // frozen reference from the kernel itself (guards refactors)
    assert(r === graft.expressions.FoldHashOps.foldHash64(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(1L, 2L, 3L))))
    assert(r !== 0L)
  }

  test("documents fixture is 7-bit ASCII (oracle byte-walk precondition)") {
    val d = sources.Tables.t(spark, sfDir, "documents")
    val nonAscii = d.filter(not(col("text").rlike("^[\\x01-\\x7f]*$"))).count()
    assert(nonAscii === 0L, "DuckDbSql.hash64 walks ascii(s[i]) — non-ASCII text would diverge")
  }
}
