package graft.ops

import graft.expressions.{IdSetCodec, IdSetSerialize, InIdSet}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.collect_set
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Pinot IdSet surface (`ID_SET` / `IN_ID_SET` `[P1.2]`): query 1 aggregates
  * a column into a compact serialized set the CLIENT carries away; query 2
  * filters by membership in that literal — Pinot's join-free way to
  * correlate two queries across requests (classic funnel: "users who
  * purchased" → "their views"). Within ONE query a semi-join is the
  * Spark-native answer (and what the oracle uses); the IdSet earns its keep
  * when the set must cross a query/process boundary.
  *
  * Scale posture: the decoded set rides the serialized plan as one
  * broadcast-like reference object (no shuffle, no per-row state); per-row
  * membership is a binary search in codegen. The set size is bounded by the
  * CLIENT contract (it is a result value), the same bound Pinot's IdSet
  * carries.
  */
object IdSet {

  /** Aggregate column: the serialized IdSet of `c`'s distinct values. */
  def idSetAgg(c: Column): Column =
    GraftBridge.column(IdSetSerialize(GraftBridge.expression(collect_set(c))))

  /** Run the ID_SET aggregation and return the client-facing string. */
  def of(df: DataFrame, colName: String): String = {
    import org.apache.spark.sql.functions.col
    df.agg(idSetAgg(col(colName)).as("idset")).head().getString(0)
  }

  /** Membership predicate against a serialized IdSet literal. */
  def inIdSet(c: Column, serialized: String): Column =
    GraftBridge.column(InIdSet(
      GraftBridge.expression(c),
      Literal(UTF8String.fromString(serialized), StringType)))

  /** Decode back to the sorted id array (client-side utility). */
  def decode(serialized: String): Array[Long] = IdSetCodec.deserialize(serialized)
}
