package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the latest right row
  * with `right.ts <= left.ts` in the same key group. Spark has no native
  * as-of operator; the scalable composition is union + carry-forward
  * window rather than a range-condition join:
  *
  *   - tag right rows side=0 carrying their value columns, left rows side=1;
  *   - union, then `last(value, ignoreNulls) OVER (PARTITION BY keys
  *     ORDER BY ts, side ROWS UNBOUNDED PRECEDING)` carries the most recent
  *     right values forward onto each left row;
  *   - keep side=1.
  *
  * Cost: ONE shuffle on the keys and a linear sort-scan per key group —
  * versus a theta/range join whose candidate space explodes quadratically.
  * At equal timestamps the right row sorts first (side 0 < 1), giving
  * inclusive `<=` semantics. This is the standard attribution /
  * slowly-changing-dimension lookup shape at 100 TB.
  */
object AsOfJoin {

  /** @param rightValueCols right columns carried onto left rows (emitted as
    *        `asof_<name>`); both frames must share `keys` and `tsCol`.
    *
    * All value columns travel in ONE struct carried by a single
    * `last(ignoreNulls)` — per-column carry-forward would stitch values
    * from different right rows whenever a right value column contains
    * NULL (the struct itself is never null for a right row, so the latest
    * right ROW wins as a unit, true as-of semantics). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    val rTagged = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__side")) :+
        struct(rightValueCols.map(col): _*).as("__asof_row"): _*)
    val lTagged = left
      .withColumn("__side", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(
      "__asof_row", last(col("__asof_row"), ignoreNulls = true).over(w))
    val unpacked = rightValueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col("__asof_row").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__side", "__asof_row")
  }
}
