package graft

import graft.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registering the graft extension functions on the
  * SQL surface (so `spark.sql("SELECT cosine_sim(a,b) ...")` works — the
  * engine's equivalent of Pinot's scalar-function plugin registry,
  * SURVEY.md §2.10 X0a).
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
         new ExpressionInfo("graft.expressions", name),
         builder))
    }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (args => CosineSimilarity(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    "simhash64" -> (args => SimHash64(args.head)),
    "fingerprint64" -> (args => Fingerprint64(args.head)))

  /** Register on an existing session (used by tests and the local engine). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
