package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Shared parser/builder for Pinot's JSON_MATCH(col, '"$.path" <op> value')
  * surface: =, !=/<>, </<=/>/>=, IS [NOT] NULL over one JSON path (numbers
  * compare numerically via TRY cast, '...'-quoted values as strings).
  * Two callers share the grammar:
  *
  *  - [[graft.PinotFunctions]] registers the full-scan predicate form;
  *  - [[graft.sources.JsonIndex]] derives candidate postings lookups from
  *    the same parse and re-applies [[predicate]] exactly, so the
  *    index-accelerated path can never diverge from the scan path.
  */
object JsonMatchBuilder {

  /** One parsed filter: path, normalized op, and the value — Left(string
    * literal) / Right(numeric) / None for IS [NOT] NULL. */
  final case class Parsed(path: String, op: String, value: Option[Either[String, Double]])

  private val m = """"([^"]+)"\s*(IS\s+NOT\s+NULL|IS\s+NULL|!=|<>|>=|<=|=|>|<)\s*(.*)""".r

  def parse(filter: String): Parsed = filter.trim match {
    case m(path, op, rest) =>
      val norm = op.replaceAll("\\s+", " ").toUpperCase
      norm match {
        case "IS NOT NULL" | "IS NULL" => Parsed(path, norm, None)
        case cmp =>
          val v = rest.trim
          val value =
            if (v.startsWith("'") && v.endsWith("'") && v.length >= 2)
              scala.Left(v.substring(1, v.length - 1).replace("''", "'"))
            else scala.Right(v.toDouble)
          Parsed(path, cmp, Some(value))
      }
    case other => throw new IllegalArgumentException(
      s"""JSON_MATCH: expected '"$$.path" <op> value', got: $other""")
  }

  /** The exact full-scan predicate for `filter` over JSON column `input`. */
  def predicate(input: Expression, filter: String): Expression = {
    val p = parse(filter)
    val extracted = GetJsonObject(input, Literal(p.path))
    p.op match {
      case "IS NOT NULL" => IsNotNull(extracted)
      case "IS NULL" => IsNull(extracted)
      case cmp =>
        val (left: Expression, right: Expression) = p.value.get match {
          case scala.Left(s) => (extracted, Literal(s))
          // TRY cast: a non-numeric string at the JSON path yields NULL →
          // predicate false (Pinot's broker treats it as non-matching),
          // instead of an ANSI runtime throw
          case scala.Right(d) => (Cast(extracted, DoubleType, None, EvalMode.TRY), Literal(d))
        }
        cmp match {
          case "=" => EqualTo(left, right)
          case "!=" | "<>" => Not(EqualTo(left, right))
          case ">" => GreaterThan(left, right)
          case ">=" => GreaterThanOrEqual(left, right)
          case "<" => LessThan(left, right)
          case "<=" => LessThanOrEqual(left, right)
        }
    }
  }
}
