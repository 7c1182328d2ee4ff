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
  *
  * Round 10 — array-wildcard paths (`'"$.arr[*].key" >= 10'`, Pinot's JSON
  * index matches array ELEMENTS): one `[*]` per path, EXISTS semantics —
  * the predicate is true iff ANY element (or element sub-field) satisfies
  * the comparison. `IS NULL` on a wildcard path is the complement: NO
  * element carries the field (a missing / empty / non-array value
  * qualifies). Built from `json_array_length` + `exists` over an index
  * `sequence` with per-element `get_json_object` — both extraction steps
  * are the exact functions the scalar path and the index build run, so
  * the three stay consistent. The empty-array `sequence(0,-1)` descending
  * trap (round 3) is guarded with an explicit `n >= 1` branch.
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

  /** The comparison expression for one extracted value (shared by the
    * scalar path and each wildcard element). */
  private def compare(extracted: Expression, op: String,
      value: Option[Either[String, Double]]): Expression = op match {
    case "IS NOT NULL" => IsNotNull(extracted)
    case "IS NULL" => IsNull(extracted)
    case cmp =>
      val (left: Expression, right: Expression) = value.get match {
        case scala.Left(s) => (extracted, Literal(s))
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

  /** EXISTS-over-elements predicate for a `[*]` path (see object doc). */
  private def arrayPredicate(input: Expression, p: Parsed): Expression = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    val parts = p.path.split("""\[\*\]""", -1)
    require(parts.length == 2,
      s"JSON_MATCH: exactly one [*] per path is supported: ${p.path}")
    val (prefix, suffix) = (parts(0), parts(1))
    require(prefix.startsWith("$"),
      s"JSON_MATCH: path must start at '$$': ${p.path}")
    val arr = if (prefix == "$") input else GetJsonObject(input, Literal(prefix))
    val n = UnresolvedFunction("json_array_length", Seq(arr), isDistinct = false)
    val i = UnresolvedNamedLambdaVariable(Seq("i"))
    val elemPath = Concat(Seq(Literal("$["), Cast(i, StringType), Literal("]" + suffix)))
    val elem = GetJsonObject(arr, elemPath)
    // IS NULL goes through the IS NOT NULL exists, negated below — "no
    // element carries it", not "some element lacks it"
    val perElem = compare(elem, if (p.op == "IS NULL") "IS NOT NULL" else p.op, p.value)
    val idxs = UnresolvedFunction("sequence",
      Seq(Literal(0), Subtract(n, Literal(1))), isDistinct = false)
    val ex = UnresolvedFunction("exists",
      Seq(idxs, LambdaFunction(perElem, Seq(i))), isDistinct = false)
    // coalesce: three-valued exists (null elements, TRY-cast misses) must
    // land on boolean false; n null (missing / non-array) or 0 → false
    val any = If(And(IsNotNull(n), GreaterThanOrEqual(n, Literal(1))),
      Coalesce(Seq(ex, Literal(false))), Literal(false))
    if (p.op == "IS NULL") Not(any) else any
  }

  /** The exact full-scan predicate for `filter` over JSON column `input`. */
  def predicate(input: Expression, filter: String): Expression = {
    val p = parse(filter)
    if (p.path.contains("[*]")) return arrayPredicate(input, p)
    // TRY cast inside compare: a non-numeric string at the JSON path
    // yields NULL → predicate false (Pinot's broker treats it as
    // non-matching), instead of an ANSI runtime throw
    compare(GetJsonObject(input, Literal(p.path)), p.op, p.value)
  }
}
