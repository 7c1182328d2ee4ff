package graft

import graft.expressions.JsonMatchBuilder
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.StringType

/** Round 11: the `[*]` wildcard predicate switched from per-index
  * `get_json_object(arr, '$[i]')` (O(len²) — the whole array string
  * re-parsed per element) to a single-parse element split
  * (JsonArraySlices) + per-SLICE GetJsonObject. This spec pits the NEW
  * predicate against the OLD construction (reproduced verbatim below as
  * the reference) over adversarial documents — exotic number renderings,
  * strings whose CONTENT looks like JSON, escapes, unicode, nested
  * containers, JSON nulls, empty arrays, non-arrays, malformed text —
  * across every operator class, asserting row-for-row equality. */
class JsonMatchSlicesParitySpec extends GraftSuite {

  /** The pre-round-11 arrayPredicate, kept as the semantic reference. */
  private def oldArrayPredicate(input: Expression, p: JsonMatchBuilder.Parsed): Expression = {
    val parts = p.path.split("""\[\*\]""", -1)
    val (prefix, suffix) = (parts(0), parts(1))
    val arr = if (prefix == "$") input else GetJsonObject(input, Literal(prefix))
    val n = UnresolvedFunction("json_array_length", Seq(arr), isDistinct = false)
    val i = UnresolvedNamedLambdaVariable(Seq("i"))
    val elemPath = Concat(Seq(Literal("$["), Cast(i, StringType), Literal("]" + suffix)))
    val elem = GetJsonObject(arr, elemPath)
    val cmpOp = if (p.op == "IS NULL") "IS NOT NULL" else p.op
    // the PRODUCTION comparison builder (private[graft] since round 12) —
    // only the old array-iteration construction stays duplicated here
    val perElem = JsonMatchBuilder.compare(elem, cmpOp, p.value, p.values)
    val idxs = UnresolvedFunction("sequence",
      Seq(Literal(0), Subtract(n, Literal(1))), isDistinct = false)
    val ex = UnresolvedFunction("exists",
      Seq(idxs, LambdaFunction(perElem, Seq(i))), isDistinct = false)
    val any = If(And(IsNotNull(n), GreaterThanOrEqual(n, Literal(1))),
      Coalesce(Seq(ex, Literal(false))), Literal(false))
    if (p.op == "IS NULL") Not(any) else any
  }

  private val docs = Seq(
    // plain shapes
    """{"a": [1, 2, 3], "s": "x"}""",
    """{"a": [], "s": "y"}""",
    """{"a": [{"t": "purchase", "v": 250.0}, {"t": "view", "v": 3}]}""",
    """{"a": [{"t": "view", "v": 249.999}, {"t": "purchase", "v": 1e3}]}""",
    // exotic number renderings (raw-text-sensitive if compared as strings)
    """{"a": [1e3, 250.00, -0.0, 0.1e1, 42]}""",
    """{"a": [{"v": 1e3}, {"v": 250.00}, {"v": -0.0}]}""",
    // strings whose CONTENT parses as JSON — must NOT be re-interpreted
    """{"a": ["{\"t\": \"purchase\"}", "[1,2]", "250.0", "null", "true"]}""",
    """{"a": [{"t": "{\"t\": \"purchase\"}"}]}""",
    // escapes and unicode (incl. a supplementary-plane char and \u escapes)
    """{"a": ["q\"uote", "back\\slash", "ABC", "emoji 😀 tail", "tab\there"]}""",
    """{"a": [{"t": "q\"uote"}, {"t": "ABC"}]}""",
    // JSON nulls, booleans, mixed types, nested containers
    """{"a": [null, true, false, 0]}""",
    """{"a": [[1, 2], [3], {"t": [4, 5]}]}""",
    """{"a": [{"t": null}, {"u": 1}]}""",
    // whitespace-heavy rendering
    """{ "a" : [  { "t" :  "purchase" , "v" : 250.0 }  ,  7 ,  "z"  ] }""",
    // duplicate keys inside an element (get_json_object takes the FIRST)
    """{"a": [{"t": "first", "t": "second"}]}""",
    // non-array values under the path, missing path, scalar root
    """{"a": {"t": "purchase"}}""",
    """{"a": "not an array"}""",
    """{"a": 42}""",
    """{"b": [1, 2]}""",
    """{"a": null}""",
    // malformed / trailing garbage
    """{"a": [1, 2""",
    """not json at all""",
    """{"a": [1, 2]}""",
    // big-int and long-fraction edges
    """{"a": [9223372036854775807, 1.7976931348623157e308, 0.30000000000000004]}""",
    """{"a": [{"v": 9223372036854775807}]}""")

  private val filters = Seq(
    """"$.a[*]" = 42""",
    """"$.a[*]" = '250.0'""",
    """"$.a[*]" = '1e3'""",
    """"$.a[*]" = 1000""",
    """"$.a[*]" = '{"t": "purchase"}'""",
    """"$.a[*]" = 'ABC'""",
    """"$.a[*]" = 'q"uote'""",
    """"$.a[*]" = 'emoji 😀 tail'""",
    """"$.a[*]" = 'null'""",
    """"$.a[*]" = 'true'""",
    """"$.a[*]" >= 250.0""",
    """"$.a[*]" < 0""",
    """"$.a[*]" IS NOT NULL""",
    """"$.a[*]" IS NULL""",
    """"$.a[*]" IN ('z', 'x', '7')""",
    """"$.a[*].t" = 'purchase'""",
    """"$.a[*].t" = '{"t": "purchase"}'""",
    """"$.a[*].t" = 'q"uote'""",
    """"$.a[*].t" = 'ABC'""",
    """"$.a[*].t" = 'first'""",
    """"$.a[*].t" = 'second'""",
    """"$.a[*].v" >= 250.0""",
    """"$.a[*].v" = '250.00'""",
    """"$.a[*].v" = '1e3'""",
    """"$.a[*].v" = 1000""",
    """"$.a[*].v" = 9223372036854775807""",
    """"$.a[*].t" IS NOT NULL""",
    """"$.a[*].t" IS NULL""",
    """"$.a[*].v" NOT IN (3, 7)""",
    """"$[*]" = 1""")

  test("new slices predicate ≡ old per-index predicate on adversarial docs × filters") {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "j")
      // also exercise the whole-doc-is-array prefix ("$[*]")
      .union(Seq((1000L, """[1, 2, 3]"""), (1001L, """[{"t": 1}]"""),
        (1002L, """7""")).toDF("id", "j"))
    df.persist().count()
    for (f <- filters) {
      val p = JsonMatchBuilder.parse(f)
      val newCol = GraftBridge.column(
        JsonMatchBuilder.predicate(GraftBridge.expression(col("j")), f))
      val oldCol = GraftBridge.column(
        oldArrayPredicate(GraftBridge.expression(col("j")), p))
      val got = df.select(col("id"), newCol.as("n"), oldCol.as("o"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
      val diffs = got.filter(t => t._2 != t._3)
      assert(diffs.isEmpty, s"filter [$f] diverges on ids ${diffs.map(_._1).toSeq}")
    }
    df.unpersist()
  }

  test("slices expression: null on non-array / malformed, exact on containers") {
    import spark.implicits._
    val df = Seq(
      """[1, "a", {"k": 1e3}, [2, 3], null, true]""",
      """{"not": "array"}""",
      """broken [""",
      """[]""").toDF("j")
    val out = df.select(GraftBridge.column(GraftBridge.expression(
      col("j"))).as("x"))
      .select(GraftBridge.column(
        graft.expressions.JsonArraySlices(GraftBridge.expression(col("x")))).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(out(0) === Seq("1", "\"a\"", """{"k": 1e3}""", "[2, 3]", "null", "true"))
    assert(out(1) == null)
    assert(out(2) == null)
    assert(out(3) === Seq.empty)
  }
}
