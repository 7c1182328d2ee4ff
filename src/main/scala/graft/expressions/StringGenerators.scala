package graft.expressions

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Expression builders for the Pinot 1.2 string-generator scalar family
  * (`prefixes` / `suffixes` / `uniqueNgrams` / `splitPart` / `isJson` —
  * part of the deployed endpoint's vocabulary, version pinned at
  * `/root/reference/resources/pinot/userData/userdata-pinotserver.sh:5`).
  *
  * One builder per function, shared verbatim by the Column API
  * (`graft.functions`) and the SQL registry (`graft.PinotFunctions`), so the
  * two surfaces cannot diverge. Everything composes analyzer-resolved
  * built-ins (`transform`/`sequence`/`substring`), so the generated code is
  * whole-stage-codegen'd — no UDF, no extra kernel.
  *
  * Edge-case contract (matches the Pinot Java implementations):
  *  - generators on a too-short input return an EMPTY array, never throw.
  *    Spark's `sequence(1, 0)` is DESCENDING (`[1, 0]`), so every bound is
  *    guarded with an explicit emptiness branch instead;
  *  - `splitPart` drops empty tokens (commons-lang
  *    `splitByWholeSeparator` semantics — adjacent separators coalesce) and
  *    returns the literal string "null" when the 0-based index is out of
  *    bounds;
  *  - `uniqueNgrams` preserves first-occurrence order (`array_distinct`).
  */
object StringGenerators {

  private val emptyStrArray: Expression =
    Literal.create(Seq.empty[String], ArrayType(StringType))

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toSeq, false)

  private def lam(body: NamedExpression => Expression): Expression = {
    val v = UnresolvedNamedLambdaVariable(Seq("i"))
    LambdaFunction(body(v), Seq(v))
  }

  /** All prefixes of length 1..min(length(s), maxLen), shortest first. */
  def prefixes(s: Expression, maxLen: Expression): Expression = {
    val n = Least(Seq(Length(s), Cast(maxLen, IntegerType)))
    If(LessThan(n, Literal(1)),
      emptyStrArray,
      fn("transform", fn("sequence", Literal(1), n),
        lam(i => Substring(s, Literal(1), Cast(i, IntegerType)))))
  }

  /** All suffixes of length 1..min(length(s), maxLen), shortest first. */
  def suffixes(s: Expression, maxLen: Expression): Expression = {
    val n = Least(Seq(Length(s), Cast(maxLen, IntegerType)))
    If(LessThan(n, Literal(1)),
      emptyStrArray,
      fn("transform", fn("sequence", Literal(1), n),
        // substring with a negative start counts from the end: the length-i suffix
        lam(i => Substring(s, UnaryMinus(Cast(i, IntegerType)), Cast(i, IntegerType)))))
  }

  /** Unique character n-grams of exactly length n, first-occurrence order. */
  def uniqueNgrams(s: Expression, n: Expression): Expression =
    ArrayDistinct(ngramsOf(s, Cast(n, IntegerType)))

  /** Unique character n-grams for every gram size in minGram..maxGram. */
  def uniqueNgrams(s: Expression, minGram: Expression, maxGram: Expression): Expression = {
    val lo = Cast(minGram, IntegerType)
    val hi = Cast(maxGram, IntegerType)
    val g = UnresolvedNamedLambdaVariable(Seq("g"))
    val sizes = fn("filter",
      fn("sequence", lo, hi),
      LambdaFunction(LessThanOrEqual(g, Length(s)), Seq(g)))
    val g2 = UnresolvedNamedLambdaVariable(Seq("g"))
    // sequence(lo, hi) is DESCENDING when lo > hi (the sequence(1,0) gotcha):
    // an inverted range must be empty, as Pinot returns, not descending grams
    If(GreaterThan(lo, hi),
      emptyStrArray,
      ArrayDistinct(Flatten(
        fn("transform", sizes,
          LambdaFunction(ngramsOf(s, Cast(g2, IntegerType)), Seq(g2))))))
  }

  private def ngramsOf(s: Expression, n: Expression): Expression = {
    val last = Add(Subtract(Length(s), n), Literal(1))
    If(LessThan(last, Literal(1)),
      emptyStrArray,
      fn("transform", fn("sequence", Literal(1), last),
        lam(i => Substring(s, Cast(i, IntegerType), n))))
  }

  /** Pinot split(input, delimiter): literal whole-separator split with
    * empty tokens DROPPED (commons `splitByWholeSeparator`, the shared
    * contract with [[splitPart]]) — NOT Spark's regex split. */
  def splitWhole(s: Expression, sep: Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    fn("filter", StringSplitSQL(s, sep),
      LambdaFunction(Not(EqualTo(x, Literal(""))), Seq(x)))
  }

  /** Pinot SPLITPART(subject, separator, index): literal (non-regex) split,
    * empty tokens dropped, 0-based index, "null" string out of bounds. */
  def splitPart(s: Expression, sep: Expression, idx: Expression): Expression = {
    val toks = splitWhole(s, sep)
    val i = Cast(idx, IntegerType)
    // the index guard must also reject negatives: element_at(toks, 0)
    // would throw under ANSI instead of answering "null"
    If(And(GreaterThanOrEqual(i, Literal(0)), GreaterThan(Size(toks), i)),
      ElementAt(toks, Add(i, Literal(1))),
      Literal("null"))
  }

  /** Pinot isJson(value): true iff the string parses as JSON (objects,
    * arrays, and scalar JSON literals all count, as in Pinot's
    * JsonFunctions.isJson). */
  def isJson(s: Expression): Expression =
    IsNotNull(fn("try_parse_json", s))
}
