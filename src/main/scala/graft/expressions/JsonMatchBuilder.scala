package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Shared parser/builder for Pinot's JSON_MATCH(col, '<filter>') surface:
  * comparisons `"$.path" <op> value` with =, !=/<>, </<=/>/>=,
  * IS [NOT] NULL, and (round 10) `IN ('a', 'b', ...)` / `NOT IN (...)`
  * value lists, composable into a full boolean FILTER EXPRESSION —
  * `'"$.a" = 1 AND ("$.b" = 2 OR NOT "$.c" IS NULL)'` — exactly the
  * compound form Pinot's json_match_predicate grammar accepts (numbers
  * compare numerically via TRY cast, '...'-quoted values as strings).
  * Two callers share the grammar:
  *
  *  - [[graft.PinotFunctions]] registers the full-scan predicate form;
  *  - [[graft.sources.JsonIndex]] derives candidate postings lookups from
  *    the same parse tree and re-applies [[predicate]] exactly, so the
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

  /** One parsed comparison: path, normalized op, the value — Left(string
    * literal) / Right(numeric) / None for IS [NOT] NULL — and, for
    * IN / NOT IN, the value list. */
  final case class Parsed(path: String, op: String,
      value: Option[Either[String, Double]],
      values: Seq[Either[String, Double]] = Nil)

  /** Boolean filter tree (round 10): comparisons composed with
    * parenthesized AND/OR (AND binds tighter) and NOT at any depth —
    * the TextMatchBuilder grammar shape applied to JSON filters. */
  sealed trait Node
  final case class Leaf(p: Parsed) extends Node
  final case class AndNode(kids: Seq[Node]) extends Node
  final case class OrNode(kids: Seq[Node]) extends Node
  final case class NotNode(kid: Node) extends Node

  private val m = """"([^"]+)"\s*(IS\s+NOT\s+NULL|IS\s+NULL|NOT\s+IN|IN|!=|<>|>=|<=|=|>|<)\s*(.*)""".r

  private def parseValue(v: String): Either[String, Double] =
    if (v.startsWith("'") && v.endsWith("'") && v.length >= 2)
      scala.Left(v.substring(1, v.length - 1).replace("''", "'"))
    else scala.Right(v.toDouble)

  /** Split an IN-list body on commas OUTSIDE quotes ('' = escaped quote). */
  private def splitList(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (inQ) {
        cur.append(c)
        if (c == '\'') {
          if (i + 1 < body.length && body.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1
          } else inQ = false
        }
      } else if (c == '\'') { inQ = true; cur.append(c) }
      else if (c == ',') { out += cur.toString.trim; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (cur.toString.trim.nonEmpty || out.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  /** One comparison string → [[Parsed]] (the pre-round-10 single-filter
    * entry, kept for its callers; [[parseTree]] subsumes it). */
  def parse(filter: String): Parsed = filter.trim match {
    case m(path, op, rest) =>
      val norm = op.replaceAll("\\s+", " ").toUpperCase
      norm match {
        case "IS NOT NULL" | "IS NULL" =>
          require(rest.trim.isEmpty,
            s"JSON_MATCH: trailing text after $norm: $filter")
          Parsed(path, norm, None)
        case "IN" | "NOT IN" =>
          val v = rest.trim
          require(v.startsWith("(") && v.endsWith(")"),
            s"JSON_MATCH: $norm needs a parenthesized value list: $filter")
          val vals = splitList(v.substring(1, v.length - 1)).map(parseValue)
          require(vals.nonEmpty, s"JSON_MATCH: empty $norm list: $filter")
          Parsed(path, norm, None, vals)
        case cmp => Parsed(path, cmp, Some(parseValue(rest.trim)))
      }
    case other => throw new IllegalArgumentException(
      s"""JSON_MATCH: expected '"$$.path" <op> value', got: $other""")
  }

  /** Full boolean filter → tree. Tokens: parens, AND/OR/NOT keywords
    * (case-insensitive, word-bounded), and whole comparisons (a
    * comparison starts at `"` and swallows its own value — including an
    * IN list's parens and any quoted string's content). */
  def parseTree(filter: String): Node = {
    val s = filter
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' || c == ')') { toks += c.toString; i += 1 }
      else if (c == '"') {
        // comparison: quoted path, operator words/symbols, then the value
        val pEnd = s.indexOf('"', i + 1)
        require(pEnd > i, s"JSON_MATCH: unterminated path quote in: $filter")
        var j = pEnd + 1
        // operator part: spaces, comparison symbols, and the words
        // IS/NOT/NULL/IN — consumed greedily; value follows
        val opChars = "=!<>"
        var opEnd = j
        var done = false
        while (!done && opEnd < s.length) {
          val ch = s.charAt(opEnd)
          if (ch.isWhitespace || opChars.contains(ch)) opEnd += 1
          else if (Character.isLetter(ch)) {
            var w = opEnd
            while (w < s.length && isWordChar(s.charAt(w))) w += 1
            val word = s.substring(opEnd, w).toUpperCase
            if (word == "IS" || word == "NOT" || word == "NULL" || word == "IN") opEnd = w
            else done = true
          } else done = true
        }
        val opText = s.substring(j, opEnd).trim.replaceAll("\\s+", " ").toUpperCase
        j = opEnd
        val valueEnd: Int =
          if (opText.endsWith("NULL")) j
          else if (opText.endsWith("IN")) {
            // swallow the parenthesized list, quote-aware
            while (j < s.length && s.charAt(j).isWhitespace) j += 1
            require(j < s.length && s.charAt(j) == '(',
              s"JSON_MATCH: IN needs a parenthesized value list: $filter")
            var depth = 0
            var inQ = false
            var k = j
            var end = -1
            while (k < s.length && end < 0) {
              val ch = s.charAt(k)
              if (inQ) { if (ch == '\'') inQ = false }
              else if (ch == '\'') inQ = true
              else if (ch == '(') depth += 1
              else if (ch == ')') { depth -= 1; if (depth == 0) end = k + 1 }
              k += 1
            }
            require(end > 0, s"JSON_MATCH: unterminated IN list in: $filter")
            end
          } else {
            while (j < s.length && s.charAt(j).isWhitespace) j += 1
            if (j < s.length && s.charAt(j) == '\'') {
              var k = j + 1
              var end = -1
              while (k < s.length && end < 0) {
                if (s.charAt(k) == '\'') {
                  if (k + 1 < s.length && s.charAt(k + 1) == '\'') k += 1
                  else end = k + 1
                }
                k += 1
              }
              require(end > 0, s"JSON_MATCH: unterminated string literal in: $filter")
              end
            } else {
              var k = j
              while (k < s.length && !s.charAt(k).isWhitespace &&
                s.charAt(k) != '(' && s.charAt(k) != ')') k += 1
              k
            }
          }
        toks += s.substring(i, valueEnd)
        i = valueEnd
      } else if (Character.isLetter(c)) {
        var w = i
        while (w < s.length && isWordChar(s.charAt(w))) w += 1
        val word = s.substring(i, w).toUpperCase
        require(word == "AND" || word == "OR" || word == "NOT",
          s"JSON_MATCH: unexpected word '${s.substring(i, w)}' in: $filter")
        toks += word
        i = w
      } else throw new IllegalArgumentException(
        s"JSON_MATCH: unexpected character '$c' in: $filter")
    }
    require(toks.nonEmpty, "JSON_MATCH: empty filter")

    var pos = 0
    def peek: Option[String] = if (pos < toks.length) Some(toks(pos)) else None
    def take(): String = { val t = toks(pos); pos += 1; t }
    def parseOr(): Node = {
      val kids = scala.collection.mutable.ArrayBuffer(parseAnd())
      while (peek.contains("OR")) { take(); kids += parseAnd() }
      if (kids.size == 1) kids.head else OrNode(kids.toSeq)
    }
    def parseAnd(): Node = {
      val kids = scala.collection.mutable.ArrayBuffer(parseUnary())
      while (peek.contains("AND")) { take(); kids += parseUnary() }
      if (kids.size == 1) kids.head else AndNode(kids.toSeq)
    }
    def parseUnary(): Node = peek match {
      case Some("NOT") => take(); NotNode(parseUnary())
      case Some("(") =>
        take()
        val n = parseOr()
        require(peek.contains(")"), s"JSON_MATCH: expected ')' in: $filter")
        take(); n
      case Some(t) if t == ")" || t == "AND" || t == "OR" =>
        throw new IllegalArgumentException(s"JSON_MATCH: unexpected '$t' in: $filter")
      case Some(t) => take(); Leaf(parse(t))
      case None => throw new IllegalArgumentException(
        s"JSON_MATCH: unexpected end of filter: $filter")
    }
    val n = parseOr()
    require(pos == toks.length,
      s"JSON_MATCH: trailing tokens from '${toks(pos)}' — comparisons " +
        s"need an explicit AND/OR: $filter")
    n
  }

  /** The comparison expression for one extracted value (shared by the
    * scalar path and each wildcard element). private[graft] so the slices
    * parity spec validates against THE production comparison, not a copy
    * that could silently go stale (r11 ADVICE). */
  private[graft] def compare(extracted: Expression, op: String,
      value: Option[Either[String, Double]],
      values: Seq[Either[String, Double]]): Expression = op match {
    case "IS NOT NULL" => IsNotNull(extracted)
    case "IS NULL" => IsNull(extracted)
    case "IN" =>
      // OR of equalities — each value keeps its own typed comparison
      // (string raw, numeric TRY-cast); null extraction stays null →
      // filter-false, the Pinot non-matching contract
      values.map(v => compare(extracted, "=", Some(v), Nil)).reduce(Or)
    case "NOT IN" =>
      Not(values.map(v => compare(extracted, "=", Some(v), Nil)).reduce(Or))
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

  /** EXISTS-over-elements predicate for a `[*]` path (see object doc).
    *
    * Round 11: elements come from ONE parse of the array
    * ([[graft.expressions.JsonArraySlices]] — each slice is a standalone
    * JSON value with GetJsonObject-exact content), and the per-element
    * extraction runs GetJsonObject over the SMALL slice only. The former
    * `exists(sequence(0, n-1), i -> get_json_object(arr, '$[i]'+suffix))`
    * re-parsed the whole array string per element (O(len²) per doc per
    * wildcard leaf) AND re-evaluated the `arr` prefix extraction inside
    * the lambda. Semantics are identical (JsonMatchSlicesParitySpec pits
    * the two forms against each other over adversarial documents): a
    * missing / non-array / malformed value yields NULL slices, so the
    * three-valued exists lands on false through the coalesce — the same
    * outcome the old `n IS NULL OR n < 1` gate produced. */
  private def arrayPredicate(input: Expression, p: Parsed): Expression = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    val parts = p.path.split("""\[\*\]""", -1)
    require(parts.length == 2,
      s"JSON_MATCH: exactly one [*] per path is supported: ${p.path}")
    val (prefix, suffix) = (parts(0), parts(1))
    require(prefix.startsWith("$"),
      s"JSON_MATCH: path must start at '$$': ${p.path}")
    val arr = if (prefix == "$") input else GetJsonObject(input, Literal(prefix))
    val slices = graft.expressions.JsonArraySlices(arr)
    val e = UnresolvedNamedLambdaVariable(Seq("e"))
    val elem = GetJsonObject(e, Literal("$" + suffix))
    // IS NULL goes through the IS NOT NULL exists, negated below — "no
    // element carries it", not "some element lacks it"
    val perElem = compare(elem,
      if (p.op == "IS NULL") "IS NOT NULL" else p.op, p.value, p.values)
    val ex = UnresolvedFunction("exists",
      Seq(slices, LambdaFunction(perElem, Seq(e))), isDistinct = false)
    // coalesce: three-valued exists (null elements, TRY-cast misses, NULL
    // slices for missing/non-array/malformed) must land on boolean false
    val any = Coalesce(Seq(ex, Literal(false)))
    if (p.op == "IS NULL") Not(any) else any
  }

  private def leafExpr(input: Expression, p: Parsed): Expression = {
    if (p.path.contains("[*]")) return arrayPredicate(input, p)
    // TRY cast inside compare: a non-numeric string at the JSON path
    // yields NULL → predicate false (Pinot's broker treats it as
    // non-matching), instead of an ANSI runtime throw
    compare(GetJsonObject(input, Literal(p.path)), p.op, p.value, p.values)
  }

  /** The exact full-scan predicate for `filter` over JSON column `input`. */
  def predicate(input: Expression, filter: String): Expression = {
    def nodeExpr(n: Node): Expression = n match {
      case Leaf(p) => leafExpr(input, p)
      case AndNode(ks) => ks.map(nodeExpr).reduce(And)
      case OrNode(ks) => ks.map(nodeExpr).reduce(Or)
      case NotNode(k) => Not(nodeExpr(k))
    }
    nodeExpr(parseTree(filter))
  }
}
