package graft.expressions

import org.apache.spark.sql.catalyst.expressions._

/** Shared parser/builder for Pinot's TEXT_MATCH(col, 'lucene query') surface
  * (reference broker parses it even with no text index configured —
  * `kinesisTableConfigFile.json:12-27`): terms (word-boundary,
  * case-insensitive), "phrases", trailing-* prefixes, round-8 `NOT x` /
  * `-x` negation and `te?t` / `te*t` mid-token wildcards, round-10
  * `term~N` fuzzy terms (plain-Levenshtein, see [[Fuzzy]]) and `term^N`
  * boosts (parsed and dropped — boolean predicates have no scores),
  * single-operator AND/OR chains. Used by two callers:
  *
  *  - [[graft.PinotFunctions]] registers the full-scan predicate form;
  *  - [[graft.sources.TextIndex]] uses the SAME parse to derive an
  *    index-candidate superset, then re-applies [[predicate]] exactly —
  *    so the accelerated path can never diverge from the scan path.
  *
  * Negation semantics are plain boolean (NOT x keeps documents without a
  * match) combined with the chain operator — a deliberate SUPERSET of
  * Lucene's BooleanQuery, where a purely-negative query matches nothing;
  * `a AND NOT b` — the shape ported queries actually use — agrees
  * exactly.
  */
object TextMatchBuilder {

  sealed trait Clause
  final case class Phrase(s: String) extends Clause
  final case class Prefix(stem: String) extends Clause
  final case class Term(s: String) extends Clause
  /** `te?t` / `te*t` / `*est` — Lucene wildcards over a single token:
    * `?` = one word char, `*` = any run of word chars. (A pure trailing
    * `*` with no `?` stays the dedicated [[Prefix]] shape.) */
  final case class Wildcard(pattern: String) extends Clause
  /** `roam~1` / `roam~` (= ~2, the Lucene default) — matches documents
    * holding any TOKEN within `maxEdits` PLAIN-Levenshtein edits of the
    * term (round 10). Documented delta vs Lucene's FuzzyQuery: Lucene
    * counts a transposition as ONE Damerau edit, plain Levenshtein as two
    * — so `form~1` does not match "from" here (it does in Lucene); every
    * match this produces, Lucene also produces. `~0` folds to [[Term]] at
    * parse. Phrase slop (`"a b"~2`) and wildcard+fuzzy combinations stay
    * LOUD errors. */
  final case class Fuzzy(s: String, maxEdits: Int) extends Clause

  private val boostRe = """\^\d+(?:\.\d+)?$""".r
  private val fuzzyRe = """(.+)~(\d*)$""".r

  /** Boolean query tree (round 8): full Lucene-style grammar with
    * parentheses, mixed AND/OR at standard precedence (AND binds tighter),
    * and NOT at any depth. */
  sealed trait Node
  final case class Leaf(c: Clause) extends Node
  final case class AndNode(kids: Seq[Node]) extends Node
  final case class OrNode(kids: Seq[Node]) extends Node
  final case class NotNode(kid: Node) extends Node

  private def positive(t0: String): Clause = {
    // term^2 / "phrase"^1.5 boost: Lucene boost only reorders SCORES, and
    // boolean TEXT_MATCH has no scores — parse and drop (round 10)
    val t = boostRe.findFirstMatchIn(t0)
      .map(m => t0.substring(0, m.start)).getOrElse(t0)
    if (t.startsWith("\"")) {
      if (t.endsWith("\"") && t.length >= 2) Phrase(t.substring(1, t.length - 1))
      else if (fuzzyRe.matches(t)) throw new IllegalArgumentException(
        s"TEXT_MATCH: phrase slop ('\"...\"~N') is not supported: $t0")
      else throw new IllegalArgumentException(
        s"TEXT_MATCH: malformed phrase token: $t0")
    }
    else if (fuzzyRe.matches(t)) {
      val fuzzyRe(stem, digits) = t
      require(!stem.contains("\""),
        s"TEXT_MATCH: phrase slop ('\"...\"~N') is not supported: $t0")
      require(!stem.exists(c => c == '*' || c == '?'),
        s"TEXT_MATCH: wildcards cannot combine with fuzzy '~': $t0")
      val n = if (digits.isEmpty) 2 else digits.toInt
      require(n <= 2,
        s"TEXT_MATCH: fuzzy '~$n' exceeds the Lucene maximum of 2: $t0")
      if (n == 0) Term(stem) else Fuzzy(stem, n)
    }
    else if (t.endsWith("*") && !t.dropRight(1).exists(c => c == '*' || c == '?'))
      Prefix(t.dropRight(1))
    else if (t.exists(c => c == '*' || c == '?')) Wildcard(t)
    else Term(t)
  }

  /** Tokens: parens, quoted phrases (optionally `-`-negated), bare words.
    * Operators AND/OR/NOT are recognized at parse, not here. */
  private def tokenize(q: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    def quoted(from: Int): Int = {
      val j = q.indexOf('"', from + 1)
      require(j >= 0, s"TEXT_MATCH: unterminated phrase in: $q")
      j
    }
    // a quoted phrase keeps any trailing suffix chars (boost `^2`, slop
    // `~N`) in ITS token so positive() can strip/reject them
    def tail(from: Int): Int = {
      var k = from
      while (k < q.length && !q.charAt(k).isWhitespace &&
        q.charAt(k) != '(' && q.charAt(k) != ')') k += 1
      k
    }
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' || c == ')') { out += c.toString; i += 1 }
      else if (c == '"') {
        val j = quoted(i); val k = tail(j + 1)
        out += q.substring(i, k); i = k
      }
      else if (c == '-' && i + 1 < q.length && q.charAt(i + 1) == '"') {
        val j = quoted(i + 1); val k = tail(j + 1)
        out += q.substring(i, k); i = k
      } else {
        var j = i
        while (j < q.length && !q.charAt(j).isWhitespace &&
          q.charAt(j) != '(' && q.charAt(j) != ')') j += 1
        out += q.substring(i, j); i = j
      }
    }
    out.toSeq
  }

  /** Recursive-descent parse of the full grammar:
    * or := and (OR and)*; and := unary (AND unary)*;
    * unary := NOT unary | -token | ( or ) | token.
    * Adjacent terms with no operator stay a LOUD error (Lucene's implicit
    * operator is configuration-dependent — refusing beats guessing). */
  def parseTree(query: String): Node = {
    val toks = tokenize(query.trim)
    require(toks.nonEmpty, "TEXT_MATCH: empty query")
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
        require(peek.contains(")"), s"TEXT_MATCH: expected ')' in: $query")
        take(); n
      case Some(t) if t == ")" || t == "AND" || t == "OR" =>
        throw new IllegalArgumentException(s"TEXT_MATCH: unexpected '$t' in: $query")
      case Some(t) if t.startsWith("-") && t.length > 1 =>
        take(); NotNode(Leaf(positive(t.substring(1))))
      case Some(t) => take(); Leaf(positive(t))
      case None => throw new IllegalArgumentException(
        s"TEXT_MATCH: unexpected end of query: $query")
    }
    val n = parseOr()
    require(pos == toks.length,
      s"TEXT_MATCH: trailing tokens from '${toks(pos)}' — adjacent terms " +
        s"need an explicit AND/OR: $query")
    n
  }

  /** The `(?i)`-anchored single-token regex for a wildcard pattern:
    * literal runs quoted, `*` → `\w*`, `?` → `\w`, token-bounded on both
    * sides (the right bound drops for a trailing `*`, matching Prefix). */
  private[graft] def wildcardRegex(pat: String): String = {
    val sb = new StringBuilder("(?i)\\b")
    val lit = new StringBuilder
    def flush(): Unit =
      if (lit.nonEmpty) { sb.append("\\Q").append(lit).append("\\E"); lit.clear() }
    pat.foreach {
      case '*' => flush(); sb.append("\\w*")
      case '?' => flush(); sb.append("\\w")
      case c => lit.append(c)
    }
    flush()
    if (!pat.endsWith("*")) sb.append("\\b")
    sb.toString
  }

  private def clauseExpr(input: Expression, c: Clause): Expression = c match {
    case Phrase(s) => Contains(Lower(input), Literal(s.toLowerCase))
    case Prefix(stem) => RLike(input, Literal("(?i)\\b\\Q" + stem + "\\E"))
    case Term(s) => RLike(input, Literal("(?i)\\b\\Q" + s + "\\E\\b"))
    case Wildcard(p) => RLike(input, Literal(wildcardRegex(p)))
    case Fuzzy(s, n) =>
      // any maximal word-run of the text within n edits of the term:
      // split on non-word runs (post-lower, so \w ≡ [a-z0-9_]), exists
      // with a thresholded levenshtein (early-exit kernel: returns -1
      // past the threshold). Empty split artifacts (leading delimiter)
      // are excluded — lev("", s) = len(s) would false-match short terms.
      val tok = org.apache.spark.sql.catalyst.expressions.UnresolvedNamedLambdaVariable(Seq("t"))
      val toks = StringSplit(Lower(input), Literal("[^a-z0-9_]+"), Literal(-1))
      val hit = And(
        GreaterThan(Length(tok), Literal(0)),
        GreaterThanOrEqual(
          Levenshtein(tok, Literal(s.toLowerCase), Some(Literal(n))), Literal(0)))
      org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
        "exists", Seq(toks, LambdaFunction(hit, Seq(tok))), isDistinct = false)
  }

  private def nodeExpr(input: Expression, n: Node): Expression = n match {
    case Leaf(c) => clauseExpr(input, c)
    case AndNode(ks) => ks.map(nodeExpr(input, _)).reduce(And)
    case OrNode(ks) => ks.map(nodeExpr(input, _)).reduce(Or)
    case NotNode(k) =>
      org.apache.spark.sql.catalyst.expressions.Not(nodeExpr(input, k))
  }

  /** The exact full-scan predicate for `query` over `input`. */
  def predicate(input: Expression, query: String): Expression =
    nodeExpr(input, parseTree(query))
}
