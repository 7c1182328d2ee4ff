package graft.expressions

import org.apache.spark.sql.catalyst.expressions._

/** Shared parser/builder for Pinot's TEXT_MATCH(col, 'lucene query') surface
  * (reference broker parses it even with no text index configured —
  * `kinesisTableConfigFile.json:12-27`): terms (word-boundary,
  * case-insensitive), "phrases", trailing-* prefixes, round-8 `NOT x` /
  * `-x` negation and `te?t` / `te*t` mid-token wildcards,
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
  final case class Not(inner: Clause) extends Clause

  /** (isAnd, clauses). Single-clause queries report isAnd = true. */
  def parse(query: String): (Boolean, Seq[Clause]) = {
    val q = query.trim
    val hasAnd = q.contains(" AND ")
    val hasOr = q.contains(" OR ")
    if (hasAnd && hasOr) throw new IllegalArgumentException(
      s"TEXT_MATCH: mixed AND/OR not supported without parentheses: $query")
    val parts = q.split(if (hasAnd) " AND " else " OR ").toSeq
    def positive(t: String): Clause = {
      if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
        Phrase(t.substring(1, t.length - 1))
      else if (t.endsWith("*") && !t.dropRight(1).exists(c => c == '*' || c == '?'))
        Prefix(t.dropRight(1))
      else if (t.exists(c => c == '*' || c == '?')) Wildcard(t)
      else Term(t)
    }
    val clauses = parts.map(_.trim).map { t =>
      if (t.startsWith("NOT ")) Not(positive(t.substring(4).trim))
      else if (t.startsWith("-") && t.length > 1) Not(positive(t.substring(1)))
      else positive(t)
    }
    (!hasOr, clauses)
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
    case Not(inner) => org.apache.spark.sql.catalyst.expressions.Not(clauseExpr(input, inner))
  }

  /** The exact full-scan predicate for `query` over `input`. */
  def predicate(input: Expression, query: String): Expression = {
    val (isAnd, clauses) = parse(query)
    val exprs = clauses.map(clauseExpr(input, _))
    if (isAnd) exprs.reduce(And) else exprs.reduce(Or)
  }
}
