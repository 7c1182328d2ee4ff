package graft.expressions

import org.apache.spark.sql.catalyst.expressions._

/** Shared parser/builder for Pinot's TEXT_MATCH(col, 'lucene query') surface
  * (reference broker parses it even with no text index configured —
  * `kinesisTableConfigFile.json:12-27`): terms (word-boundary,
  * case-insensitive), "phrases", trailing-* prefixes, single-operator
  * AND/OR chains. Used by two callers:
  *
  *  - [[graft.PinotFunctions]] registers the full-scan predicate form;
  *  - [[graft.sources.TextIndex]] uses the SAME parse to derive an
  *    index-candidate superset, then re-applies [[predicate]] exactly —
  *    so the accelerated path can never diverge from the scan path.
  */
object TextMatchBuilder {

  sealed trait Clause
  final case class Phrase(s: String) extends Clause
  final case class Prefix(stem: String) extends Clause
  final case class Term(s: String) extends Clause

  /** (isAnd, clauses). Single-clause queries report isAnd = true. */
  def parse(query: String): (Boolean, Seq[Clause]) = {
    val q = query.trim
    val hasAnd = q.contains(" AND ")
    val hasOr = q.contains(" OR ")
    if (hasAnd && hasOr) throw new IllegalArgumentException(
      s"TEXT_MATCH: mixed AND/OR not supported without parentheses: $query")
    val parts = q.split(if (hasAnd) " AND " else " OR ").toSeq
    val clauses = parts.map(_.trim).map { t =>
      if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
        Phrase(t.substring(1, t.length - 1))
      else if (t.endsWith("*")) Prefix(t.dropRight(1))
      else Term(t)
    }
    (!hasOr, clauses)
  }

  private def clauseExpr(input: Expression, c: Clause): Expression = c match {
    case Phrase(s) => Contains(Lower(input), Literal(s.toLowerCase))
    case Prefix(stem) => RLike(input, Literal("(?i)\\b\\Q" + stem + "\\E"))
    case Term(s) => RLike(input, Literal("(?i)\\b\\Q" + s + "\\E\\b"))
  }

  /** The exact full-scan predicate for `query` over `input`. */
  def predicate(input: Expression, query: String): Expression = {
    val (isAnd, clauses) = parse(query)
    val exprs = clauses.map(clauseExpr(input, _))
    if (isAnd) exprs.reduce(And) else exprs.reduce(Or)
  }
}
