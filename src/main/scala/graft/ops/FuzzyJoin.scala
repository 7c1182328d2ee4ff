package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) string join: symmetric-deletion candidate
  * generation (the SymSpell scheme, Garbe 2012) + an exact `levenshtein`
  * confirm.
  *
  * Correctness rests on the deletion-neighborhood theorem: if
  * `edit(s, t) <= d` under Levenshtein (k substitutions, i insertions, e
  * deletions, k+i+e <= d), removing from `s` its e deleted and k
  * substituted characters and from `t` its i inserted and k substituted
  * characters yields the SAME string, using at most d deletions on each
  * side. So `Del_<=d(s) ∩ Del_<=d(t) != ∅` for every true pair — the
  * equi-join on deletion variants provably contains the brute-force
  * answer, and the exact confirm returns exactly it. That completeness is
  * why the declared query's oracle can be a plain levenshtein
  * cross-filter.
  *
  * Why deletions and not PassJoin segments (the first cut here): segment
  * keys are only ~L/(d+1) characters, and on LOW-ENTROPY dictionaries
  * (title/name data full of shared syllables) their buckets collide
  * massively — measured 459 s at a 160k synthetic name dictionary, growing
  * quadratically (bucket products). Deletion variants keep L-d characters:
  * sharing one requires the strings to nearly coincide, which is the
  * true-pair condition itself, so candidate volume tracks the answer size.
  * Same measurement after the switch: see BASELINE.md round-9 trend.
  *
  * Scale shape: variant generation is map-only with a hard per-string
  * bound (Σ_{j<=d} C(L,j): ~80 at L=12 d=2, ~300 at d=3), the join is a
  * shuffled equi-join on (variant, source-length band), pairs dedup before
  * the confirm, and nothing is cartesian — no partition grows with corpus
  * size, and the dictionary side is DISTINCT strings, never raw rows.
  *
  * Fuzzy matching is not in Pinot 1.2's surface; this is the training-data
  * pipeline extension family (SURVEY.md §2.11) — entity/near-key
  * reconciliation before joins, typo-class dedup of titles.
  */
object FuzzyJoin {

  /** Delete the character at 1-based position `i` (callers guarantee
    * 1 <= i <= length). `Column.substr` takes Column args, so this stays
    * inside codegen. */
  private def deleteAt(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i))

  private def emptyArr: Column = array().cast("array<string>")

  /** All strings obtainable from `s` by deleting at most `d` characters
    * (including `s` itself), as one array column. Positions are deleted
    * highest-first inside each combination so earlier indices stay valid.
    * Guards every `sequence` lower>upper case (Spark sequences are
    * DESCENDING, never empty, when reversed — the round-3 gotcha). */
  def deletionVariants(s: Column, d: Int): Column = {
    require(d >= 1 && d <= 3, s"fuzzy join supports d in 1..3, got $d")
    val l = length(s)
    val d1 = when(l >= 1,
      transform(sequence(lit(1), l), i => deleteAt(s, i))).otherwise(emptyArr)
    val d2 = when(l >= 2,
      flatten(transform(sequence(lit(1), greatest(l - 1, lit(1))), i =>
        transform(sequence(least(i + 1, l), l), j =>
          deleteAt(deleteAt(s, j), i))))).otherwise(emptyArr)
    val d3 = when(l >= 3,
      flatten(transform(sequence(lit(1), greatest(l - 2, lit(1))), i =>
        flatten(transform(sequence(least(i + 1, l), greatest(l - 1, lit(1))), j =>
          transform(sequence(least(j + 1, l), l), k =>
            deleteAt(deleteAt(deleteAt(s, k), j), i))))))).otherwise(emptyArr)
    val parts = Seq(array(s), d1) ++
      (if (d >= 2) Seq(d2) else Nil) ++
      (if (d >= 3) Seq(d3) else Nil)
    // a variant reachable via different deletion sets repeats (e.g. runs of
    // one char) — dedup BEFORE the exchange, the fan-out bound is on
    // distinct variants
    array_distinct(concat(parts: _*))
  }

  /** (string, variant) rows for one side of the join. */
  private def variantRows(df: DataFrame, strCol: String, d: Int,
      as: String): DataFrame = {
    val base = df.select(col(strCol).as(as)).where(col(as).isNotNull).distinct()
    base.select(col(as), explode(deletionVariants(col(as), d)).as("v"))
  }

  /** All unordered pairs (a < b) of distinct values of `strCol` within edit
    * distance `d` (exact levenshtein confirm; candidate generation is
    * provably complete). Output: (a, b, dist). */
  def selfJoin(df: DataFrame, strCol: String, d: Int): DataFrame = {
    val va = variantRows(df, strCol, d, "a")
    val vb = variantRows(df, strCol, d, "b")
    va.join(vb, Seq("v"))
      .where(col("a") < col("b") &&
        abs(length(col("a")) - length(col("b"))) <= d)
      .select(col("a"), col("b"))
      .distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") <= d)
  }

  /** Two-table variant — every (left, right) pair within edit distance `d`
    * over the DISTINCT value dictionaries of the two columns (the record-
    * linkage shape: reconcile a noisy feed against a reference list before
    * an equi-join). Output: (a = left value, b = right value, dist);
    * identical values match at dist 0. */
  def join(left: DataFrame, leftCol: String, right: DataFrame,
      rightCol: String, d: Int): DataFrame = {
    val va = variantRows(left, leftCol, d, "a")
    val vb = variantRows(right, rightCol, d, "b")
    va.join(vb, Seq("v"))
      .where(abs(length(col("a")) - length(col("b"))) <= d)
      .select(col("a"), col("b"))
      .distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") <= d)
  }
}
