package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) string join — the PassJoin shape (Li, Deng, Feng:
  * "PassJoin: A Partition-based Method for Similarity Joins", PVLDB 2012),
  * re-expressed as Spark map-side candidate generation + an equi-join +
  * an exact `levenshtein` confirm.
  *
  * Correctness rests on the pigeonhole theorem: if `edit(s, t) <= d` and
  * `t` is partitioned into `d+1` segments, an optimal alignment maps each
  * segment of `t` onto a substring of `s`, and at least one segment incurs
  * ZERO edits — i.e. appears in `s` verbatim, displaced by at most `d`
  * positions. So the candidate set { (s, t) : some segment_i(t) equals a
  * substring of s of the same length at position start_i +- d } provably
  * CONTAINS every true pair, and the equi-join on (|t|, i, segment) plus
  * the exact confirm returns exactly the brute-force answer — which is why
  * the declared query's oracle can be a plain levenshtein cross-filter.
  *
  * Scale shape: both sides are map-only array expansions with HARD bounds —
  * the index side emits d+1 rows per string, the probe side at most
  * (2d+1) lengths x (d+1) segments x (2d+1) positions rows (~75 at d=2,
  * all from `sequence`/`transform`/`substring` inside whole-stage codegen).
  * The join is a plain shuffled equi-join on short segment keys; nothing is
  * cartesian and no partition grows with corpus size. At 100 TB this is the
  * standard dedup-candidate topology: bounded fan-out, banded exchange,
  * per-pair confirm.
  *
  * Reference anchor: fuzzy matching is not in Pinot 1.2's surface; this is
  * part of the training-data pipeline extension family (SURVEY.md §2.11) —
  * entity/near-key reconciliation before joins, typo-class dedup of titles.
  */
object FuzzyJoin {

  /** Segment start (1-based) and length for slot `i` of a length-`L` string
    * split into `d+1` near-even segments: the first `d+1-rem` segments get
    * `floor(L/(d+1))` chars, the last `rem` get one extra (rem = L mod d+1).
    * Closed forms in EXACT INTEGER arithmetic (`Column./` is double
    * division — truncating `i * (L/(d+1))` as a float mis-places starts,
    * e.g. L=8 d=2 i=2 lands on 7 instead of 6):
    * len_i = base + (i >= k), start_i = 1 + i*base + max(0, i-k). */
  private def intDiv(a: Column, b: Int): Column =
    floor(a.cast("double") / b).cast("int") // exact for the int range

  private def segLen(l: Column, i: Column, d: Int): Column = {
    val base = intDiv(l.cast("int"), d + 1)
    val k = lit(d + 1) - pmod(l.cast("int"), lit(d + 1))
    (base + when(i >= k, 1).otherwise(0)).cast("int")
  }

  private def segStart(l: Column, i: Column, d: Int): Column = {
    val base = intDiv(l.cast("int"), d + 1)
    val k = lit(d + 1) - pmod(l.cast("int"), lit(d + 1))
    (lit(1) + i * base + greatest(i - k, lit(0))).cast("int")
  }

  /** Index side: `d+1` (slot, segment) rows per string. Join key =
    * (length, slot, segment). */
  def indexSide(df: DataFrame, strCol: String, d: Int): DataFrame = {
    val base = df.select(col(strCol).as("t"))
    val l = length(col("t"))
    val segs = transform(sequence(lit(0), lit(d)), i =>
      struct(i.as("i"),
        substring(col("t"), segStart(l, i, d), segLen(l, i, d)).as("seg")))
    base.select(col("t"), l.as("tl"), explode(segs).as("x"))
      .select(col("t"), col("tl"), col("x.i").as("i"), col("x.seg").as("seg"))
  }

  /** Probe side: for every candidate target length L' in [|s|-d, |s|+d] and
    * slot i, all substrings of `s` with L'-segmentation length at positions
    * within +-d of the segment's home start — the displacement bound the
    * pigeonhole argument guarantees. Bounded fan-out per row; empty
    * sequences guarded (Spark `sequence(a,b)` with a > b is DESCENDING,
    * never empty — the round-3 gotcha). */
  def probeSide(df: DataFrame, strCol: String, d: Int): DataFrame = {
    val base = df.select(col(strCol).as("s"))
    val sl = length(col("s"))
    val cands = flatten(transform(
      sequence(greatest(sl - d, lit(1)), sl + d), lp =>
        flatten(transform(sequence(lit(0), lit(d)), i => {
          val ln = segLen(lp, i, d)
          val st = segStart(lp, i, d)
          val lo = greatest(st - d, lit(1))
          val hi = least(sl - ln + lit(1), st + d)
          val ps = when(hi >= lo, sequence(lo, hi))
            .otherwise(array().cast("array<int>"))
          transform(ps, p =>
            struct(lp.as("tl"), i.as("i"),
              substring(col("s"), p, ln).as("seg")))
        }))))
    base.select(col("s"), explode(cands).as("c"))
      .select(col("s"), col("c.tl").as("tl"), col("c.i").as("i"),
        col("c.seg").as("seg"))
  }

  /** All unordered pairs (a < b) of distinct values of `strCol` within edit
    * distance `d` (exact levenshtein confirm; candidate generation is
    * provably complete). Output: (a, b, dist). */
  def selfJoin(df: DataFrame, strCol: String, d: Int): DataFrame = {
    val names = df.select(col(strCol)).where(col(strCol).isNotNull).distinct()
    val probe = probeSide(names, strCol, d)
    val index = indexSide(names, strCol, d)
    probe.join(index, Seq("tl", "i", "seg"))
      .where(col("s") < col("t"))
      .select(col("s").as("a"), col("t").as("b"))
      .distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .where(col("dist") <= d)
  }
}
