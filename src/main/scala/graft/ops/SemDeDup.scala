package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
  * bounded by k-means cells — the published scale path for embedding-space
  * near-dup removal. The clusters cap the quadratic: pairwise cosine is
  * computed only WITHIN a cell (the paper runs 50k clusters over LAION for
  * exactly this reason), so candidate work is Σ|cell|², never corpus².
  * On top of the cell bound, [[Dedup.saltSplit]] deterministically splits
  * any overfull cell into id-mod sub-buckets (the MinHash-LSH cap
  * contract), so the worst cell costs O(|cell|·cap) — a mis-trained
  * codebook cannot reintroduce the all-pairs failure mode.
  *
  * Keeper rule (the paper's §3 exemplar choice, made deterministic): for
  * each near-dup pair the member FARTHER from its cell centroid survives,
  * ties to the smaller id. Both the cosine and the centroid distance are
  * the engine's sequential float64 folds, bit-identical to the DuckDB
  * oracle replica, so removal decisions replay exactly across engines.
  *
  * Reference behavior target: the curation stage a Pinot-backed analytics
  * stack runs upstream of ingestion (the reference deploys the serving
  * layer only — `/root/reference/README.md:23`).
  */
object SemDeDup {

  /** Qualifying near-dup pairs within (cell, sub): `(cell, sub, ia, ib,
    * da, db, cs)` with `ia < ib` and cosine `cs` ≥ tau. `salted` must
    * carry idCol, embCol, distCol, cellCol and the saltSplit `sub` column,
    * and SHOULD be persisted by the caller (both sides of a self-join). */
  def cellPairs(salted: DataFrame, idCol: String, embCol: String,
      distCol: String, cellCol: String, tau: Double): DataFrame = {
    val a = salted.as("a")
    val b = salted.as("b")
    a.join(b,
        col(s"a.$cellCol") === col(s"b.$cellCol") &&
          col("a.sub") === col("b.sub") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cs", graft.functions.cosine_sim(
        col(s"a.$embCol"), col(s"b.$embCol")))
      .filter(col("cs") >= tau)
      .select(
        col(s"a.$cellCol").as("cell"), col("a.sub").as("sub"),
        col(s"a.$idCol").as("ia"), col(s"b.$idCol").as("ib"),
        col(s"a.$distCol").as("da"), col(s"b.$distCol").as("db"),
        col("cs"))
  }

  /** Ids removed under the keep-farthest-from-centroid rule: in a pair the
    * member with the SMALLER centroid distance is dropped; on equal
    * distances the larger id is dropped (ia < ib in every pair, so
    * `da >= db → drop ib` encodes both branches of the tie rule). */
  def removedOf(pairs: DataFrame): DataFrame =
    pairs.select(
        when(col("da") >= col("db"), col("ib")).otherwise(col("ia")).as("rid"))
      .distinct()
}
