package graft.ops

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable deduplication operators (SURVEY.md §2.11 X1) — the library API
  * behind the declared q_dedup_* queries. Every candidate generator is
  * banded/blocked (never all-pairs); see SCALE.md for the 100 TB bounds.
  */
object Dedup {

  /** Exact dedup: keep the smallest `idCol` row per identical `keyCol`.
    * One shuffle on the key (at 100 TB: pre-hash the key to keep shuffle
    * rows narrow). Returns the survivor ids. */
  def exactSurvivors(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(min(col(idCol)).as("keeper_id"))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard confirmation.
    *
    * @param textCol whitespace-tokenizable text
    * @param shingleN word-shingle width
    * @param k signature width
    * @param bands×rowsPerBand must equal k; sets the similarity threshold
    *        curve (P[candidate] = 1-(1-J^r)^b)
    * @return (id_a, id_b, jaccard) for confirmed pairs with J ≥ threshold
    */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(bands * rowsPerBand == k, s"bands($bands) x rows($rowsPerBand) must equal k($k)")
    val base = df.select(
        col(idCol).as("doc_id"),
        array_distinct(shingleHashes(tokens(col(textCol)), shingleN)).as("shingles"))
      .withColumn("sig", minhashFromHashes(col("shingles"), k))
      .withColumn("sh_sorted", sort_array(col("shingles")))
      .withColumn("n_sh", size(col("sh_sorted")))
      .persist()
    val bandsDf = base.select(col("doc_id"), explode(lshBands(col("sig"), bands, rowsPerBand)).as("bk"))
    val pairs = bandsDf.as("a")
      .join(bandsDf.as("b"), col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    pairs
      .join(base.select(col("doc_id").as("id_a"), col("sh_sorted").as("sh_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(base.select(col("doc_id").as("id_b"), col("sh_sorted").as("sh_b"), col("n_sh").as("nb")), Seq("id_b"))
      .withColumn("n_inter", sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-duplicate pairs: 64-bit fingerprints, candidates via
    * 16-bit hash bands, confirmed at Hamming distance ≤ maxHamming. */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 8): DataFrame = {
    val fp = df.select(col(idCol).as("doc_id"), simhash64(tokens(col(textCol))).as("sig")).persist()
    val bandsDf = fp.select(
      col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), 16 * b).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
    bandsDf.as("a")
      .join(bandsDf.as("b"), col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
