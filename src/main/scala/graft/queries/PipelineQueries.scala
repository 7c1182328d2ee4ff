package graft.queries

import graft.Q
import graft.functions._
import graft.sources.Tables
import graft.tools.DuckDbSql

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond scoring (SURVEY.md §2.11 X3/X5):
  * sequence packing for context windows, deterministic stratified splits,
  * and PII scrubbing — the steps between "scored corpus" and "training
  * batches". All are single-shuffle window/aggregate shapes that stream at
  * 100 TB (the split is map-only).
  */
object PipelineQueries {

  /** X5 sequence packing: concatenate documents in doc_id order within
    * (lang, shard) and cut packs at a 2048-token budget — each doc is
    * assigned the pack its START offset falls in (the sequential greedy
    * packing used when building fixed-context training batches).
    *
    * The window partitions on (lang, shard = doc_id DIV 100k), NOT bare
    * lang: a per-language window would funnel billions of docs through one
    * partition at 100 TB. Sharding restarts packing every 100k doc ids —
    * exactly how production packers shard (pack within a file/shard, never
    * globally) — and bounds every window partition regardless of corpus
    * size. Pack ids are globally unique via (shard, local pack). */
  private val packSequences = Q(
    "q_pack_sequences",
    (spark, dir) => {
      val budget = 2048
      val shardSize = 100000L
      val d = Tables.t(spark, dir, "documents")
      val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      d.withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .withColumn("shard", expr(s"doc_id DIV $shardSize"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("pack_id", expr(s"(cum - n_tokens) DIV $budget"))
        .groupBy(col("lang"), col("shard"), col("pack_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("pack_tokens"))
        .orderBy(col("lang"), col("shard"), col("pack_id"))
        .limit(200)
    },
    Some("""WITH sized AS (
            |  SELECT lang, doc_id, doc_id // 100000 AS shard,
            |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            |  FROM documents
            |), cums AS (
            |  SELECT lang, doc_id, shard, n_tokens,
            |         sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id) AS cum
            |  FROM sized
            |)
            |SELECT lang, shard, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
            |       count(*) AS n_docs,
            |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
            |FROM cums GROUP BY lang, shard, pack_id
            |ORDER BY lang, shard, pack_id LIMIT 200""".stripMargin))

  /** X5 deterministic stratified split: train/valid/test by a seeded stable
    * hash of the doc id — reproducible across runs and engines, map-only at
    * any scale (no sampling state, no shuffle before the count). */
  private val splitSample = Q(
    "q_split_sample",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      val h = pmod(stable_hash64(col("doc_id").cast("string"), 7L), lit(100L))
      d.withColumn("split",
          when(h < 80, "train").when(h < 90, "valid").otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .orderBy(col("lang"), col("split"))
    },
    Some {
      val h = DuckDbSql.hash64("CAST(doc_id AS VARCHAR)", 7L)
      s"""WITH hashed AS (
         |  SELECT lang, text, ((($h) % 100) + 100) % 100 AS hb FROM documents
         |)
         |SELECT lang,
         |       CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'valid' ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         |FROM hashed GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
    })

  /** X5 PII scrubbing: count and redact email/phone patterns per source —
    * pure per-row regex (map-only; regexes chosen to behave identically in
    * Java and RE2). The fixture corpus is synthetic so counts are typically
    * zero; PiiSpec plants real PII strings and asserts the scrubber. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}"

  private val piiScrub = Q(
    "q_text_pii",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      val scrubbed = regexp_replace(
        regexp_replace(col("text"), emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
      d.withColumn("n_emails", regexp_count(col("text"), lit(emailRe)))
        .withColumn("n_phones", regexp_count(col("text"), lit(phoneRe)))
        .withColumn("delta", (length(col("text")) - length(scrubbed)).cast("long"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_emails").cast("long")).as("n_emails"),
          sum(col("n_phones").cast("long")).as("n_phones"),
          sum(col("delta")).as("n_chars_delta"))
        .orderBy(col("source"))
    },
    Some(s"""SELECT source, count(*) AS n_docs,
             |CAST(sum(len(regexp_extract_all(text, '$emailRe'))) AS BIGINT) AS n_emails,
             |CAST(sum(len(regexp_extract_all(text, '$phoneRe'))) AS BIGINT) AS n_phones,
             |CAST(sum(length(text) - length(
             |  regexp_replace(regexp_replace(text, '$emailRe', '[EMAIL]', 'g'),
             |                 '$phoneRe', '[PHONE]', 'g'))) AS BIGINT) AS n_chars_delta
             |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  /** X5 quality-percentile filtering: keep each language's top-half
    * documents by lexical diversity — the score-threshold corpus pruning
    * step (one window shuffle per lang; rank ties broken by doc_id so the
    * kept set is deterministic). */
  private val qualityFilter = Q(
    "q_quality_filter",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      val toks = split(col("text"), " ")
      val scored = d.withColumn("diversity",
        size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("diversity").desc, col("doc_id").asc)
      scored.withColumn("pr", percent_rank().over(w))
        .filter(col("pr") <= 0.5)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_kept"),
          round(min(col("diversity")), 4).as("min_kept_diversity"),
          round(avg(col("diversity")), 4).as("avg_kept_diversity"))
        .orderBy(col("lang"))
    },
    Some("""WITH scored AS (
            |  SELECT lang, doc_id,
            |         len(list_distinct(string_split(text, ' '))) * 1.0
            |           / len(string_split(text, ' ')) AS diversity
            |  FROM documents
            |), ranked AS (
            |  SELECT lang, diversity,
            |         percent_rank() OVER (PARTITION BY lang
            |                              ORDER BY diversity DESC, doc_id ASC) AS pr
            |  FROM scored
            |)
            |SELECT lang, count(*) AS n_kept,
            |       round(min(diversity), 4) AS min_kept_diversity,
            |       round(avg(diversity), 4) AS avg_kept_diversity
            |FROM ranked WHERE pr <= 0.5
            |GROUP BY lang ORDER BY lang""".stripMargin))

  /** X5 eval decontamination: near-duplicate pairs that CROSS the
    * train/test split — the leakage report every eval pipeline needs.
    * Composes the ngram near-dup pairs (J ≥ 0.7) with the deterministic
    * hash split; at 100 TB this is the same bounded near-dup join plus a
    * map-side split assignment. */
  private val splitContamination = Q(
    "q_split_contamination",
    (spark, dir) => {
      val splitOf = (idCol: org.apache.spark.sql.Column) => {
        val h = pmod(stable_hash64(idCol.cast("string"), 7L), lit(100L))
        when(h < 80, "train").when(h < 90, "valid").otherwise("test")
      }
      DedupQueries.ngramNearDupPairs(spark, dir)
        .filter(col("jaccard") >= 0.7)
        .withColumn("split_a", splitOf(col("id_a")))
        .withColumn("split_b", splitOf(col("id_b")))
        .filter(col("split_a") =!= col("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(
          count(lit(1)).as("n_leaky_pairs"),
          round(max(col("jaccard")), 4).as("max_jaccard"))
        .orderBy(col("split_a"), col("split_b"))
    },
    Some {
      def bucket(c: String) =
        s"(((${DuckDbSql.hash64(s"CAST($c AS VARCHAR)", 7L)}) % 100) + 100) % 100"
      def splitSql(c: String) =
        s"CASE WHEN ${bucket(c)} < 80 THEN 'train' " +
          s"WHEN ${bucket(c)} < 90 THEN 'valid' ELSE 'test' END"
      s"""WITH ${DedupOracles.ngramPipelineCtes},
         |splits AS (
         |  SELECT id_a, id_b, jaccard,
         |         ${splitSql("id_a")} AS split_a,
         |         ${splitSql("id_b")} AS split_b
         |  FROM conf WHERE jaccard >= 0.7
         |)
         |SELECT split_a, split_b, count(*) AS n_leaky_pairs,
         |       round(max(jaccard), 4) AS max_jaccard
         |FROM splits WHERE split_a <> split_b
         |GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin
    })

  /** X5 weighted mixture sampling: each source gets a deterministic keep
    * rate (the "domain mixing" step that rebalances web/wiki/books mass in
    * a training corpus). Keep decisions are a pure hash of the doc id —
    * map-only, reproducible across engines and runs, no sampling state. */
  private val sampleMixture = Q(
    "q_sample_mixture",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      // srcN keeps 100/50/25/10 % by N mod 4 — a fixed mixture spec.
      // try_cast, not cast: ANSI mode would otherwise throw on any source
      // value not shaped like src<digits>; null idx falls to the default
      // rate via the final .otherwise (oracle mirrors with TRY_CAST).
      val idx = expr("try_cast(substring(source, 4, 10) AS int)")
      val rate = when(pmod(idx, lit(4)) === 0, 100)
        .when(pmod(idx, lit(4)) === 1, 50)
        .when(pmod(idx, lit(4)) === 2, 25)
        .otherwise(10)
      val kept = pmod(stable_hash64(col("doc_id").cast("string"), 13L), lit(100L)) < rate
      d.withColumn("kept", kept)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("kept").cast("long")).as("n_kept"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
        .orderBy(col("source"))
    },
    Some {
      val h = DuckDbSql.hash64("CAST(doc_id AS VARCHAR)", 13L)
      s"""WITH sampled AS (
         |  SELECT source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         ((($h) % 100) + 100) % 100 <
         |           CASE TRY_CAST(substr(source, 4) AS INT) % 4
         |             WHEN 0 THEN 100 WHEN 1 THEN 50 WHEN 2 THEN 25 ELSE 10 END AS kept
         |  FROM documents
         |)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM sampled GROUP BY source ORDER BY source""".stripMargin
    })

  /** X5 deterministic global shuffle: the training-order step. Every doc
    * gets a pseudorandom but reproducible position — shard by hash, order
    * within shard by (hash, doc_id). One shuffle on the shard key at any
    * scale; shard count is the lever that bounds per-writer output size. */
  private val orderShuffle = Q(
    "q_order_shuffle",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      val h = stable_hash64(col("doc_id").cast("string"), 21L)
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      d.withColumn("h", h)
        .withColumn("shard", pmod(col("h"), lit(8L)))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          max(when(col("rn") === 1, col("doc_id"))).as("first_doc_id"),
          max(when(col("rn") === 2, col("doc_id"))).as("second_doc_id"))
        .orderBy(col("shard"))
    },
    Some {
      val h = DuckDbSql.hash64("CAST(doc_id AS VARCHAR)", 21L)
      s"""WITH hashed AS (
         |  SELECT doc_id, ($h) AS h, ((($h) % 8) + 8) % 8 AS shard FROM documents
         |), ranked AS (
         |  SELECT shard, doc_id,
         |         row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
         |  FROM hashed
         |)
         |SELECT shard, count(*) AS n_docs,
         |       max(CASE WHEN rn = 1 THEN doc_id END) AS first_doc_id,
         |       max(CASE WHEN rn = 2 THEN doc_id END) AS second_doc_id
         |FROM ranked GROUP BY shard ORDER BY shard""".stripMargin
    })

  /** X5 curriculum binning: quartile buckets of lexical diversity per
    * language (ntile over a total order, so bucket edges are deterministic)
    * with the token mass per bucket — the schedule a curriculum sampler
    * reads. One window shuffle per lang partition. */
  private val curriculum = Q(
    "q_curriculum",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      val toks = split(col("text"), " ")
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("diversity").desc, col("doc_id").asc)
      d.withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("diversity",
          size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
        .withColumn("bin", ntile(4).over(w))
        .groupBy(col("lang"), col("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(avg(col("diversity")), 4).as("avg_diversity"))
        .orderBy(col("lang"), col("bin"))
    },
    Some("""WITH scored AS (
            |  SELECT lang, doc_id,
            |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            |         len(list_distinct(string_split(text, ' '))) * 1.0
            |           / len(string_split(text, ' ')) AS diversity
            |  FROM documents
            |), binned AS (
            |  SELECT lang, n_tokens, diversity,
            |         ntile(4) OVER (PARTITION BY lang
            |                        ORDER BY diversity DESC, doc_id ASC) AS bin
            |  FROM scored
            |)
            |SELECT lang, bin, count(*) AS n_docs,
            |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            |       round(avg(diversity), 4) AS avg_diversity
            |FROM binned GROUP BY lang, bin ORDER BY lang, bin""".stripMargin))

  /** X5 weighted sampling (Efraimidis–Spirakis): priority = ln(u)/w with a
    * hash-derived uniform u and weight w = token count, top-k per language
    * by priority — the deterministic, engine-reproducible way to sample a
    * corpus proportional to token mass (heavier docs win more often), used
    * for weighted corpus subsampling without an RNG. Map-only scoring + one
    * bounded per-lang window (|langs| partitions, k rows kept each).
    * u ∈ (0,1) strictly via (m + 0.5)/2^53 so ln never sees 0; selection
    * flips would need two priorities within one ulp of each other —
    * 53-bit-hash improbable. */
  private val sampleWeighted = Q(
    "q_sample_weighted",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      val m = pmod(stable_hash64(col("doc_id").cast("string"), 29L), lit(9007199254740992L))
      val u = (m.cast("double") + 0.5) / 9007199254740992.0
      val w = size(split(col("text"), " ")).cast("double")
      val scored = d
        .withColumn("w", w.cast("long"))
        .withColumn("priority", log(u) / w)
      val byPriority = Window.partitionBy(col("lang"))
        .orderBy(col("priority").desc, col("doc_id"))
      scored.withColumn("rk", row_number().over(byPriority))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("doc_id"), col("w"),
          round(col("priority"), 6).as("priority"))
        .orderBy(col("lang"), col("rk"))
    },
    Some {
      val h = DuckDbSql.hash64U("CAST(doc_id AS VARCHAR)", 29L)
      s"""WITH scored AS (
         |  SELECT lang, doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         |         ln((CAST(($h) % 9007199254740992 AS DOUBLE) + 0.5) / 9007199254740992)
         |           / len(string_split(text, ' ')) AS priority
         |  FROM documents
         |), ranked AS (
         |  SELECT lang, doc_id, w, priority,
         |         row_number() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT lang, rk, doc_id, w, round(priority, 6) AS priority
         |FROM ranked WHERE rk <= 5 ORDER BY lang, rk""".stripMargin
    })

  /** X5 per-source document cap: keep at most K docs per source, highest
    * quality first — the domain/host cap every pretraining mix applies so no
    * single crawl source dominates the corpus.
    *
    * Scale shape: top-K-per-group via SALTED two-phase selection. Phase 1
    * ranks within (source, salt=hash(doc_id) mod 16) and keeps K per salt —
    * every window partition is bounded by the salt fan-out even when one
    * hot source holds billions of docs. Phase 2 re-ranks the ≤16K survivors
    * per source — provably containing the true top-K, on a frame whose size
    * is sources×16K regardless of corpus size. A single window over bare
    * `source` (the naive spelling) would funnel the hot source through one
    * task; this never does. Totals travel as a separate partial-agg,
    * broadcast-joined back (never a count() window over the raw frame). */
  private val sourceCap = Q(
    "q_pipe_source_cap",
    (spark, dir) => {
      val k = 50
      val d = Tables.t(spark, dir, "documents")
      val toks = split(col("text"), " ")
      val scored = d.select(
        col("doc_id"), col("source"),
        (size(array_distinct(toks)).cast("double") / size(toks).cast("double")).as("quality"))
      val salted = scored.withColumn("salt", pmod(hash(col("doc_id")), lit(16)))
      val w1 = Window.partitionBy(col("source"), col("salt"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      val survivors = salted.withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
      val w2 = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      val kept = survivors.withColumn("r2", row_number().over(w2)).filter(col("r2") <= k)
      val totals = scored.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      kept.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_kept"),
          round(avg(col("quality")), 4).as("avg_kept_quality"),
          round(min(col("quality")), 4).as("min_kept_quality"))
        .join(broadcast(totals), "source")
        .select(
          col("source"), col("n_kept"),
          (col("n_total") - col("n_kept")).as("n_dropped"),
          col("avg_kept_quality"), col("min_kept_quality"))
        .orderBy(col("source"))
    },
    Some("""WITH scored AS (
            |  SELECT doc_id, source,
            |         len(list_distinct(string_split(text, ' '))) * 1.0
            |           / len(string_split(text, ' ')) AS quality
            |  FROM documents
            |), ranked AS (
            |  SELECT source, quality,
            |         row_number() OVER (PARTITION BY source
            |                            ORDER BY quality DESC, doc_id ASC) AS r
            |  FROM scored
            |), totals AS (
            |  SELECT source, CAST(count(*) AS BIGINT) AS n_total FROM scored GROUP BY source
            |)
            |SELECT r.source,
            |       CAST(count(*) AS BIGINT) AS n_kept,
            |       CAST(t.n_total - count(*) AS BIGINT) AS n_dropped,
            |       round(avg(quality), 4) AS avg_kept_quality,
            |       round(min(quality), 4) AS min_kept_quality
            |FROM ranked r JOIN totals t USING (source)
            |WHERE r.r <= 50
            |GROUP BY r.source, t.n_total
            |ORDER BY r.source""".stripMargin))

  /** Data-quality PROFILING (round 7): per-column count / nulls / min /
    * max / mean / distinct over a fact table in ONE scan — the monitoring
    * pass a pipeline runs on every ingest batch. Columns melt to
    * (column, value) long format so a single tiny-key groupBy computes
    * every metric (no per-column jobs, no Expand: one distinct column in
    * the long frame); the approx distinct (HLL++, the 100-TB path) is
    * gated as a bound boolean against the exact count computed in the
    * same aggregate. */
  private val profile = Q(
    "q_pipe_profile",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val melted = li.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("double").as("v"))): _*)).as("m"))
        .select(col("m.c").as("c"), col("m.v").as("v"))
      // two passes joined on the tiny column key: ONE agg mixing distinct
      // and plain aggregates makes Catalyst Expand the melted frame (the
      // r5 lesson) — measured 4.8-8.5 s; split passes run the same metrics
      // without row multiplication. The HLL runs on the PRE-distincted
      // frame (HLL is duplicate-insensitive — identical estimate), so the
      // final agg sees |distinct| rows, not the corpus.
      // Round 11: the base stats need NO melt — one map-side 16-aggregate
      // pass over the raw table (zero explode rows, zero persist, a
      // single-row shuffle), reshaped to the same 4 rows afterwards; the
      // melt survives only for the distinct pass, now its sole consumer.
      // Exact DECIMAL sum, not float avg: double summation order is
      // engine- and partition-dependent in the last ulps, which a round()
      // cannot mask at a digit boundary; these columns carry <=2-decimal
      // values, exact at scale 6, so the decimal sum is bit-deterministic
      // on both engines.
      val flat = li.agg(
        count(lit(1)).as("n"),
        cols.flatMap(c => Seq(
          count(col(c).cast("double")).as(s"nn_$c"),
          min(col(c).cast("double")).as(s"min_$c"),
          max(col(c).cast("double")).as(s"max_$c"),
          sum(col(c).cast("double").cast("decimal(28,6)")).cast("double")
            .as(s"sum_$c"))): _*)
      val base = flat.select(explode(array(cols.map(c => struct(
          lit(c).as("c"),
          col("n"),
          (col("n") - col(s"nn_$c")).as("n_null"),
          col(s"min_$c").as("min_v"),
          col(s"max_$c").as("max_v"),
          col(s"sum_$c").as("sum_v"))): _*)).as("s"))
        .select(col("s.c").as("c"), col("s.n").as("n"),
          col("s.n_null").as("n_null"), col("s.min_v").as("min_v"),
          col("s.max_v").as("max_v"), col("s.sum_v").as("sum_v"))
      val dist = melted.filter(col("v").isNotNull)
        .select(col("c"), col("v")).distinct()
        .groupBy(col("c"))
        .agg(
          count(lit(1)).as("n_distinct"),
          // rsd 2% with a 10% gate = a 5-sigma bound; the default 5% rsd
          // tripped the 5% gate on the high-cardinality price column
          (abs(approx_count_distinct(col("v"), 0.02) - count(lit(1)))
            <= count(lit(1)) * 0.10).as("approx_ok"))
      base.join(dist, Seq("c"))
        .select(col("c"), col("n"), col("n_null"), col("min_v"), col("max_v"),
          col("sum_v"), col("n_distinct"), col("approx_ok"))
        .orderBy(col("c"))
    },
    Some(s"""WITH m AS (
            |  SELECT 'l_quantity' AS c, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
            |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
            |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
            |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem
            |)
            |SELECT c,
            |  CAST(count(*) AS BIGINT) AS n,
            |  CAST(count(*) - count(v) AS BIGINT) AS n_null,
            |  min(v) AS min_v,
            |  max(v) AS max_v,
            |  CAST(sum(CAST(v AS DECIMAL(28,6))) AS DOUBLE) AS sum_v,
            |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
            |  TRUE AS approx_ok
            |FROM m GROUP BY c ORDER BY c""".stripMargin))

  /** X5b stratified sampling (round 8): EXACT-N per stratum by deterministic
    * hash rank — the "balanced eval set / per-language probe set" pipeline
    * op (mixture sampling is rate-based and only exact in expectation; this
    * is exact by construction). rank = row_number over (stratum, hash(id))
    * with `rk <= N`: Spark 3.5+'s WindowGroupLimit rewrites that filter into
    * a PER-PARTITION top-N BEFORE the shuffle (plan-asserted in
    * StratifiedSampleSpec), so the stratum sort never materializes — each
    * map task forwards at most N rows per stratum, the scale-safe shape even
    * for a single giant stratum. Seeded stable_hash64 makes the pick
    * reproducible and oracle-replicable (DuckDbSql.hash64). */
  private val sampleStratified = Q(
    "q_sample_stratified",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      d.withColumn("h", stable_hash64(col("doc_id").cast("string"), 13L))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    },
    Some {
      val h = DuckDbSql.hash64("CAST(doc_id AS VARCHAR)", 13L)
      s"""WITH ranked AS (
         |  SELECT lang, doc_id,
         |         row_number() OVER (PARTITION BY lang ORDER BY ($h), doc_id) AS rk
         |  FROM documents
         |)
         |SELECT lang, rk, doc_id FROM ranked WHERE rk <= 5
         |ORDER BY lang, rk""".stripMargin
    })

  /** X5b importance resampling (round 9) — the DSIR recipe (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): represent documents as hashed n-gram counts (unigrams +
    * bigrams into B = 256 buckets), fit bag-of-buckets distributions for
    * the TARGET domain (here: lang = 'en') and the SOURCE pool (the rest),
    * score every source doc with its importance log-weight
    * Σ_b n_db · [ln p̂_t(b) − ln p̂_s(b)] (add-one smoothed), and resample
    * by Gumbel top-k (priority = logw + Gumbel(hash(doc_id)) — sampling
    * without replacement ∝ w with ZERO RNG state, the q_sample_weighted
    * doctrine).
    *
    * Scale shape: the bucket-stats frame is B = 256 rows (broadcast), the
    * per-(doc,bucket) count shuffle is bounded by 256 distinct keys per
    * doc, the per-doc fold runs in BUCKET-SORTED order (the lm_score
    * bit-exact float pairing), and selection is TakeOrderedAndProject —
    * nothing grows super-linearly and no global window. B=256 = 2^8 keeps
    * pmod(signed)/unsigned-% equality for the oracle hash pairing. */
  private val sampleDsir = Q(
    "q_sample_dsir",
    (spark, dir) => {
      val d = graft.ops.Par.fanOut(Tables.t(spark, dir, "documents"))
      val toks = split(col("text"), " ")
      val n = size(toks)
      val bigrams = zip_with(
        slice(toks, lit(1), greatest(n - 1, lit(0))),
        slice(toks, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      val bg = d.select(col("doc_id"), col("lang"),
          explode(concat(toks, bigrams)).as("g"))
        .select(col("doc_id"), col("lang"),
          pmod(stable_hash64(col("g"), 17L), lit(256L)).as("b"))
        .persist() // shared: bucket stats (full corpus) + per-doc counts
      val stats = bg.groupBy(col("b")).agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("cs"))
      val tot = stats.agg(sum(col("ct")).cast("double").as("nt"),
        sum(col("cs")).cast("double").as("ns"))
      val lr = stats.crossJoin(broadcast(tot)).select(col("b"),
        (log((col("ct") + 1L).cast("double") / (col("nt") + 256.0)) -
          log((col("cs") + 1L).cast("double") / (col("ns") + 256.0))).as("lr"))
      val db = bg.filter(col("lang") =!= "en")
        .groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("n_db"))
      val perDoc = db.join(broadcast(lr), Seq("b"))
        .select(col("doc_id"), col("lang"), col("n_db"),
          struct(col("b"), (col("n_db").cast("double") * col("lr")).as("c")).as("tc"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("n_db")).cast("long").as("n_grams"),
          expr("aggregate(transform(sort_array(collect_list(tc)), x -> x.c), 0.0D, (acc, x) -> acc + x)")
            .as("lw"))
      val m = pmod(stable_hash64(col("doc_id").cast("string"), 31L),
        lit(9007199254740992L))
      val u = (m.cast("double") + 0.5) / 9007199254740992.0
      val scored = perDoc
        .withColumn("priority", round(col("lw") + (-log(-log(u))), 6))
        .withColumn("logw", round(col("lw"), 6))
      val top = scored.orderBy(col("priority").desc, col("doc_id").asc).limit(20)
      val w = Window.orderBy(col("priority").desc, col("doc_id").asc)
      top.withColumn("rn", row_number().over(w))
        .select(col("rn"), col("doc_id"), col("lang"), col("n_grams"),
          col("logw"), col("priority"))
        .orderBy(col("rn"))
    },
    Some {
      val hg = DuckDbSql.hash64U("g", 17L)
      val hd = DuckDbSql.hash64U("CAST(doc_id AS VARCHAR)", 31L)
      s"""WITH toksed AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents
         |), grams AS (
         |  SELECT doc_id, lang, unnest(tk) AS g FROM toksed
         |  UNION ALL
         |  SELECT doc_id, lang, tk[i] || ' ' || tk[i+1] AS g
         |  FROM (SELECT doc_id, lang, tk, unnest(range(1, len(tk))) AS i FROM toksed)
         |), bg AS (
         |  SELECT doc_id, lang, CAST(($hg) % 256 AS BIGINT) AS b FROM grams
         |), stats AS (
         |  SELECT b,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |         CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cs
         |  FROM bg GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(ct) AS DOUBLE) AS nt, CAST(sum(cs) AS DOUBLE) AS ns FROM stats
         |), lr AS (
         |  SELECT b,
         |         ln(CAST(ct + 1 AS DOUBLE) / (nt + CAST(256 AS DOUBLE))) -
         |         ln(CAST(cs + 1 AS DOUBLE) / (ns + CAST(256 AS DOUBLE))) AS lr
         |  FROM stats, tot
         |), db AS (
         |  SELECT doc_id, lang, b, count(*) AS n_db
         |  FROM bg WHERE lang <> 'en' GROUP BY 1, 2, 3
         |), perdoc AS (
         |  SELECT db.doc_id, db.lang,
         |         CAST(sum(n_db) AS BIGINT) AS n_grams,
         |         list_reduce(list(CAST(n_db AS DOUBLE) * lr.lr ORDER BY db.b),
         |                     (acc, x) -> acc + x) AS lw
         |  FROM db JOIN lr USING (b) GROUP BY 1, 2
         |), gum AS (
         |  SELECT *,
         |         -ln(-ln((CAST(($hd) % 9007199254740992 AS DOUBLE) + 0.5) / 9007199254740992)) AS gmb
         |  FROM perdoc
         |), scored AS (
         |  SELECT doc_id, lang, n_grams,
         |         ${DuckDbSql.sparkRound("lw", 6)} AS logw,
         |         ${DuckDbSql.sparkRound("lw + gmb", 6)} AS priority
         |  FROM gum
         |), ranked AS (
         |  SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id ASC) AS rn
         |  FROM scored
         |)
         |SELECT rn, doc_id, lang, n_grams, logw, priority
         |FROM ranked WHERE rn <= 20 ORDER BY rn""".stripMargin
    })

  /** Trainable quality classifier (round 9 — ops/LogReg): the
    * fastText-class linear filter over hashed n-gram features that
    * pretraining pipelines train to score documents (CCNet/GPT-3 quality
    * filtering). Planted-but-honest task: label = doc contains the token
    * "spark" (SQL-derivable, so the oracle checks the exact label counts),
    * trained on EVEN doc_ids, evaluated HELD-OUT on odd — generalization,
    * not memorization (residual held-out error is hash-collision +
    * rare-combination noise, bounded in spec and here by the 0.85 floor).
    * Training runs the decimal-quantized distributed GD
    * (bit-reproducible under any partitioning); the oracle verifies exact
    * split/label counts and the Spark side asserts the learning booleans
    * (loss halved, held-out accuracy ≥ 0.85, score separation). */
  private val qualityClassifier = Q(
    "q_pipe_quality_classifier",
    (spark, dir) => {
      import spark.implicits._
      val dim = 1024
      val d = Tables.t(spark, dir, "documents")
        .withColumn("label",
          array_contains(split(col("text"), " "), "spark").cast("int"))
        .withColumn("features", graft.ops.LogReg.hashedFeatures(col("text"), dim))
        .persist()
      val train = d.filter(col("doc_id") % 2 === 0)
      val eval_ = d.filter(col("doc_id") % 2 === 1)
      val m = graft.ops.LogReg.trainAuto(train, dim, iters = 80, lr = 0.5)
      val scored = graft.ops.LogReg.score(eval_, "features", m)
        .select(col("label"), col("score"),
          (col("score") > 0.5).cast("int").as("pred"))
        .persist()
      val agg = scored.agg(
        count(lit(1)).as("n_eval"),
        sum(col("label")).cast("long").as("n_pos_eval"),
        avg((col("label") === col("pred")).cast("double")).as("acc"),
        avg(when(col("label") === 1, col("score"))).as("mean_pos"),
        avg(when(col("label") === 0, col("score"))).as("mean_neg"))
        .collect()(0)
      val nTrain = train.count()
      val lossHalved = m.losses.last < m.losses.head * 0.5
      Seq((nTrain, agg.getLong(0), agg.getLong(1),
        lossHalved,
        agg.getDouble(2) >= 0.85,
        agg.getDouble(3) > agg.getDouble(4)))
        .toDF("n_train", "n_eval", "n_pos_eval",
          "loss_halved", "heldout_acc_ge_085", "scores_separate")
    },
    Some("""SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           |       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
           |       CAST(sum(CASE WHEN doc_id % 2 = 1
           |                      AND list_contains(string_split(text, ' '), 'spark')
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_eval,
           |       TRUE AS loss_halved,
           |       TRUE AS heldout_acc_ge_085,
           |       TRUE AS scores_separate
           |FROM documents""".stripMargin))

  /** X5g end-to-end curation composite (round 9): the four-stage chain a
    * corpus actually runs as ONE DataFrame program — (1) quality gate
    * (chars / token count / stopword density, all integer comparisons);
    * (2) boilerplate dedup on the 30-token prefix key, keeper = min
    * doc_id; (3) temperature-rebalanced per-language budgets: a 20%
    * global budget split ∝ √n_s (the α=0.5 mixture flattening), computed
    * in EXACT integer arithmetic — √n is scaled to integer micro-units
    * (floor(√n·10⁶), IEEE sqrt is identical in both engines) so the
    * share division is a pure BIGINT floor-div, no float sum anywhere;
    * (4) seeded-hash rank selection inside each language. Output = the
    * per-stage accounting PLUS the XOR of the selected docs' hashes — the
    * oracle confirms the selected SET identity, not just its size.
    *
    * Scale shape: stages 1–2 are one scan + one prefix-key shuffle; the
    * budget frame is |langs| rows (broadcast); selection is the
    * WindowGroupLimit rank pattern. Nothing holds more than a language's
    * budget per group. */
  private val pipeCurate = Q(
    "q_pipe_curate",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.t(spark, dir, "documents")
      val stops = Seq("the", "a", "of", "and", "to", "in", "is")
      val toks = split(col("text"), " ")
      val scored = d.select(
        col("doc_id"), col("lang"), col("n_chars"),
        size(toks).as("n_toks"),
        size(filter(toks, t => t.isInCollection(stops))).as("n_stop"),
        concat_ws(" ", slice(toks, 1, 30)).as("pkey"))
      val q = scored.withColumn("pass",
        col("n_chars") >= 200 && col("n_toks") >= 30 &&
          col("n_stop") * 100 >= col("n_toks") * 3)
      val perlangQ = q.groupBy(col("lang")).agg(
        count(lit(1)).as("n_input"),
        count(when(col("pass"), 1)).as("n_quality"))
      val wk = Window.partitionBy(col("pkey")).orderBy(col("doc_id"))
      val uniq = q.filter(col("pass"))
        .withColumn("rn", row_number().over(wk)).filter(col("rn") === 1)
        .select(col("lang"), col("doc_id"))
        .persist()
      val wb = perlangQ
        .join(uniq.groupBy(col("lang")).agg(count(lit(1)).as("n_unique")),
          Seq("lang"), "left")
        .withColumn("n_unique", coalesce(col("n_unique"), lit(0L)))
        .withColumn("sq", floor(sqrt(col("n_unique").cast("double")) * 1000000))
      val tot = wb.agg(sum(col("sq")).as("s"), sum(col("n_unique")).as("n_tot"))
      // budget in DECIMAL(38,0): (n_tot/5)·sq peaks ≈ 2e10·3e11 ≈ 6e21 at
      // 1e11 docs — past BIGINT, so the share product must not be a long
      // multiply (ANSI throws); IntegralDivide over decimals returns LONG
      val bud = wb.join(broadcast(tot))
        .withColumn("budget",
          when(col("s") > 0, expr(
            """((CAST(n_tot AS DECIMAL(38,0)) div 5) * CAST(sq AS DECIMAL(38,0)))
              | div CAST(s AS DECIMAL(38,0))""".stripMargin)).otherwise(0L))
      val ws = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      val sel = uniq
        .withColumn("h", stable_hash64(col("doc_id").cast("string"), 29L))
        .withColumn("rk", row_number().over(ws))
        .join(broadcast(bud.select(col("lang"), col("budget"))), Seq("lang"))
        .filter(col("rk") <= col("budget"))
      val perSel = sel.groupBy(col("lang")).agg(
        count(lit(1)).as("n_selected"), expr("bit_xor(h)").as("sel_xor"))
      bud.join(perSel, Seq("lang"), "left")
        .select(col("lang"), col("n_input"), col("n_quality"), col("n_unique"),
          col("budget"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"),
          coalesce(col("sel_xor"), lit(0L)).as("sel_xor"))
        .orderBy(col("lang"))
    },
    Some {
      val h = DuckDbSql.hash64("CAST(doc_id AS VARCHAR)", 29L)
      s"""WITH scored AS MATERIALIZED (
         |  SELECT doc_id, lang, n_chars,
         |         len(str_split(text, ' ')) AS n_toks,
         |         len(list_filter(str_split(text, ' '),
         |             t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop,
         |         array_to_string(str_split(text, ' ')[1:30], ' ') AS pkey
         |  FROM documents),
         |q AS MATERIALIZED (
         |  SELECT *, (n_chars >= 200 AND n_toks >= 30 AND n_stop * 100 >= n_toks * 3) AS pass
         |  FROM scored),
         |uniq AS MATERIALIZED (
         |  SELECT lang, doc_id FROM (
         |    SELECT lang, doc_id,
         |           row_number() OVER (PARTITION BY pkey ORDER BY doc_id) AS rn
         |    FROM q WHERE pass) WHERE rn = 1),
         |wb AS MATERIALIZED (
         |  SELECT pq.lang, pq.n_input, pq.n_quality,
         |         coalesce(pu.n_unique, 0) AS n_unique,
         |         CAST(floor(sqrt(CAST(coalesce(pu.n_unique, 0) AS DOUBLE)) * 1000000) AS BIGINT) AS sq
         |  FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n_input,
         |               CAST(count(CASE WHEN pass THEN 1 END) AS BIGINT) AS n_quality
         |        FROM q GROUP BY lang) pq
         |  LEFT JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n_unique
         |             FROM uniq GROUP BY lang) pu ON pu.lang = pq.lang),
         |tot AS MATERIALIZED (
         |  SELECT CAST(sum(sq) AS BIGINT) AS s,
         |         CAST(sum(n_unique) AS BIGINT) AS n_tot FROM wb),
         |bud AS MATERIALIZED (
         |  SELECT wb.*, CASE WHEN tot.s > 0
         |    THEN (CAST(tot.n_tot // 5 AS HUGEINT) * CAST(wb.sq AS HUGEINT))
         |         // CAST(tot.s AS HUGEINT) ELSE 0 END AS budget
         |  FROM wb, tot),
         |sel AS MATERIALIZED (
         |  SELECT r.lang, r.h FROM (
         |    SELECT lang, doc_id, ($h) AS h,
         |           row_number() OVER (PARTITION BY lang ORDER BY ($h), doc_id) AS rk
         |    FROM uniq) r JOIN bud b ON b.lang = r.lang AND r.rk <= b.budget)
         |SELECT b.lang, b.n_input, b.n_quality, CAST(b.n_unique AS BIGINT) AS n_unique,
         |       CAST(b.budget AS BIGINT) AS budget,
         |       CAST(coalesce(ps.n_selected, 0) AS BIGINT) AS n_selected,
         |       CAST(coalesce(ps.sel_xor, 0) AS BIGINT) AS sel_xor
         |FROM bud b LEFT JOIN (
         |  SELECT lang, count(*) AS n_selected, bit_xor(h) AS sel_xor
         |  FROM sel GROUP BY lang) ps ON ps.lang = b.lang
         |ORDER BY b.lang""".stripMargin
    })

  /** X5-tokenize+pack (round 10): TOKENIZER-AWARE sequence packing — the
    * production coupling q_pack_sequences elides: packs are budgeted in
    * REAL (BPE) tokens, not whitespace counts, because the context window
    * a trainer fills is measured in tokenizer output. Shape: the corpus
    * collapses to the unique-word table ONCE (`Bpe.wordFreq` — the BPE
    * trainer's one shuffle), every unique word is encoded once
    * (`Bpe.encodeVocab`), and a per-document pass joins words to their
    * token counts (broadcast-able at bounded vocab) before the same
    * greedy running-sum pack cut as q_pack_sequences. The oracle replays
    * the merge training + greedy encode through the shared
    * `bpeEncodeVocabCtes` chain and the packing window verbatim. */
  private val pipeTokenizePack = Q(
    "q_pipe_tokenize_pack",
    (spark, dir) => {
      val budget = 4096
      val shardSize = 100000L
      val d = Tables.t(spark, dir, "documents")
      val merges = TextQueries.bpeTopMerges(d)
      val wlen = graft.ops.Bpe.encodeVocab(d, "text", merges)
        .select(col("w"), size(col("toks")).cast("long").as("w_tok"))
      val perDoc = d
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .join(wlen, Seq("w"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("w_tok")).as("n_tokens"))
      val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      perDoc
        .withColumn("shard", expr(s"doc_id DIV $shardSize"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("pack_id", expr(s"(cum - n_tokens) DIV $budget"))
        .groupBy(col("lang"), col("shard"), col("pack_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("pack_tokens"))
        .orderBy(col("lang"), col("shard"), col("pack_id"))
        .limit(200)
    },
    Some(s"""WITH ${TextQueries.bpeEncodeVocabCtes},
            |docw AS (
            |  SELECT doc_id, lang, w FROM (
            |    SELECT doc_id, lang,
            |           unnest(string_split_regex(text, '\\s+')) AS w
            |    FROM documents)
            |  WHERE length(w) > 0),
            |perdoc AS (
            |  SELECT d.doc_id, d.lang, CAST(sum(wl.w_tok) AS BIGINT) AS n_tokens
            |  FROM docw d JOIN wlen wl USING (w)
            |  GROUP BY d.doc_id, d.lang),
            |cums AS (
            |  SELECT lang, doc_id, doc_id // 100000 AS shard, n_tokens,
            |         sum(n_tokens) OVER (PARTITION BY lang, doc_id // 100000
            |                             ORDER BY doc_id) AS cum
            |  FROM perdoc)
            |SELECT lang, shard, CAST((cum - n_tokens) // 4096 AS BIGINT) AS pack_id,
            |       count(*) AS n_docs,
            |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
            |FROM cums GROUP BY lang, shard, pack_id
            |ORDER BY lang, shard, pack_id LIMIT 200""".stripMargin))

  val all: Seq[Q] = Seq(packSequences, splitSample, piiScrub, qualityFilter,
    splitContamination, sampleMixture, orderShuffle, curriculum, sampleWeighted,
    sourceCap, profile, sampleStratified, sampleDsir, qualityClassifier,
    pipeCurate, pipeTokenizePack)
}
