package graft

import graft.expressions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.functions._

/** Column-level API for the graft extension operators (SURVEY.md §2.11) —
  * the `org.apache.spark.sql.functions`-style surface of this engine.
  */
package object functions {

  private def toExpr(c: Column) = GraftBridge.expression(c)
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftBridge.column(e)

  /** Cosine similarity of two float32 embedding arrays (native codegen'd
    * Catalyst expression — see `graft.expressions.CosineSimilarity`). */
  def cosine_sim(a: Column, b: Column): Column = toCol(CosineSimilarity(toExpr(a), toExpr(b)))

  /** Float64 dot product of two float32 embedding arrays. */
  def dot_product(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))

  /** SimHash-64 fingerprint of a token array. */
  def simhash64(tokens: Column): Column = toCol(SimHash64(toExpr(tokens)))

  /** Order-sensitive rolling-hash fingerprint of a token array. */
  def fingerprint64(tokens: Column): Column = toCol(Fingerprint64(toExpr(tokens)))

  /** Stable seeded 64-bit string hash (FNV-1a + SplitMix64). */
  def stable_hash64(s: Column, seed: Long = 0L): Column = toCol(StableHash64(toExpr(s), seed))

  /** Word-n-gram shingle ids in hash space (no shingle strings built). */
  def shingleHashes(toks: Column, n: Int): Column =
    toCol(ShingleHash64(toExpr(toks), n))

  /** MinHash signature over pre-hashed shingle ids. */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    toCol(MinHashFromHashes(toExpr(hashes), k))

  /** Intersection cardinality of two pre-sorted long arrays (two-pointer
    * merge; the exact-Jaccard hot kernel). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(toExpr(a), toExpr(b)))

  /** Stable FNV-fold hash of a long array (LSH band keys; DuckDB-replicable
    * unlike Murmur3 `hash()`). */
  def fold_hash64(a: Column): Column = toCol(FoldHash64(toExpr(a)))

  /** Mean unsigned byte value of a binary payload (X4 media kernel). */
  def byte_avg(b: Column): Column = toCol(ByteAvg(toExpr(b)))

  /** Hamming distance between two 64-bit fingerprints — pure built-ins. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Mean Earth radius in meters (IUGG R1) — the constant behind the
    * geography ST_DISTANCE analog; shared with the Pinot registry entry so
    * SQL and Column paths agree bit-for-bit. */
  val EarthRadiusMeters: Double = 6371008.8

  /** Great-circle (haversine) distance in METERS between two lat/lon pairs
    * in degrees — the semantics of Pinot's ST_Distance on geography points
    * (SURVEY.md C9). Pure built-in double math (radians/sin/cos/asin/sqrt),
    * so DuckDB replicates it with the identical formula; trig libm
    * differences are ≤1 ulp and vanish under any output rounding. */
  def haversine_meters(latA: Column, lonA: Column, latB: Column, lonB: Column): Column = {
    val dLat = radians(latB.cast("double")) - radians(latA.cast("double"))
    val dLon = radians(lonB.cast("double")) - radians(lonA.cast("double"))
    val s1 = sin(dLat / 2.0)
    val s2 = sin(dLon / 2.0)
    val a = s1 * s1 +
      cos(radians(latA.cast("double"))) * cos(radians(latB.cast("double"))) * s2 * s2
    lit(2.0 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** Whitespace tokenizer (the documents fixture is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as strings, e.g. n=3 → "a b c" windows.
    * Pure Catalyst (`transform` over `sequence`) — no UDF, no explode. */
  def wordShingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), greatest(size(toks) - (n - 1), lit(0)))
    transform(idx, i => array_join(slice(toks, i, lit(n)), " "))
  }

  /** MinHash signature: k minimums over seeded remixes of one stable hash
    * per token — a single native codegen'd expression
    * (`graft.expressions.MinHashSignature`). Computed per row with zero
    * shuffle; the LSH band join afterwards is the only shuffle in the
    * near-dup pipeline. */
  def minhashSignature(toks: Column, k: Int): Column =
    toCol(MinHashSignature(toExpr(toks), k))

  /** Skew-mitigation salting for a hot-key join (SURVEY.md §2.3 J7): the
    * skewed (fact) side derives a deterministic salt in [0, n) from a unique
    * row key, widening each hot join key into n sub-keys. */
  def saltKey(joinKey: Column, uniqueKey: Column, n: Int): Column =
    struct(joinKey.as("k"), pmod(hash(uniqueKey), lit(n)).as("salt"))

  /** The dim side replicates each row across all n salts (explode) so every
    * salted fact partition finds its match. Returns (saltedKey, original row
    * columns preserved by the caller's select). */
  def explodeSalts(joinKey: Column, n: Int): Column =
    explode(transform(sequence(lit(0), lit(n - 1)),
      s => struct(joinKey.as("k"), s.as("salt"))))

  /** LSH band keys from a MinHash signature: bands of `r` rows each, hashed
    * with the stable FNV fold (so the DuckDB oracle can reproduce band keys
    * bit-exactly). Docs sharing any band key are near-dup candidates. */
  def lshBands(signature: Column, bands: Int, r: Int): Column = {
    val keys = (0 until bands).map { b =>
      struct(lit(b).as("band"), fold_hash64(slice(signature, b * r + 1, r)).as("key"))
    }
    array(keys: _*)
  }

  // ---- Pinot 1.2 string-generator family (shared builders with the SQL
  // registry — graft.expressions.StringGenerators, so Column and SQL
  // surfaces agree exactly) ----

  /** All prefixes of length 1..min(length(s), maxLen), shortest first. */
  def str_prefixes(s: Column, maxLen: Int): Column =
    toCol(StringGenerators.prefixes(toExpr(s), toExpr(lit(maxLen))))

  /** All suffixes of length 1..min(length(s), maxLen), shortest first. */
  def str_suffixes(s: Column, maxLen: Int): Column =
    toCol(StringGenerators.suffixes(toExpr(s), toExpr(lit(maxLen))))

  /** Unique character n-grams of exactly length n (first-occurrence order). */
  def unique_ngrams(s: Column, n: Int): Column =
    toCol(StringGenerators.uniqueNgrams(toExpr(s), toExpr(lit(n))))

  /** Unique character n-grams for every size in minGram..maxGram. */
  def unique_ngrams(s: Column, minGram: Int, maxGram: Int): Column =
    toCol(StringGenerators.uniqueNgrams(toExpr(s), toExpr(lit(minGram)), toExpr(lit(maxGram))))

  /** Pinot SPLITPART: literal split, empty tokens dropped, 0-based index,
    * "null" string when out of bounds. */
  def split_part_pinot(s: Column, sep: String, idx: Int): Column =
    toCol(StringGenerators.splitPart(toExpr(s), toExpr(lit(sep)), toExpr(lit(idx))))

  /** Pinot isJson: true iff the string parses as JSON. */
  def is_json(s: Column): Column = toCol(StringGenerators.isJson(toExpr(s)))

  /** Pinot isSubnetOf(ipPrefix, ipAddress): CIDR containment (IPv4 + IPv6,
    * codegen'd — graft.expressions.IsSubnetOf). */
  def is_subnet_of(prefix: Column, address: Column): Column =
    toCol(IsSubnetOf(toExpr(prefix), toExpr(address)))

  // ---- Pinot HashFunctions kernels Spark lacks (MD5/CRC32/SHA are native) ----

  /** zlib ADLER32 of the UTF-8 bytes, unsigned 32-bit in a long. */
  def adler32(s: Column): Column = toCol(Adler32(toExpr(s)))

  /** CRC-32C (Castagnoli) of the UTF-8 bytes, unsigned 32-bit in a long. */
  def crc32c(s: Column): Column = toCol(Crc32C(toExpr(s)))

  /** Kafka/Pinot murmur2 (seed 0x9747b28c) of the UTF-8 bytes, signed int —
    * Pinot's "Murmur" segment-partition function. */
  def murmur2(s: Column): Column = toCol(Murmur2(toExpr(s)))

  /** Murmur3 x86 32-bit of the UTF-8 bytes with an explicit seed. */
  def murmur3_32(s: Column, seed: Int): Column = toCol(Murmur3Bit32(toExpr(s), seed))

  // ---- Pinot MV aggregate family (per-element group state, no explode —
  // graft.expressions.MvAggs; same builders back the SQL registry) ----

  /** Exact distinct element count across the group's arrays. */
  def distinct_count_mv(arr: Column): Column = toCol(MvAggs.distinctCountMv(toExpr(arr)))

  /** Approximate distinct element count (DataSketches HLL, one sketch per
    * group — fixed state regardless of row count). */
  def distinct_count_hll_mv(arr: Column, lgK: Int = 12): Column =
    toCol(MvAggs.distinctCountHllMv(toExpr(arr), lgK))

  /** Sum of the distinct numeric elements. */
  def distinct_sum_mv(arr: Column): Column = toCol(MvAggs.distinctSumMv(toExpr(arr)))

  /** Mean of the distinct numeric elements. */
  def distinct_avg_mv(arr: Column): Column = toCol(MvAggs.distinctAvgMv(toExpr(arr)))

  /** Percentile (0-100) over all elements, SV-percentile interpolation. */
  def percentile_mv(arr: Column, p: Double): Column =
    toCol(MvAggs.percentileMv(toExpr(arr), toExpr(lit(p))))

  /** MAX(array_max) − MIN(array_min) over the group. */
  def min_max_range_mv(arr: Column): Column = toCol(MvAggs.minMaxRangeMv(toExpr(arr)))

  /** Approximate MV percentile (0-100): one KLL sketch per group updated
    * per element — fixed state regardless of rows × arity. */
  def percentile_kll_mv(arr: Column, p: Double): Column =
    toCol(MvAggs.percentileKllMv(toExpr(arr), toExpr(lit(p))))
}
