package graft.tools

import graft.expressions.MinHashOps

/** DuckDB SQL fragment generators that replicate the engine's stable hash
  * family (`graft.expressions.TextOps.hash64`: FNV-1a 64 over bytes +
  * SplitMix64 finalizer, and the MinHash seed remix) bit-exactly in plain
  * SQL. This is what lets the driver's DuckDB oracle hard-check the
  * fingerprint / MinHash / LSH-band query family instead of rows-only.
  *
  * Implementation notes (each verified against the Scala kernels):
  *  - 64-bit wrap multiply can't use HUGEINT directly (2^64 × 2^64 overflows
  *    signed int128), so it decomposes into 32-bit limbs.
  *  - DuckDB `<<` is signed (overflows at bit 63); shifted limbs multiply by
  *    2^32 instead.
  *  - `list_transform([e], v -> body)[1]` is the single-evaluation "let"
  *    binding that keeps generated SQL from exploding exponentially.
  *  - ASCII-only: `ascii(s[i])` equals the UTF-8 byte only for 7-bit text;
  *    the documents fixture is pure ASCII (asserted in DuckDbSqlSpec).
  */
object DuckDbSql {
  private val Mod = "18446744073709551616" // 2^64

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  private def sym(p: String) = p + counter.incrementAndGet()

  /** Single-evaluation binding: `let(e)(v => body)` evaluates `e` once. */
  private def let(e: String)(body: String => String): String = {
    val v = sym("v")
    s"(list_transform([$e], $v -> ${body(v)})[1])"
  }

  /** Unsigned 64-bit literal. */
  def u(n: Long): String = s"CAST(${java.lang.Long.toUnsignedString(n)} AS UBIGINT)"

  /** (a * b) mod 2^64 via 32-bit limbs, all operands UBIGINT. */
  def wmul(a: String, b: String): String = let(a) { wa =>
    let(b) { wb =>
      val al = s"($wa & 4294967295)"
      val ah = s"($wa >> 32)"
      val bl = s"($wb & 4294967295)"
      val bh = s"($wb >> 32)"
      val cross = s"((($al*$bh & 4294967295) + ($ah*$bl & 4294967295)) & 4294967295)"
      s"CAST((CAST($al*$bl AS HUGEINT) + CAST($cross * CAST(4294967296 AS UBIGINT) AS HUGEINT)) % $Mod AS UBIGINT)"
    }
  }

  /** (a + b) mod 2^64, operands UBIGINT. */
  def wadd(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % $Mod AS UBIGINT)"

  /** SplitMix64 3-step avalanche (the shared tail of hash64 and the MinHash
    * seed remix — `MinHashOps.signature` / `TextOps.hash64`). */
  def mix(e: String): String = let(e) { a =>
    let(wmul(s"xor($a, $a >> 30)", u(0xbf58476d1ce4e5b9L))) { b =>
      let(wmul(s"xor($b, $b >> 27)", u(0x94d049bb133111ebL))) { c =>
        s"xor($c, $c >> 31)"
      }
    }
  }

  /** FNV-1a 64 fold over the ASCII bytes of `strExpr`, seeded. */
  private def fnv(strExpr: String, seed: Long): String = {
    val h0 = u(0xcbf29ce484222325L ^ seed)
    val i = sym("i")
    val fh = sym("h")
    val fb = sym("b")
    val bytes =
      s"list_transform(range(1, length($strExpr)+1), $i -> CAST(ascii(($strExpr)[$i]) AS UBIGINT))"
    s"list_reduce([$h0] || $bytes, ($fh, $fb) -> ${wmul(s"xor($fh, $fb)", "1099511628211")})"
  }

  /** `stable_hash64(strExpr, seed)` as UBIGINT. */
  def hash64U(strExpr: String, seed: Long = 0L): String =
    mix(wadd(fnv(strExpr, seed), u(0x9e3779b97f4a7c15L)))

  /** Reinterpret UBIGINT bits as signed BIGINT (Spark LongType). */
  def toSigned(e: String): String = let(e) { t =>
    s"CAST(CAST($t AS HUGEINT) - (CASE WHEN $t >= CAST(9223372036854775808 AS UBIGINT) THEN CAST($Mod AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS BIGINT)"
  }

  /** Reinterpret signed BIGINT bits as UBIGINT. */
  def toUnsigned(e: String): String = let(e) { t =>
    s"CAST(CAST($t AS HUGEINT) + (CASE WHEN $t < 0 THEN CAST($Mod AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS UBIGINT)"
  }

  /** `stable_hash64(strExpr, seed)` as signed BIGINT (= Spark output). */
  def hash64(strExpr: String, seed: Long = 0L): String = toSigned(hash64U(strExpr, seed))

  /** MinHash per-seed remix (`ShingleHashOps.signatureFromHashes` inner
    * step): SplitMix64 mix of (h ^ seed); both operands UBIGINT. */
  def remixU(hU: String, seedU: String): String = mix(s"xor($hU, $seedU)")

  /** The first k MinHash seeds as a VALUES table `(band BIGINT, seed
    * UBIGINT)` — identical constants to the native expression's
    * `MinHashOps.seeds(k)`. */
  def seedsValues(k: Int): String =
    MinHashOps.seeds(k).zipWithIndex
      .map { case (s, i) => s"($i, ${u(s)})" }
      .mkString("(VALUES ", ", ", ")")

  /** Powers of two as a VALUES table `(bit BIGINT, pw UBIGINT)` — for
    * rebuilding a 64-bit word from per-bit aggregates (SimHash oracle). */
  def bitValues64: String =
    (0 until 64).map(b => s"($b, ${u(1L << b)})").mkString("(VALUES ", ", ", ")")

  /** FNV fold over a pre-hashed UBIGINT value pair/list accumulated as
    * `acc = acc*prime + v` then finalized — `FoldHashOps.foldHash64` /
    * `ShingleHashOps` shingle fold, as a list_reduce over `listExpr`
    * (elements must be UBIGINT). */
  def foldHash64U(listExpr: String): String = {
    val fh = sym("h")
    val fb = sym("b")
    val step = wadd(wmul(fh, u(0x100000001b3L)), fb)
    mix(wadd(
      s"list_reduce([${u(0xcbf29ce484222325L)}] || $listExpr, ($fh, $fb) -> $step)",
      u(0x9e3779b97f4a7c15L)))
  }

  /** Spark `round(x, scale)` on a DOUBLE, replicated exactly. Spark rounds
    * HALF_UP over `BigDecimal.valueOf(x)` — i.e. over the SHORTEST decimal
    * representation (`Double.toString`): probe-verified both ways at
    * sf0.001 — raw 95471.295 (exact binary ...94999…) rounds to .30, raw
    * 52724.244999999995 (shortest repr needs all 17 digits) rounds to .24.
    * DuckDB's own `round(DOUBLE, n)` disagrees on such boundaries, but
    * `CAST(DOUBLE AS VARCHAR)` produces exactly the shortest round-trip
    * repr, and DECIMAL rounding is HALF_UP — so round the VARCHAR-cast
    * value. Interpolated percentiles are structurally boundary-prone
    * (fractions of .5 on 2-decimal prices), hence the dedicated replica. */
  def sparkRound(expr: String, scale: Int): String =
    s"CAST(round(CAST(CAST(CAST($expr AS DOUBLE) AS VARCHAR) AS DECIMAL(38, 17)), $scale) AS DOUBLE)"

  /** Spark `percentile(col, q)` (exact interpolated) replicated term for
    * term — aggregate-context expression. DuckDB's `quantile_cont` computes
    * the same mathematical interpolation with a different association
    * (`v[lo] + (v[hi]−v[lo])·frac` vs Spark Percentile's
    * `(hi−pos)·v[lo] + (pos−lo)·v[hi]`), which can differ by 1 ulp — and a
    * 1-ulp difference under [[sparkRound]]'s exact-expansion rounding (or a
    * boundary under any rounding) flips the output. Combine with
    * [[sparkRound]] for bit-exact rounded percentiles. */
  def sparkPercentile(col: String, q: String): String = {
    val vs = sym("vs")
    // q must be a DOUBLE: a bare 0.9 literal is DECIMAL in DuckDB, making
    // the position arithmetic exact where Spark's is binary (0.9*1961 =
    // 1764.9 exactly vs 1764.9000000000001 in float64 — an ulp that moves
    // the interpolation fraction)
    val pos = s"(CAST($q AS DOUBLE) * CAST(len($vs) - 1 AS DOUBLE))"
    val lo = s"floor($pos)"
    val hi = s"ceil($pos)"
    val vLo = s"$vs[CAST($lo AS BIGINT) + 1]"
    val vHi = s"$vs[CAST($hi AS BIGINT) + 1]"
    val inner =
      s"CASE WHEN len($vs) = 0 THEN NULL " +
        s"WHEN $lo = $hi THEN $vLo " +
        s"ELSE ($hi - $pos) * $vLo + ($pos - $lo) * $vHi END"
    s"(list_transform([list(CAST($col AS DOUBLE) ORDER BY $col) FILTER (WHERE $col IS NOT NULL)], $vs -> $inner)[1])"
  }

  /** zlib ADLER32 over the ASCII bytes of `strExpr` (closed form: the two
    * running sums are mod-65521 ring sums, so one final mod each matches the
    * kernel's progressive reduction — `HashOps.adler32`). BIGINT result. */
  def adler32(strExpr: String): String = let(strExpr) { s =>
    let(s"length($s)") { n =>
      val j = sym("j")
      // list_sum widens to HUGEINT — pull each sum back to BIGINT so the
      // result column stays int64 (the driver hashes raw dtypes)
      val sumA = s"CAST(coalesce(list_sum(list_transform(range(1, $n+1), $j -> ascii($s[$j]))), 0) AS BIGINT)"
      val sumB = s"CAST(coalesce(list_sum(list_transform(range(1, $n+1), $j -> ($n - $j + 1) * ascii($s[$j]))), 0) AS BIGINT)"
      s"((($n + $sumB) % 65521) * 65536 + ((1 + $sumA) % 65521))"
    }
  }

  /** Kafka/Pinot MurmurHash2 (seed 0x9747b28c) over the ASCII bytes of
    * `strExpr`, as the signed INT Spark's `Murmur2` kernel returns. All
    * arithmetic is unsigned-32 emulated in BIGINT (`& 4294967295` after
    * every wrap multiply); the three tail xors target disjoint bit ranges,
    * so they collapse into one additive constant. */
  def murmur2(strExpr: String): String = let(strExpr) { s =>
    let(s"length($s)") { n =>
      val m = "1540483477"
      val mask = "4294967295"
      val c = sym("c")
      def byt(pos: String) = s"ascii($s[$pos])"
      val chunks =
        s"list_transform(range(0, $n // 4), $c -> " +
          s"${byt(s"4*$c+1")} + 256*${byt(s"4*$c+2")} + 65536*${byt(s"4*$c+3")} + 16777216*${byt(s"4*$c+4")})"
      val fh = sym("h")
      val fk = sym("k")
      val step = let(s"($fk * $m) & $mask") { k1 =>
        let(s"xor($k1, $k1 >> 24)") { k2 =>
          s"xor(($fh * $m) & $mask, ($k2 * $m) & $mask)"
        }
      }
      val folded = s"list_reduce([xor(2538058380, $n)] || $chunks, ($fh, $fk) -> $step)"
      val tail = let(s"4 * ($n // 4)") { base =>
        s"CASE ($n % 4) WHEN 3 THEN ${byt(s"$base+1")} + 256*${byt(s"$base+2")} + 65536*${byt(s"$base+3")} " +
          s"WHEN 2 THEN ${byt(s"$base+1")} + 256*${byt(s"$base+2")} " +
          s"WHEN 1 THEN ${byt(s"$base+1")} ELSE 0 END"
      }
      val mixed = let(folded) { h =>
        s"CASE WHEN ($n % 4) = 0 THEN $h ELSE (xor($h, $tail) * $m) & $mask END"
      }
      let(mixed) { h =>
        let(s"xor($h, $h >> 13)") { f1 =>
          let(s"($f1 * $m) & $mask") { f2 =>
            s"CAST(list_transform([xor($f2, $f2 >> 15)], x -> CASE WHEN x >= 2147483648 THEN x - 4294967296 ELSE x END)[1] AS INT)"
          }
        }
      }
    }
  }
}
