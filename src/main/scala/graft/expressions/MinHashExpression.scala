package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object MinHashOps {
  /** Seed constants: SplitMix64 stream from a fixed seed (stable spec). */
  def seeds(k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var x = 0x5851f42d4c957f2dL
    var i = 0
    while (i < k) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      out(i) = z ^ (z >>> 31)
      i += 1
    }
    out
  }

  /** k-minimum signature: each token is FNV-hashed once, then k variants are
    * derived with a SplitMix64 remix of (h ^ seed_i) — one string pass per
    * token instead of k (the 64× win over per-seed rehashing). */
  def signature(tokens: ArrayData, seedArr: Array[Long]): ArrayData = {
    val k = seedArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h0 = TextOps.hash64(tokens.getUTF8String(i), 0L)
        var j = 0
        while (j < k) {
          var z = h0 ^ seedArr(j)
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^= (z >>> 31)
          if (z < mins(j)) mins(j) = z
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `shingle_hash64(tokens, n)` — word-n-gram shingle set directly in hash
  * space: each shingle's 64-bit id is a rolling combination of its tokens'
  * stable hashes. Equivalent (for set semantics, modulo 2^-64 collisions) to
  * hashing the joined shingle string, but never materializes the O(n·len)
  * shingle strings — one hash per token plus integer mixing.
  */
case class ShingleHash64(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && n <= 16, s"shingle width must be in [1,16], got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def nullSafeEval(tokens: Any): Any =
    ShingleHashOps.shingleHashes(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashOps.shingleHashes($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashOps {
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val tok = new Array[Long](len)
    var i = 0
    while (i < len) {
      tok(i) = if (tokens.isNullAt(i)) 0L else TextOps.hash64(tokens.getUTF8String(i), 0L)
      i += 1
    }
    val m = math.max(0, len - n + 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var acc = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        acc = acc * 0x100000001b3L + tok(i + j)
        j += 1
      }
      // SplitMix64 finalizer keeps band hashing well-distributed
      acc += 0x9e3779b97f4a7c15L
      acc = (acc ^ (acc >>> 30)) * 0xbf58476d1ce4e5b9L
      acc = (acc ^ (acc >>> 27)) * 0x94d049bb133111ebL
      out(i) = acc ^ (acc >>> 31)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash over pre-hashed shingle ids (see MinHashSignature for the
    * string-input form). */
  def signatureFromHashes(hashes: ArrayData, seedArr: Array[Long]): ArrayData = {
    val k = seedArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h0 = hashes.getLong(i)
      var j = 0
      while (j < k) {
        var z = h0 ^ seedArr(j)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        if (z < mins(j)) mins(j) = z
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_from_hashes(shingleIds)` — MinHash signature over pre-hashed
  * shingle ids (pairs with ShingleHash64 for a fully string-free near-dup
  * signature path). */
case class MinHashFromHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && k <= 1024, s"k must be in (0, 1024], got $k")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  @transient private lazy val seedArr: Array[Long] = MinHashOps.seeds(k)

  override def nullSafeEval(hashes: Any): Any =
    ShingleHashOps.signatureFromHashes(hashes.asInstanceOf[ArrayData], seedArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("graftMinhashSeeds", seedArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleHashOps.signatureFromHashes($c, $seedsRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `fold_hash64(longs)` — FNV-style fold over a long array + SplitMix64
  * finalizer: the stable LSH band-key hash. Unlike Spark's Murmur3 `hash()`,
  * this spec is plain 64-bit integer math, so the DuckDB correctness oracle
  * can replicate band keys exactly (see `graft.tools.DuckDbSql`). */
case class FoldHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = true))
  override def dataType: DataType = LongType
  override def prettyName: String = "fold_hash64"

  override def nullSafeEval(vals: Any): Any =
    FoldHashOps.foldHash64(vals.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.FoldHashOps.foldHash64($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object FoldHashOps {
  /** Same fold+finalizer spec as ShingleHashOps, over pre-hashed values. */
  def foldHash64(vals: ArrayData): Long = {
    val n = vals.numElements()
    var acc = 0xcbf29ce484222325L
    var i = 0
    while (i < n) {
      acc = acc * 0x100000001b3L + (if (vals.isNullAt(i)) 0L else vals.getLong(i))
      i += 1
    }
    acc += 0x9e3779b97f4a7c15L
    acc = (acc ^ (acc >>> 30)) * 0xbf58476d1ce4e5b9L
    acc = (acc ^ (acc >>> 27)) * 0x94d049bb133111ebL
    acc ^ (acc >>> 31)
  }
}

/** `minhash_signature(tokens)` — k-wide MinHash signature as a single native
  * expression (dedup extension X1). One tight loop per row inside
  * whole-stage codegen; the DataFrame-composed alternative (k `transform` +
  * `array_min` calls) allocates k arrays per row and rehashes every token k
  * times. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && k <= 1024, s"k must be in (0, 1024], got $k")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val seedArr: Array[Long] = MinHashOps.seeds(k)

  override def nullSafeEval(tokens: Any): Any =
    MinHashOps.signature(tokens.asInstanceOf[ArrayData], seedArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("graftMinhashSeeds", seedArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashOps.signature($c, $seedsRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
