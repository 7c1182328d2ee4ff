package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stable 64-bit hashing + SimHash kernels. Self-contained spec (FNV-1a fold
  * + SplitMix64 finalizer) so fingerprints are reproducible independent of
  * Spark version internals.
  */
object TextOps {
  /** FNV-1a 64 over UTF-8 bytes, finalized with SplitMix64. */
  def hash64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // SplitMix64 finalizer for avalanche
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** 64-bit SimHash over a token array: per-bit majority vote of token
    * hashes. Near-duplicate docs land within small Hamming distance. */
  def simhash64(tokens: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i), 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Polynomial rolling hash over the token sequence (order-sensitive
    * document fingerprint, unlike SimHash which is bag-of-words). */
  def rollingFingerprint(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var acc = 0xcbf29ce484222325L
    var i = 0
    while (i < n) {
      val h = if (tokens.isNullAt(i)) 0L else hash64(tokens.getUTF8String(i), 1L)
      acc = acc * 31L + h
      i += 1
    }
    acc
  }
}

/** `simhash64(tokens)` — SimHash fingerprint of a tokenized document
  * (dedup extension X1, SURVEY.md §2.11). Hamming distance between two
  * fingerprints is then just `bit_count(a ^ b)` with Spark built-ins. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(tokens: Any): Any =
    TextOps.simhash64(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextOps.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `fingerprint64(tokens)` — order-sensitive rolling-hash fingerprint. */
case class Fingerprint64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = true))
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override def nullSafeEval(tokens: Any): Any =
    TextOps.rollingFingerprint(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextOps.rollingFingerprint($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `hash64(str, seed)` — the stable scalar hash, exposed so MinHash seeds
  * derive from the same spec as SimHash. */
case class StableHash64(child: Expression, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "stable_hash64"

  override def nullSafeEval(s: Any): Any =
    TextOps.hash64(s.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextOps.hash64($c, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
