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
