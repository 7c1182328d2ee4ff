package graft.expressions

import java.util.Base64

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pinot IdSet codec (`ID_SET` / `IN_ID_SET` `[P1.2]` — the cross-query
  * membership primitive Pinot grew because its v1 engine lacks joins: query 1
  * returns a serialized id set, query 2 passes it back as a filter literal).
  * Format: Base64( zigzag-varint(first) ++ varint(deltas) ) over the sorted
  * distinct ids — ~1-2 bytes per id for dense populations vs 8 raw, and
  * deserialization yields a sorted array so membership is a binary search.
  * (Pinot's own format switches to Roaring/Bloom over thresholds; this engine
  * keeps the exact form — the string is a client-visible VALUE, so fidelity
  * beats opacity — and membership at scale is a broadcast of the decoded
  * array, never a shuffle.)
  */
object IdSetCodec {

  def serialize(sorted: Array[Long]): String = {
    val out = new java.io.ByteArrayOutputStream(sorted.length * 2 + 16)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    if (sorted.nonEmpty) {
      val first = sorted(0)
      varint((first << 1) ^ (first >> 63)) // zigzag: first id may be negative
      var i = 1
      while (i < sorted.length) { varint(sorted(i) - sorted(i - 1)); i += 1 }
    }
    Base64.getEncoder.encodeToString(out.toByteArray)
  }

  def deserialize(s: String): Array[Long] = {
    val bytes = Base64.getDecoder.decode(s)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    def varint(): Long = {
      var v = 0L; var shift = 0
      while ({ val b = bytes(pos); pos += 1; v |= (b & 0x7fL) << shift; shift += 7; (b & 0x80) != 0 }) ()
      v
    }
    if (bytes.nonEmpty) {
      val z = varint()
      var prev = (z >>> 1) ^ -(z & 1) // un-zigzag
      buf += prev
      while (pos < bytes.length) { prev += varint(); buf += prev }
    }
    buf.toArray
  }

  /** Serialize any long ArrayData (sorted or not; nulls skipped). */
  def serializeArray(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val buf = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) { if (!a.isNullAt(i)) { buf(m) = a.getLong(i); m += 1 }; i += 1 }
    val ids = java.util.Arrays.copyOf(buf, m)
    java.util.Arrays.sort(ids)
    // dedupe in place (collect_set already dedupes; cheap safety for raw arrays)
    var w = 0
    i = 0
    while (i < ids.length) {
      if (w == 0 || ids(i) != ids(w - 1)) { ids(w) = ids(i); w += 1 }
      i += 1
    }
    UTF8String.fromString(serialize(java.util.Arrays.copyOf(ids, w)))
  }

  def contains(ids: Array[Long], v: Long): Boolean =
    java.util.Arrays.binarySearch(ids, v) >= 0
}

/** `id_set_serialize(array<long>)` → the Base64 IdSet string. */
case class IdSetSerialize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType, containsNull = true))
  override def dataType: DataType = StringType
  override def prettyName: String = "id_set_serialize"

  override def nullSafeEval(a: Any): Any =
    IdSetCodec.serializeArray(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.IdSetCodec.serializeArray($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `in_id_set(id, 'base64')` — membership of `id` in a serialized IdSet.
  * The set literal is decoded ONCE (foldable right side) into a sorted
  * long[] that ships with the serialized plan; per row it is a binary
  * search, in both interpreted and codegen paths. */
case class InIdSet(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  require(right.foldable, "IN_ID_SET set argument must be a literal")

  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_id_set"

  @transient private lazy val ids: Array[Long] = {
    val s = right.eval(null)
    require(s != null, "IN_ID_SET set argument must not be null")
    IdSetCodec.deserialize(s.toString)
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    IdSetCodec.contains(ids, l.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("idset", ids, "long[]")
    nullSafeCodeGen(ctx, ev, (l, _) =>
      s"${ev.value} = java.util.Arrays.binarySearch($idsRef, $l) >= 0;")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
