package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Checksum / non-cryptographic hash kernels for the Pinot HashFunctions
  * surface (part of the deployed Pinot 1.2.0 vocabulary, pinned at
  * `/root/reference/resources/pinot/userData/userdata-pinotserver.sh:5`)
  * that Spark has no built-in for: ADLER32, CRC32C, MURMURHASH2 (the
  * Kafka-partitioner murmur2 with seed 0x9747b28c — also Pinot's "Murmur"
  * stream-partition function), MURMURHASH3BIT32. MD5/CRC32/SHA/SHA2 need no
  * kernel — Spark's natives share Pinot's semantics.
  *
  * All kernels consume the UTF-8 bytes of a string column. Pure integer
  * JVM code (wrap arithmetic is fine here — only SQL-level expressions are
  * ANSI-checked), one allocation-free pass per value.
  */
object HashOps {

  /** zlib ADLER32 as an unsigned 32-bit value in a long. */
  def adler32(s: UTF8String): Long = {
    val bytes = s.getBytes
    var a = 1L
    var b = 0L
    var i = 0
    while (i < bytes.length) {
      a += (bytes(i) & 0xffL)
      if (a >= 65521L) a -= 65521L
      b += a
      if (b >= 65521L) b -= 65521L
      i += 1
    }
    (b << 16) | a
  }

  private val Crc32cTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82f63b78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  /** CRC-32C (Castagnoli, reflected 0x1EDC6F41) as unsigned 32 in a long. */
  def crc32c(s: UTF8String): Long = {
    val bytes = s.getBytes
    var crc = 0xffffffff
    var i = 0
    while (i < bytes.length) {
      crc = Crc32cTable((crc ^ bytes(i)) & 0xff) ^ (crc >>> 8)
      i += 1
    }
    (~crc).toLong & 0xffffffffL
  }

  /** MurmurHash2 32-bit, seed 0x9747b28c — the Kafka default-partitioner
    * hash and Pinot's "Murmur" segment-partition function. Returns the
    * signed int like Pinot's murmurHash2(String). */
  def murmur2(s: UTF8String): Int = {
    val data = s.getBytes
    val len = data.length
    val m = 0x5bd1e995
    val r = 24
    var h = 0x9747b28c ^ len
    val n4 = len & ~3
    var i = 0
    while (i < n4) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | (data(i + 3) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 4
    }
    (len & 3) match {
      case 3 =>
        h ^= (data(n4 + 2) & 0xff) << 16
        h ^= (data(n4 + 1) & 0xff) << 8
        h ^= data(n4) & 0xff
        h *= m
      case 2 =>
        h ^= (data(n4 + 1) & 0xff) << 8
        h ^= data(n4) & 0xff
        h *= m
      case 1 =>
        h ^= data(n4) & 0xff
        h *= m
      case _ => ()
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** MurmurHash3 x86 32-bit with a caller seed (Pinot murmurHash3Bit32). */
  def murmur3_32(s: UTF8String, seed: Int): Int = {
    val data = s.getBytes
    val len = data.length
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val n4 = len & ~3
    var i = 0
    while (i < n4) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | (data(i + 3) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (len & 3) match {
      case 3 =>
        k ^= (data(n4 + 2) & 0xff) << 16
        k ^= (data(n4 + 1) & 0xff) << 8
        k ^= data(n4) & 0xff
      case 2 =>
        k ^= (data(n4 + 1) & 0xff) << 8
        k ^= data(n4) & 0xff
      case 1 =>
        k ^= data(n4) & 0xff
      case _ => ()
    }
    if ((len & 3) != 0) {
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
    }
    h ^= len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }
}

/** `adler32(str)` — unsigned 32-bit zlib checksum as LongType. */
case class Adler32(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "adler32"
  override def nullSafeEval(s: Any): Any = HashOps.adler32(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.adler32($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `crc32c(str)` — unsigned CRC-32C (Castagnoli) as LongType. */
case class Crc32C(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "crc32c"
  override def nullSafeEval(s: Any): Any = HashOps.crc32c(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.crc32c($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `murmur2(str)` — signed 32-bit Kafka/Pinot murmur2. */
case class Murmur2(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "murmur2"
  override def nullSafeEval(s: Any): Any = HashOps.murmur2(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.murmur2($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `murmur3_32(str, seed)` — signed 32-bit murmur3 (x86) with seed. */
case class Murmur3Bit32(child: Expression, seed: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "murmur3_32"
  override def nullSafeEval(s: Any): Any =
    HashOps.murmur3_32(s.asInstanceOf[UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.murmur3_32($c, $seed)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
