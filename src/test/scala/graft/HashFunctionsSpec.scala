package graft

import graft.expressions.HashOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pinot HashFunctions kernels (ADLER32 / CRC32C / MURMURHASH2 /
  * MURMURHASH3BIT32) checked three ways: published test vectors,
  * independent JVM reference implementations (java.util.zip, commons-codec,
  * Guava — all unrelated code paths), and a seeded random sweep including
  * every tail length. */
class HashFunctionsSpec extends GraftSuite {

  private def u8(s: String) = UTF8String.fromString(s)

  test("ADLER32 matches java.util.zip.Adler32 and the RFC vector") {
    assert(HashOps.adler32(u8("Wikipedia")) === 300286872L)
    assert(HashOps.adler32(u8("")) === 1L)
    val ref = Seq("key agg row", "a", "abc", "x" * 5000)
    for (s <- ref) {
      val z = new java.util.zip.Adler32
      val bytes = s.getBytes("UTF-8")
      z.update(bytes, 0, bytes.length)
      assert(HashOps.adler32(u8(s)) === z.getValue, s"adler32($s)")
    }
  }

  test("CRC32C matches java.util.zip.CRC32C and the RFC 3720 vector") {
    assert(HashOps.crc32c(u8("123456789")) === 0xe3069283L)
    assert(HashOps.crc32c(u8("")) === 0L)
    for (s <- Seq("key agg row", "a", "spark", "x" * 1000)) {
      val z = new java.util.zip.CRC32C
      val bytes = s.getBytes("UTF-8")
      z.update(bytes, 0, bytes.length)
      assert(HashOps.crc32c(u8(s)) === z.getValue, s"crc32c($s)")
    }
  }

  test("MURMURHASH2 matches commons-codec MurmurHash2 (Kafka seed) on all tail lengths") {
    val gen = Gen.asciiPrintableStr
    var seed = Seed(42L)
    for (_ <- 0 until 200) {
      val s = gen.apply(Gen.Parameters.default, seed).getOrElse("")
      seed = seed.next
      val bytes = s.getBytes("UTF-8")
      val expect = org.apache.commons.codec.digest.MurmurHash2.hash32(bytes, bytes.length)
      assert(HashOps.murmur2(u8(s)) === expect, s"murmur2(${s.take(30)})")
    }
    // fixed lengths 0..7 cover every chunk/tail combination explicitly
    for (n <- 0 to 7) {
      val s = "abcdefgh".take(n)
      val bytes = s.getBytes("UTF-8")
      assert(HashOps.murmur2(u8(s)) ===
        org.apache.commons.codec.digest.MurmurHash2.hash32(bytes, bytes.length))
    }
  }

  test("MURMURHASH3BIT32 matches Guava murmur3_32_fixed and the canonical empty-string vectors") {
    assert(HashOps.murmur3_32(u8(""), 0) === 0)
    assert(HashOps.murmur3_32(u8(""), 1) === 0x514e28b7)
    assert(HashOps.murmur3_32(u8(""), 0xffffffff) === 0x81f16f39)
    for (s <- Seq("test", "Hello, world!", "key agg row scan", "a", "ab", "abc");
         sd <- Seq(0, 0x9747b28c, 42)) {
      val expect = com.google.common.hash.Hashing.murmur3_32_fixed(sd)
        .hashBytes(s.getBytes("UTF-8")).asInt()
      assert(HashOps.murmur3_32(u8(s), sd) === expect, s"murmur3($s, $sd)")
    }
  }

  test("SQL vocabulary: ADLER32 / CRC32C / MURMURHASH2 / MURMURHASH3BIT32 / SHA224 resolve") {
    val pinot = spark.newSession()
    PinotFunctions.register(pinot)
    val r = pinot.sql(
      """SELECT ADLER32('Wikipedia') AS a, CRC32C('123456789') AS c,
        |       MURMURHASH2('foobar') AS m2, MURMURHASH3BIT32('', 1) AS m3,
        |       SHA224('abc') AS s224""".stripMargin).collect().head
    assert(r.getLong(0) === 300286872L)
    assert(r.getLong(1) === 0xe3069283L)
    val fb = "foobar".getBytes("UTF-8")
    assert(r.getInt(2) === org.apache.commons.codec.digest.MurmurHash2.hash32(fb, fb.length))
    assert(r.getInt(3) === 0x514e28b7)
    assert(r.getString(4) === "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
  }
}
