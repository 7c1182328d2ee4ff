package graft

import org.apache.spark.sql.functions._

/** Scalar families with no DuckDB twin (COVERAGE.md C7/C8/C6): sha1/crc32,
  * URL functions, and MapType access — verified against JVM/RFC reference
  * values instead of the oracle. */
class ScalarExtrasSpec extends GraftSuite {
  import spark.implicits._

  test("C7: sha1 and crc32 match reference values") {
    val r = Seq("abc").toDF("s")
      .select(sha1($"s").as("sha1"), crc32($"s").as("crc"))
      .collect().head
    // reference values: sha1("abc") per FIPS 180-1, crc32("abc") per zlib
    assert(r.getString(0) === "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getLong(1) === 891568578L)
  }

  test("C8: parse_url extracts host/path/query; url_encode round-trips") {
    val url = "https://example.com/products/view?id=42&color=red"
    val r = Seq(url).toDF("u").select(
      parse_url($"u", lit("HOST")).as("host"),
      parse_url($"u", lit("PATH")).as("path"),
      parse_url($"u", lit("QUERY")).as("query"),
      parse_url($"u", lit("QUERY"), lit("id")).as("id"),
      url_decode(url_encode(lit("a b&c=d"))).as("roundtrip"))
      .collect().head
    assert(r.getString(0) === "example.com")
    assert(r.getString(1) === "/products/view")
    assert(r.getString(2) === "id=42&color=red")
    assert(r.getString(3) === "42")
    assert(r.getString(4) === "a b&c=d")
  }

  test("C6: MAP_VALUE ≡ element_at on MapType (and missing key is null)") {
    val df = Seq(1).toDF("x").select(
      map(lit("color"), lit("red"), lit("size"), lit("XL")).as("m"))
    val r = df.select(
      element_at($"m", "color").as("hit"),
      element_at($"m", "absent").as("miss"),
      map_keys($"m").as("keys")).collect().head
    assert(r.getString(0) === "red")
    assert(r.isNullAt(1))
    assert(r.getSeq[String](2).sorted === Seq("color", "size"))
  }
}
