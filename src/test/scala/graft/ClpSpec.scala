package graft

import graft.expressions.{ClpDecode, ClpEncode, ClpKernels}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.unsafe.types.UTF8String

/** CLP log-column family (expressions/ClpExpressions): lossless
  * decode∘encode round-trip over fixture text and adversarial strings,
  * classification truth, and the Pinot CLPDECODE SQL spelling.
  */
class ClpSpec extends GraftSuite {

  private def enc(s: String) =
    ClpKernels.encode(UTF8String.fromString(s))

  private def roundtrip(s: String): String = {
    val r = enc(s)
    val out = ClpKernels.decode(
      r.getUTF8String(0), r.getArray(1), r.getArray(2))
    if (out == null) null else out.toString
  }

  test("planted classification: int, float, dict, literals") {
    val r = enc("user=123 paid 45.67 usd at node-7f seq 007")
    val logtype = r.getUTF8String(0).toString
    assert(logtype ===
      s"user=${ClpKernels.IntPh} paid ${ClpKernels.FloatPh} usd at " +
      s"${ClpKernels.DictPh} seq ${ClpKernels.DictPh}")
    val dict = (0 until r.getArray(1).numElements())
      .map(i => r.getArray(1).getUTF8String(i).toString)
    assert(dict === Seq("node-7f", "007")) // 007: Long.toString drops the 0s
    val encVars = (0 until r.getArray(2).numElements())
      .map(i => r.getArray(2).getLong(i))
    assert(encVars(0) === 123L)
    assert(java.lang.Double.longBitsToDouble(encVars(1)) === 45.67)
  }

  test("adversarial round-trips") {
    val cases = Seq(
      "", "   ", "=== = ==", "plain words only",
      "user=123 paid 45.67 usd at node-7f seq 007",
      "big 99999999999999999999 overflows", // > Long.MaxValue → dict
      "exp 1.5e10 notation",                // toString gives 1.5E10 → dict
      "neg -42 and -4.25 here",
      "0.1 00.5 1. .5 1.0 01",
      "tab\tand\nnewline 7 stay in tokens",
      "trailing space 3 ",
      "=leading 9=delims=5=")
    cases.foreach { s => assert(roundtrip(s) === s, s"case: '$s'") }
  }

  test("seeded fuzz: 2000 random log-ish strings round-trip exactly") {
    val rnd = new scala.util.Random(0x5EEDL)
    val alphabet = "abcXYZ0123456789 =.-_:/é中" // incl. non-ASCII
    (1 to 2000).foreach { _ =>
      val len = rnd.nextInt(40)
      val s = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(roundtrip(s) === s, s"fuzz case: '$s'")
    }
  }

  test("round-trip over the documents fixture") {
    val docs = Tables.t(spark, sfDir, "documents")
    val encCol = GraftBridge.column(
      ClpEncode(GraftBridge.expression(col("text"))))
    val bad = docs
      .withColumn("e", encCol)
      .withColumn("back", GraftBridge.column(ClpDecode(
        GraftBridge.expression(col("e.logtype")),
        GraftBridge.expression(col("e.dictionary_vars")),
        GraftBridge.expression(col("e.encoded_vars")))))
      .filter(col("back").isNull || col("back") =!= col("text"))
      .count()
    assert(bad === 0L)
  }

  test("decode returns null on inconsistent columns") {
    val r = enc("seq 42")
    // drop the encoded var → placeholder unsatisfied
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    assert(ClpKernels.decode(r.getUTF8String(0), r.getArray(1), empty) == null)
  }

  test("SQL spellings: clpdecode 3-arg and 4-arg default") {
    val s = spark.newSession()
    PinotFunctions.register(s)
    import s.implicits._
    Seq("user=9 did view at node-3x").toDF("msg")
      .createOrReplaceTempView("clp_in")
    val row = s.sql(
      """SELECT clpdecode(e.logtype, e.dictionary_vars, e.encoded_vars) AS back,
        |       clpdecode(e.logtype, e.dictionary_vars,
        |                 CAST(array() AS ARRAY<BIGINT>), 'fallback') AS def
        |FROM (SELECT clpencode(msg) AS e FROM clp_in)""".stripMargin).collect()(0)
    assert(row.getString(0) === "user=9 did view at node-3x")
    assert(row.getString(1) === "fallback")
  }
}
