package graft

import graft.expressions.NetOps
import org.apache.spark.unsafe.types.UTF8String

/** Pinot ISSUBNETOF semantics: IPv4 + IPv6 CIDR containment, strict literal
  * parsing (malformed input throws, like Pinot's InetAddressFunctions —
  * never a DNS fallback), and the SQL-vocabulary registration. */
class NetFunctionsSpec extends GraftSuite {

  private def sub(prefix: String, ip: String): Boolean =
    NetOps.isSubnetOf(UTF8String.fromString(prefix), UTF8String.fromString(ip))

  test("IPv4 containment across byte-aligned and mid-byte prefix lengths") {
    assert(sub("192.168.0.0/16", "192.168.255.7"))
    assert(!sub("192.168.0.0/16", "192.169.0.0"))
    assert(sub("10.64.0.0/10", "10.127.255.255")) // /10 spans 10.64-10.127
    assert(!sub("10.64.0.0/10", "10.128.0.0"))
    assert(sub("1.2.3.4/32", "1.2.3.4") && !sub("1.2.3.4/32", "1.2.3.5"))
    assert(sub("0.0.0.0/0", "255.255.255.255")) // /0 contains everything
    // host bits in the prefix are ignored (standard CIDR semantics)
    assert(sub("10.1.2.3/24", "10.1.2.200"))
  }

  test("IPv6 containment incl. :: elision and embedded IPv4 tail") {
    assert(sub("2001:db8::/32", "2001:db8:1:2:3:4:5:6"))
    assert(!sub("2001:db8::/32", "2001:db9::1"))
    assert(sub("::/0", "fe80::1"))
    assert(sub("::ffff:0:0/96", "::ffff:192.168.1.1")) // v4-mapped range
    assert(sub("2001:db8::/128", "2001:db8:0:0:0:0:0:0"))
    // mid-byte v6 prefix: /34 → third group's top 2 bits must match
    assert(sub("2001:db8:4000::/34", "2001:db8:7fff::1"))
    assert(!sub("2001:db8:4000::/34", "2001:db8:8000::1"))
  }

  test("malformed literals and family mismatch throw (no DNS fallback)") {
    for (bad <- Seq(
        () => sub("10.0.0.0", "10.0.0.1"),          // missing /len
        () => sub("10.0.0.0/33", "10.0.0.1"),       // len out of range for v4
        () => sub("10.0.0.0/8", "10.0.0.256"),      // octet overflow
        () => sub("10.0.0.0/8", "10.0.0"),          // 3 octets
        () => sub("10.0.0.0/8", "2001:db8::1"),     // family mismatch
        () => sub("2001:db8::/32", "10.1.2.3"),     // family mismatch
        () => sub("2001:db8::/32", "1::2::3"),      // two '::'
        () => sub("10.0.0.0/8", "localhost")))      // hostname, not a literal
      intercept[IllegalArgumentException](bad())
  }

  test("parser agrees with java.net.InetAddress on random valid literals") {
    // literal forms only — InetAddress.getByName does no DNS for them
    val rnd = new scala.util.Random(42)
    val v4s = (0 until 200).map(_ =>
      Seq.fill(4)(rnd.nextInt(256)).mkString("."))
    val v6s = (0 until 200).map { _ =>
      val groups = Seq.fill(8)(rnd.nextInt(0x10000))
      val full = groups.map(g => f"$g%x").mkString(":")
      // half the cases: elide one random run of groups with ::
      if (rnd.nextBoolean()) full
      else {
        val start = rnd.nextInt(7)
        val len = 1 + rnd.nextInt(7 - start)
        val left = groups.take(start).map(g => f"$g%x").mkString(":")
        val right = groups.drop(start + len).map(g => f"$g%x").mkString(":")
        s"$left::$right"
      }
    }
    for (s <- v4s ++ v6s) {
      val expect = java.net.InetAddress.getByName(s).getAddress
      assert(java.util.Arrays.equals(NetOps.parse(s), expect), s"parse($s)")
    }
  }

  test("ISSUBNETOF resolves through the Pinot SQL vocabulary") {
    val pinot = spark.newSession()
    PinotFunctions.register(pinot)
    val r = pinot.sql(
      """SELECT ISSUBNETOF('10.0.0.0/8', '10.20.30.40') AS yes,
        |       ISSUBNETOF('10.0.0.0/8', '11.0.0.1') AS no""".stripMargin).collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
