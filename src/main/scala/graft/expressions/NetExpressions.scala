package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IP-address kernels for the Pinot InetAddressFunctions surface
  * (`isSubnetOf(ipPrefix, ipAddress)` — part of the deployed Pinot 1.2.0
  * vocabulary, version pinned at
  * `/root/reference/resources/pinot/userData/userdata-pinotserver.sh:5`).
  *
  * The address parser is self-contained (strict dotted-quad IPv4; RFC-4291
  * IPv6 with one `::` elision and an optional embedded IPv4 tail) — no
  * `InetAddress.getByName`, which would fall back to a DNS lookup on
  * malformed literals. Malformed input throws `IllegalArgumentException`
  * like Pinot's implementation; mixed address families too.
  */
object NetOps {

  private def fail(s: String): Nothing =
    throw new IllegalArgumentException(s"invalid IP address literal: '$s'")

  /** Strict dotted-quad: exactly four decimal octets 0-255. */
  private def parseV4(s: String): Array[Byte] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) fail(s)
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3) fail(s)
      var v = 0
      var j = 0
      while (j < p.length) {
        val c = p.charAt(j)
        if (c < '0' || c > '9') fail(s)
        v = v * 10 + (c - '0')
        j += 1
      }
      if (v > 255) fail(s)
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** RFC-4291 textual IPv6: 16-bit hex groups, at most one `::`, optional
    * embedded IPv4 in the final group. */
  private def parseV6(s: String): Array[Byte] = {
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) fail(s)
    def groupBytes(part: String): Array[Byte] =
      if (part.isEmpty) Array.emptyByteArray
      else part.split(":", -1).flatMap { g =>
        if (g.indexOf('.') >= 0) parseV4(g)
        else {
          if (g.isEmpty || g.length > 4) fail(s)
          var v = 0
          var j = 0
          while (j < g.length) {
            val d = Character.digit(g.charAt(j), 16)
            if (d < 0) fail(s)
            v = (v << 4) | d
            j += 1
          }
          Array[Byte]((v >> 8).toByte, v.toByte)
        }
      }
    val (lb, rb) =
      if (dc >= 0) (groupBytes(s.substring(0, dc)), groupBytes(s.substring(dc + 2)))
      else (groupBytes(s), Array.emptyByteArray)
    val have = lb.length + rb.length
    if (dc < 0 && have != 16) fail(s)
    if (have > 16 || (dc >= 0 && have == 16)) fail(s)
    val out = new Array[Byte](16)
    System.arraycopy(lb, 0, out, 0, lb.length)
    System.arraycopy(rb, 0, out, 16 - rb.length, rb.length)
    out
  }

  /** 4 bytes for IPv4 literals, 16 for IPv6. */
  def parse(s: String): Array[Byte] =
    if (s.indexOf(':') >= 0) parseV6(s) else parseV4(s)

  /** Pinot ISSUBNETOF(ipPrefix, ipAddress): CIDR containment — the first
    * prefix-length bits of the address equal the prefix's network bits
    * (host bits in the given prefix are ignored, standard CIDR semantics). */
  def isSubnetOf(prefix: UTF8String, address: UTF8String): Boolean = {
    val ps = prefix.toString
    val slash = ps.lastIndexOf('/')
    if (slash < 0) throw new IllegalArgumentException(
      s"invalid IP prefix (expected address/length): '$ps'")
    val net = parse(ps.substring(0, slash))
    val lenStr = ps.substring(slash + 1)
    if (lenStr.isEmpty || !lenStr.forall(c => c >= '0' && c <= '9'))
      throw new IllegalArgumentException(s"invalid prefix length: '$ps'")
    val bits = lenStr.toInt
    if (bits > net.length * 8) throw new IllegalArgumentException(
      s"prefix length ${bits} out of range for ${net.length * 8}-bit address: '$ps'")
    val addr = parse(address.toString)
    if (addr.length != net.length) throw new IllegalArgumentException(
      s"IP version mismatch between prefix '$ps' and address '$address'")
    val full = bits / 8
    var i = 0
    while (i < full) {
      if (net(i) != addr(i)) return false
      i += 1
    }
    val rem = bits % 8
    if (rem == 0) true
    else {
      val mask = (0xff << (8 - rem)) & 0xff
      (net(full) & mask) == (addr(full) & mask)
    }
  }
}

/** `is_subnet_of(prefix, address)` — codegen'd CIDR containment test. */
case class IsSubnetOf(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_subnet_of"

  override def nullSafeEval(prefix: Any, address: Any): Any =
    NetOps.isSubnetOf(prefix.asInstanceOf[UTF8String], address.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, a) => s"graft.expressions.NetOps.isSubnetOf($p, $a)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
