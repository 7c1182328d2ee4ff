package graft.expressions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Split a top-level JSON ARRAY string into one standalone JSON string per
  * element, in ONE parse — the linear-time backbone of JSON_MATCH's `[*]`
  * wildcard (round 11). The former form evaluated
  * `get_json_object(arr, '$[i]')` per index i, and GetJsonObject re-parses
  * the WHOLE array string per call: O(len²) per document per wildcard leaf
  * (and the `arr` prefix extraction itself re-ran per element inside the
  * lambda). This expression parses the array once; the per-element
  * predicate then runs GetJsonObject over the SMALL element string only.
  *
  * Parity contract (the predicate rewrite depends on it):
  * `get_json_object(arr, '$[i]' + suffix) === get_json_object(slice_i,
  * '$' + suffix)` for every element i and suffix in {"", ".key"}. It holds
  * because each slice is a standalone JSON value carrying the element's
  * exact content:
  *
  *  - objects / nested arrays: the element's ORIGINAL byte range (Jackson
  *    token offsets — containers are tokenized eagerly, so the range is
  *    exact), preserving raw number renderings, field order, escapes;
  *    GetJsonObject then walks the identical token stream it would have
  *    walked inside the full array;
  *  - strings: re-quoted through a Jackson generator (string tokens are
  *    LAZILY decoded, so end offsets are unreliable) — any valid quoted
  *    form is equivalent because GetJsonObject only ever surfaces the
  *    DECODED value of a string leaf;
  *  - numbers / booleans: the raw token text (`getText`) — exactly what a
  *    GetJsonObject leaf extraction returns;
  *  - JSON null: the literal `null`, whose '$' extraction is SQL NULL on
  *    both paths.
  *
  * NULL result for SQL-null input, a non-array top-level value, or
  * malformed JSON — mirroring `json_array_length`'s null cases, so the
  * old `n IS NULL OR n < 1 ⇒ false` gate becomes plain three-valued
  * `exists` + coalesce(false).
  */
case class JsonArraySlices(child: Expression) extends UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  // Seq[DataType], not Seq[AbstractDataType] — the latter is private[sql]
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "json_array_slices"

  @transient private lazy val factory = new JsonFactory()

  override def nullSafeEval(json: Any): Any = {
    val bytes = json.asInstanceOf[UTF8String].getBytes
    try {
      val parser = factory.createParser(bytes)
      try {
        if (parser.nextToken() != JsonToken.START_ARRAY) return null
        val out = scala.collection.mutable.ArrayBuffer.empty[Any]
        var tok = parser.nextToken()
        while (tok != JsonToken.END_ARRAY) {
          if (tok == null) return null
          tok match {
            case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
              val start = parser.currentTokenLocation().getByteOffset.toInt
              parser.skipChildren()
              val end = parser.currentLocation().getByteOffset.toInt
              out += UTF8String.fromBytes(
                java.util.Arrays.copyOfRange(bytes, start, end))
            case JsonToken.VALUE_STRING =>
              val buf = new java.io.ByteArrayOutputStream()
              val gen = factory.createGenerator(buf)
              gen.writeString(parser.getText)
              gen.close()
              out += UTF8String.fromBytes(buf.toByteArray)
            case _ =>
              // numbers, true/false, null: the raw token text is itself a
              // standalone JSON value (and the exact leaf rendering)
              out += UTF8String.fromString(parser.getText)
          }
          tok = parser.nextToken()
        }
        new GenericArrayData(out.toArray)
      } finally parser.close()
    } catch {
      // malformed JSON only (the json_array_length null contract) — a
      // genuine defect (NPE, offset error) must surface, not degrade to a
      // false-negative JSON_MATCH (r11 ADVICE)
      case _: java.io.IOException => null // JsonProcessingException extends it
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsonArraySlices =
    copy(child = newChild)
}
