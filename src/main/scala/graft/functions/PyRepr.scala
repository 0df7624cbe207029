package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Python `str(list)` rendering for flattened array columns.
  *
  * The reference stringifies any list value with Python's `str()`
  * (reference utils.py:61): `['10', '11']` → the 12-char string
  * `"['10', '11']"`. This reproduces that rendering: single-quoted strings
  * (double-quoted when the text contains `'` but no `"`), `True`/`False`/
  * `None`, floats with `.0` for integral values, dicts as `{'k': v}`.
  *
  * Implementation: the column is first serialized with the codegen'd
  * `to_json` (handles any nested ArrayType/StructType uniformly), then a
  * String→String UDF re-renders the JSON in Python style. The UDF is a
  * per-row Jackson parse of only the (small) array cell — the heavy lifting
  * (struct shredding) stays in Tungsten. A full Catalyst Expression with
  * `doGenCode` is a later optimization if these columns ever dominate a
  * profile.
  */
object PyRepr {
  private lazy val mapper = new ObjectMapper()

  /** Python repr of a string literal. */
  def reprString(s: String): String = {
    val quote = if (s.contains("'") && !s.contains("\"")) '"' else '\''
    val sb = new StringBuilder
    sb.append(quote)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case c if c == quote => sb.append('\\').append(c)
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.append(quote).toString
  }

  /** Python repr of a double, mirroring CPython `float_repr`: shortest
    * round-trip digits (Java's `Double.toString` supplies them), decimal
    * notation while the decimal exponent is in [-4, 16), e-notation with a
    * signed >=2-digit exponent outside. Java's OWN notation switch differs
    * — it goes exponential below 1e-3 and at 1e7 — so the digits are
    * re-rendered under Python's thresholds (round-2 ADVICE: [1e-4,1e-3)
    * and [1e7,1e16) previously came out as E-notation). */
  def reprDouble(d: Double): String =
    if (d.isNaN) "nan"
    else if (d.isInfinity) { if (d > 0) "inf" else "-inf" }
    else if (d == 0.0) { if (1.0 / d < 0) "-0.0" else "0.0" }
    else {
      val neg = if (d < 0) "-" else ""
      val bd = new java.math.BigDecimal(java.lang.Double.toString(Math.abs(d)))
        .stripTrailingZeros()
      val digits = bd.unscaledValue.toString
      val exp10 = digits.length - 1 - bd.scale // decimal exponent of the leading digit
      if (exp10 >= -4 && exp10 < 16) {
        if (d == Math.rint(d)) s"$neg${Math.abs(d).toLong}.0" // integral: 1.0, 1e15 -> ...000.0
        else neg + bd.toPlainString
      } else {
        val mant = if (digits.length == 1) digits
                   else s"${digits.head}.${digits.tail}"
        val sign = if (exp10 < 0) "-" else "+"
        f"$neg${mant}e$sign${Math.abs(exp10)}%02d"
      }
    }

  def renderNode(n: JsonNode): String =
    if (n == null || n.isNull) "None"
    else if (n.isTextual) reprString(n.asText())
    else if (n.isBoolean) { if (n.asBoolean()) "True" else "False" }
    else if (n.isIntegralNumber) n.asLong().toString
    else if (n.isFloatingPointNumber) reprDouble(n.asDouble())
    else if (n.isArray) n.elements().asScala.map(renderNode).mkString("[", ", ", "]")
    else if (n.isObject)
      n.properties().asScala.toSeq // toSeq first: keep insertion order
        .map(e => reprString(e.getKey) + ": " + renderNode(e.getValue))
        .mkString("{", ", ", "}")
    else n.toString

  /** JSON text of an array/object cell → its Python-repr string. */
  def jsonToPyRepr(json: String): String =
    if (json == null) null else renderNode(mapper.readTree(json))

  private val pyReprUdf = udf(jsonToPyRepr _)

  /** Column transform: array/struct column → Python-repr string column.
    * Null cells stay null (a missing field is absent, not "None"). */
  def pyRepr(c: Column): Column = pyReprUdf(to_json(c))
}
