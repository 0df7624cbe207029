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

  /** Python repr of a double (common cases: integral → "1.0"). */
  def reprDouble(d: Double): String =
    if (d.isNaN) "nan"
    else if (d.isInfinity) { if (d > 0) "inf" else "-inf" }
    else if (d == Math.rint(d) && Math.abs(d) < 1e16) {
      val l = d.toLong
      s"$l.0"
    } else {
      val s = d.toString // Java shortest-roundtrip, matches Python for non-exponent forms
      if (s.contains("E")) {
        // Python: 1e-05, 1e+16 style
        val Array(m, e) = s.split("E")
        val mant = if (m.endsWith(".0")) m.dropRight(2) else m
        val exp = e.toInt
        val sign = if (exp < 0) "-" else "+"
        f"${mant}e$sign${Math.abs(exp)}%02d"
      } else s
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
