package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.model.Singer

class JsonSchemaConverterSpec extends AnyFunSuite {
  // The canonical nested fixture (reference utils.py:67-99 docstring shape).
  val nested: String =
    """{"type": "object", "properties": {
      |  "key_1": {"type": ["null", "integer"]},
      |  "key_2": {"type": ["null", "object"], "properties": {
      |    "key_3": {"type": ["null", "string"]},
      |    "key_4": {"type": ["null", "object"], "properties": {
      |      "key_5": {"type": ["null", "integer"]},
      |      "key_6": {"type": ["null", "array"], "items": {
      |        "type": ["null", "object"], "properties": {
      |          "key_7": {"type": ["null", "number"]},
      |          "key_8": {"type": ["null", "string"]}}}}}}}}}}""".stripMargin

  test("flattenSchema: objects recurse, arrays are leaves") {
    val node = Singer.parseJson(nested)
    assert(JsonSchemaConverter.flattenSchema(node.get("properties")) ==
      Seq("key_1", "key_2__key_3", "key_2__key_4__key_5", "key_2__key_4__key_6"))
  }

  test("toStructType maps integer->long, number->double, string, nested struct, array") {
    val st = JsonSchemaConverter.toStructType(Singer.parseJson(nested))
    assert(st("key_1").dataType == LongType)
    val k2 = st("key_2").dataType.asInstanceOf[StructType]
    assert(k2("key_3").dataType == StringType)
    val k4 = k2("key_4").dataType.asInstanceOf[StructType]
    assert(k4("key_5").dataType == LongType)
    assert(k4("key_6").dataType.isInstanceOf[ArrayType])
  }

  test("date-time format stays string (reference never parses datetimes)") {
    val st = JsonSchemaConverter.toStructType(Singer.parseJson(
      """{"properties": {"c_date": {"format": "date-time", "type": ["null", "string"]}}}"""))
    assert(st("c_date").dataType == StringType)
  }

  test("untyped fields warn-and-pass as string leaves") {
    val node = Singer.parseJson("""{"properties": {"odd": {"description": "no type"}}}""")
    assert(JsonSchemaConverter.flattenSchema(node.get("properties")) == Seq("odd"))
    assert(JsonSchemaConverter.toStructType(node)("odd").dataType == StringType)
  }

  test("mergeSchemas appends record-only fields in name order, declared types win") {
    val declared = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val inferred = StructType(Seq(StructField("b", LongType),
      StructField("z_extra", StringType), StructField("_sdc_deleted_at", StringType)))
    val merged = JsonSchemaConverter.mergeSchemas(declared, inferred)
    assert(merged.fieldNames.toSeq == Seq("a", "b", "_sdc_deleted_at", "z_extra"))
    assert(merged("b").dataType == StringType)
  }
}
