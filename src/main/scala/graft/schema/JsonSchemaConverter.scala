package graft.schema

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** JSON Schema (Draft 4 subset: `type` unions, `properties`, `items`,
  * `format`, bounds) → Spark `StructType`, plus the `__`-separated
  * flattened-name walk.
  *
  * Type mapping follows the reference's *physical* behavior (SURVEY.md
  * §1.2): Arrow infers int64/float64/utf8 from Python values, so `integer`
  * → LongType, `number` → DoubleType, `string` (any `format`) → StringType
  * — date-time strings are deliberately NOT parsed (reference keeps them
  * as strings, FIXTURES.md §1). Objects recurse; arrays are leaves that the
  * flatten step stringifies (reference utils.py:61,107-110).
  */
object JsonSchemaConverter {

  /** Non-null JSON-Schema type names of a property node ("null" removed). */
  def typeNames(prop: JsonNode): Seq[String] = Option(prop.get("type")) match {
    case None => Seq.empty
    case Some(t) if t.isTextual => Seq(t.asText())
    case Some(t) if t.isArray => t.elements().asScala.map(_.asText()).toSeq.filter(_ != "null")
    case _ => Seq.empty
  }

  private def leafType(prop: JsonNode, decimalForMultipleOf: Boolean): DataType =
    typeNames(prop) match {
    case ts if ts.contains("object") =>
      toStructType(prop, decimalForMultipleOf) // nested object
    case ts if ts.contains("array") =>
      ArrayType(Option(prop.get("items"))
        .map(leafType(_, decimalForMultipleOf)).getOrElse(StringType))
    case ts if ts.contains("string") => StringType
    case ts if ts.contains("integer") => LongType
    case ts if ts.contains("number") =>
      // legacy L2 (reference __init__.py:76-82): `multipleOf` numbers are
      // coerced to exact decimals so step validation isn't float-fuzzy
      if (decimalForMultipleOf && prop.has("multipleOf")) DecimalType(38, 18)
      else DoubleType
    case ts if ts.contains("boolean") => BooleanType
    case _ => StringType // no/unknown type: reference warns and passes through
  }

  /** Schema node (an `object` with `properties`) → StructType. All fields
    * nullable: the reference's corpus uses `["null", X]` unions throughout
    * and missing keys are filled with null at write (reference
    * __init__.py:163-168). */
  def toStructType(schema: JsonNode, decimalForMultipleOf: Boolean = false): StructType = {
    val props = Option(schema.get("properties"))
    // .toSeq BEFORE .map: properties() is a (insertion-ordered) Set and a
    // Set.map would scramble field order.
    StructType(props.toSeq.flatMap(_.properties().asScala.toSeq.map { e =>
      StructField(e.getKey, leafType(e.getValue, decimalForMultipleOf), nullable = true)
    }))
  }

  /** Flattened column-name walk over a schema's `properties`, mirroring
    * reference utils.py:65-111: recurse only into `object`, arrays and
    * untyped fields are leaves. */
  def flattenSchema(properties: JsonNode, parentKey: String = "", sep: String = "__"): Seq[String] =
    if (properties == null) Seq.empty
    else properties.properties().asScala.toSeq.flatMap { e =>
      val k = e.getKey
      val v = e.getValue
      val newKey = if (parentKey.isEmpty) k else parentKey + sep + k
      if (typeNames(v).contains("object"))
        flattenSchema(v.get("properties"), newKey, sep)
      else Seq(newKey)
    }

  /** §1.4 union-schema inference input: the epoch's raw record strings,
    * null payloads excluded (a RECORD without a `record` key is a protocol
    * error flagged by validation — it must not surface as an opaque JSON-
    * inference crash). `sampleRows > 0` bounds the inference scan to the
    * first N records — a knob for the streaming hot path, where full-scan
    * inference doubles the per-trigger read; fields first appearing after
    * row N are NOT passed through. The default (<= 0) scans everything:
    * exact parity with the reference, which unions EVERY record's fields
    * into the batch schema (§1.4). */
  def inferExtra(spark: org.apache.spark.sql.SparkSession,
                 recs: org.apache.spark.sql.DataFrame,
                 sampleRows: Long): StructType = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val nonNull = recs.filter(col("rec").isNotNull)
    // The bounded sample is the FIRST `sampleRows` records by arrival
    // (`idx` — the Singer line order both ingest paths carry): a bare
    // limit() took whichever partition answered first, which was only
    // prefix-deterministic while batches arrived as one serial
    // partition; since the r16 fan-out exchange the prefix must be
    // spelled (TakeOrderedAndProject — top-n per partition + merge, no
    // full sort). Relations without idx keep the unordered limit.
    val bounded =
      if (sampleRows <= 0) nonNull
      else if (recs.columns.contains("idx"))
        nonNull.orderBy(col("idx")).limit(sampleRows.toInt)
      else nonNull.limit(sampleRows.toInt)
    spark.read.json(bounded.select("rec").as[String]).schema
  }

  /** Merge an inferred record schema into the declared one: declared leaf
    * types win; fields only present in the data (e.g. `_sdc_deleted_at`,
    * reference §1.4) are appended in name order for determinism. */
  def mergeSchemas(declared: StructType, inferred: StructType): StructType = {
    val declaredNames = declared.fieldNames.toSet
    val extras = inferred.fields.filter(f => !declaredNames.contains(f.name)).sortBy(_.name)
    val merged = declared.fields.map { df =>
      (df.dataType, inferred.fields.find(_.name == df.name).map(_.dataType)) match {
        case (d: StructType, Some(i: StructType)) => df.copy(dataType = mergeSchemas(d, i))
        case _ => df
      }
    }
    StructType(merged ++ extras.map(_.copy(nullable = true)))
  }
}
