package graft.validate

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.JsonSchemaConverter.typeNames
import scala.jdk.CollectionConverters._

/** JSON-Schema (Draft 4 subset) → Catalyst constraint predicates.
  *
  * The reference validates every RECORD with `Draft4Validator.validate`
  * (reference __init__.py:231,241) — a per-row Python interpreter call. Here
  * the same keywords (`type`, `minimum`, `maximum`, `maxLength`) compile
  * once per stream into `Column` expressions evaluated inside
  * WholeStageCodegen: validation cost is a few comparisons per row and the
  * whole check is Catalyst-optimizable (SURVEY.md §2.2 P5 option b).
  *
  * Type violations are detected structurally: `from_json` yields null for a
  * cell whose raw JSON is present but uncoercible, so
  * `raw IS NOT NULL AND parsed IS NULL` ⇔ wrong type.
  */
object Constraints {

  final case class LeafConstraint(
      path: Seq[String],           // nested field path in the parsed struct
      jsonPath: String,            // $.a.b for get_json_object on the raw record
      minimum: Option[Double],
      maximum: Option[Double],
      maxLength: Option[Int],
      declaredTypes: Seq[String]) {
    def flatName: String = path.mkString("__")
  }

  /** Walk a schema's properties, collecting leaf constraints. Arrays are
    * leaves (never recursed), mirroring the flatten walk. */
  def compile(schema: JsonNode, parent: Seq[String] = Seq.empty): Seq[LeafConstraint] = {
    val props = Option(schema.get("properties"))
    props.toSeq.flatMap(_.properties().asScala.toSeq.flatMap { e =>
      val (k, v) = (e.getKey, e.getValue)
      val path = parent :+ k
      if (typeNames(v).contains("object")) compile(v, path)
      else Seq(LeafConstraint(
        path = path,
        jsonPath = "$." + path.mkString("."),
        minimum = Option(v.get("minimum")).map(_.asDouble()),
        maximum = Option(v.get("maximum")).map(_.asDouble()),
        maxLength = Option(v.get("maxLength")).map(_.asInt()),
        declaredTypes = typeNames(v)))
    })
  }

  private def field(root: Column, path: Seq[String]): Column =
    path.foldLeft(root)(_.getField(_))

  /** A column evaluating to the first violation message for the row, or
    * null if the row is valid. `root` is the parsed struct column, `raw`
    * the original record-JSON string column. */
  def violation(constraints: Seq[LeafConstraint], root: Column, raw: Column): Column = {
    val checks: Seq[Column] = constraints.flatMap { c =>
      val parsed = field(root, c.path)
      val rawCell = get_json_object(raw, c.jsonPath)
      val typeCheck: Seq[Column] =
        if (c.declaredTypes.isEmpty || c.declaredTypes.contains("array")) Seq.empty
        else Seq(when(rawCell.isNotNull && parsed.isNull,
          format_string("%s is not of type %s", rawCell,
            lit(c.declaredTypes.mkString("'", "', '", "'")))))
      val minCheck = c.minimum.toSeq.map(m =>
        when(parsed.cast("double") < m,
          format_string(s"%s is less than the minimum of $m", parsed.cast("string"))))
      val maxCheck = c.maximum.toSeq.map(m =>
        when(parsed.cast("double") > m,
          format_string(s"%s is greater than the maximum of $m", parsed.cast("string"))))
      val lenCheck = c.maxLength.toSeq.map(n =>
        when(length(parsed.cast("string")) > n,
          format_string(s"%s is too long (maxLength $n)", parsed.cast("string"))))
      (typeCheck ++ minCheck ++ maxCheck ++ lenCheck)
        .map(ch => when(ch.isNotNull, concat(lit(s"${c.flatName}: "), ch)))
    }
    if (checks.isEmpty) lit(null).cast("string") else coalesce(checks :+ lit(null).cast("string"): _*)
  }

  /** Strict mode (reference behavior): abort the job on the first invalid
    * record. Runs as one distributed scan; only a single violating row (if
    * any) is ever collected to the driver. */
  def validateOrThrow(df: DataFrame, constraints: Seq[LeafConstraint],
                      root: Column, raw: Column, stream: String): Unit = {
    val bad = df.select(violation(constraints, root, raw).as("v"))
      .filter(col("v").isNotNull).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"Record validation failed for stream $stream: ${bad.head.getString(0)}")
  }
}
