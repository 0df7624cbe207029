package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType

/** Singer protocol model (control-plane side).
  *
  * The Singer envelope is `{"type": "RECORD"|"SCHEMA"|"STATE"|..., ...}`
  * (reference: target_s3_parquet/__init__.py:222-251). RECORDs are the data
  * plane and never materialize on the driver — they are processed as a
  * distributed DataFrame (see [[graft.pipeline.SingerPipeline]]). SCHEMA and
  * STATE are low-volume control messages and are parsed here with Jackson.
  */
sealed trait ControlMessage { def idx: Long }

/** A stream's JSON Schema registration (reference __init__.py:239-245). */
final case class SchemaMessage(
    idx: Long,
    stream: String,
    schema: JsonNode,
    keyProperties: Seq[String]) extends ControlMessage

/** A state bookmark (reference __init__.py:236-238). */
final case class StateMessage(idx: Long, value: JsonNode) extends ControlMessage

object Singer {
  val Sep = "__"

  /** Error message parity with reference __init__.py:220. */
  def unparseableError(line: String) = s"Unable to parse:\n$line"

  /** Error message parity with reference __init__.py:225-229. */
  def recordBeforeSchemaError(stream: String) =
    s"A record for stream $stream was encountered before a corresponding schema"

  private val mapper = new ObjectMapper()

  def parseJson(s: String): JsonNode = mapper.readTree(s)

  def toJsonString(n: JsonNode): String = mapper.writeValueAsString(n)

  /** Parse one control-plane line (already known to be SCHEMA or STATE). */
  def parseControl(idx: Long, line: String): ControlMessage = {
    val node = parseJson(line)
    node.get("type").asText() match {
      case "SCHEMA" =>
        val keyProps = Option(node.get("key_properties")) match {
          case Some(kp) if kp.getNodeType == JsonNodeType.ARRAY =>
            (0 until kp.size()).map(kp.get(_).asText())
          case _ => Seq.empty
        }
        SchemaMessage(idx, node.get("stream").asText(), node.get("schema"), keyProps)
      case "STATE" => StateMessage(idx, node.get("value"))
      case other => throw new IllegalArgumentException(s"not a control message: $other")
    }
  }
}

/** The reference's state fold (P8, __init__.py:213,235-238,253): every
  * RECORD resets state to None, every STATE replaces it — so the emitted
  * bookmark is the last STATE *not followed by any record*. Kept as a pure
  * function so the distributed pipeline and unit tests share one truth:
  * the fold only needs the index of the last STATE and the max RECORD
  * index, both O(1) aggregates at any scale.
  */
object StateFold {
  def emittedState(states: Seq[StateMessage], maxRecordIdx: Option[Long]): Option[JsonNode] =
    states.sortBy(_.idx).lastOption.filter(s => maxRecordIdx.forall(_ < s.idx)).map(_.value)
}
