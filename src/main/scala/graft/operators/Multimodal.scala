package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, flowing through real Spark schema /
  * partitioning / batch machinery. The actual media decode is STUBBED
  * (this container has no image/audio libraries): `stubDecode` is a
  * deterministic fake standing in for e.g. a JPEG decoder; swap it for a
  * real codec without touching any of the distributed plumbing.
  */
object Multimodal {

  /** A decoded-asset feature row (what a real decoder would emit). */
  final case class AssetFeatures(
      asset_id: Long, modality: String, n_bytes: Long,
      width: Int, height: Int, features: Array[Float])

  /** Simulated asset table derived deterministically from `documents`:
    * payload = UTF-8 bytes of the text (stands in for media bytes),
    * metadata struct carries the declared shape. */
  def assets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit("stub/v1").as("format")).as("meta"))

  /** STUB decoder — deterministic fake features from the payload bytes.
    * A real implementation would decode the media and run a feature
    * extractor here; the signature (bytes in, fixed-width float vector
    * out, executed per partition with no driver involvement) is the real
    * contract. */
  def stubDecode(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { out(i % dim) += (payload(i) & 0xFF) / 255.0f; i += 1 }
    out
  }

  /** Distributed decode/feature-extract over the binary column via
    * `mapPartitions` on a typed Dataset — the Scala analogue of a Pandas
    * `mapInPandas` batch UDF: executors stream batches of (id, bytes)
    * rows through the decoder, never materializing the table anywhere. */
  def extractFeatures(s: SparkSession, dir: String): Dataset[AssetFeatures] = {
    import s.implicits._
    assets(s, dir)
      .select(col("asset_id"), col("modality"), col("payload"),
              col("meta.width"), col("meta.height"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, mod, bytes, w, h) =>
        AssetFeatures(id, mod, bytes.length.toLong, w, h, stubDecode(bytes))
      })
  }

  /** Oracle-checkable summary of the multimodal pipeline: byte counts and
    * payload digests are real (not stubbed), so DuckDB can verify the
    * binary plumbing end-to-end even though feature values are fake. */
  def assetSummary(s: SparkSession, dir: String): DataFrame =
    assets(s, dir).select(
      col("asset_id"), col("modality"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("payload_sha256"),
      col("meta.width").cast("long").as("width"))
      .orderBy("asset_id")

  /** Frame sampling (video-style): slice the payload into fixed-size
    * "frames" and keep every `stride`-th — the partition-parallel shape of
    * real frame extraction, with byte-slicing standing in for decode. */
  def frameSample(s: SparkSession, dir: String,
                  frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("long")
    assets(s, dir)
      .filter(col("modality") === "video")
      .select(col("asset_id"), col("payload"), nFrames.as("n_frames"),
        posexplode(sequence(lit(0L), greatest(nFrames - 1, lit(0L)), lit(stride.toLong)))
          .as(Seq("frame_pos", "frame_idx")))
      .select(col("asset_id"), col("frame_idx"),
        col("payload").substr((col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame_bytes"))
      .withColumn("frame_sha", sha2(col("frame_bytes"), 256))
      .drop("frame_bytes")
      .orderBy("asset_id", "frame_idx")
  }

  /** Cross-asset duplicate frames: every frame hash sampled from ≥ 2
    * DISTINCT video assets, with how many assets and how many sampled
    * frames carry it — the video-dedup primitive (re-uploads, edits and
    * mirrored clips share exact frame content long before they share
    * whole-file hashes). Consumes [[frameSample]]'s hashes, so a real
    * perceptual-hash decoder slots in at the same column.
    *
    * One exchange: the groupBy on the 32-byte sha (frame bodies were
    * already dropped by frameSample — only (asset_id, sha) rows move);
    * count(distinct) folds into the same aggregate via Spark's expand
    * rewrite, and frameSample's presentation sort is eliminated under
    * the aggregate (verified plan property, see DocPipeline). At 100 TB
    * the exchange carries one row per sampled frame — the scan of the
    * video payloads dominates, as it must. */
  def dupFrames(s: SparkSession, dir: String,
                frameBytes: Int = 64, stride: Int = 4): DataFrame =
    frameSample(s, dir, frameBytes, stride)
      .groupBy("frame_sha")
      .agg(countDistinct(col("asset_id")).as("n_assets"),
        count(lit(1)).as("n_frames"))
      .filter(col("n_assets") >= 2)
      .orderBy("frame_sha")
}
