package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("asset table: binary payload + typed metadata struct") {
    val a = Multimodal.assets(spark, dir)
    val t = a.schema("payload").dataType.typeName
    assert(t == "binary")
    assert(a.schema("meta").dataType.typeName == "struct")
    assert(a.count() == 500)
  }

  test("image payloads are real PNGs; decode recovers the exact pixels") {
    // encode leg: the stored payload parses as a PNG with the declared dims
    val img = Multimodal.assets(spark, dir)
      .filter(org.apache.spark.sql.functions.col("modality") === "image")
      .head()
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(img.payload))
    assert(decoded != null)
    val (w, h) = Multimodal.imageDims(img.asset_id)
    assert(decoded.getWidth == w && decoded.getHeight == h)

    // decode leg: distributed stats equal the pixel formula, per asset
    val rows = Multimodal.decodeAssets(spark, dir).collect()
      .filter(_.modality == "image")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ew, eh) = Multimodal.imageDims(r.asset_id)
      val px = for (y <- 0 until eh; x <- 0 until ew)
        yield Multimodal.pixel(r.asset_id, x, y)
      assert(r.width == ew && r.height == eh)
      assert(r.n_bytes == ew.toLong * eh)
      assert(r.px_sum == px.map(_.toLong).sum)
      assert(r.px_min == px.min && r.px_max == px.max)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(px.map(_.toByte).toArray).map(b => f"$b%02x").mkString
      assert(r.content_sha256 == sha)
    }

    // video: content bytes are the payload itself
    val others = Multimodal.decodeAssets(spark, dir).collect()
      .filter(_.modality == "video")
    assert(others.forall(r => r.n_bytes > 0 && r.px_min <= r.px_max))
  }

  test("audio payloads are real WAVs; decode recovers the exact PCM samples") {
    // encode leg: the stored payload parses as a WAV with the declared
    // format and frame count
    val a = Multimodal.assets(spark, dir)
      .filter(org.apache.spark.sql.functions.col("modality") === "audio")
      .head()
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(a.payload))
    val expected = Multimodal.audioSamples(a.asset_id)
    assert(ais.getFormat.getSampleSizeInBits == 8)
    assert(ais.getFormat.getChannels == 1)
    assert(ais.getFrameLength == expected.length.toLong)

    // decode leg: distributed stats equal the sample formula, per asset
    val rows = Multimodal.decodeAssets(spark, dir).collect()
      .filter(_.modality == "audio")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val samples = Multimodal.audioSamples(r.asset_id).map(_ & 0xFF)
      assert(r.width == samples.length && r.height == 1)
      assert(r.n_bytes == samples.length.toLong)
      assert(r.px_sum == samples.map(_.toLong).sum)
      assert(r.px_min == samples.min && r.px_max == samples.max)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(samples.map(_.toByte)).map(b => f"$b%02x").mkString
      assert(r.content_sha256 == sha)
    }
  }

  test("resize: thumbnail equals the nearest-neighbor formula applied to source pixels") {
    val sf = "/root/testdata/sf0.001"
    val rows = Multimodal.resizeImages(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt)
      assert((w, h) == Multimodal.imageDims(id))
      val expected = for (y <- 0 until 2; x <- 0 until 3)
        yield Multimodal.pixel(id, x * w / 3, y * h / 2)
      assert(r.getLong(5) == expected.map(_.toLong).sum, s"px_sum of $id")
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(expected.map(_.toByte).toArray).map(b => f"$b%02x").mkString
      assert(r.getString(6) == sha, s"sha of $id")
    }
  }

  test("frame sampling slices video payloads with stride") {
    val frames = Multimodal.frameSample(spark, dir, frameBytes = 64, stride = 4).collect()
    assert(frames.nonEmpty)
    val byAsset = frames.groupBy(_.getLong(0))
    byAsset.values.foreach { fs =>
      val idxs = fs.map(_.getLong(1)).sorted.toSeq
      assert(idxs.head == 0L && idxs.sliding(2).forall {
        case Seq(a, b) => b - a == 4L; case _ => true })
    }
  }

  test("dup frames: planted identical videos collide, distinct video does not") {
    import spark.implicits._
    // video assets are doc_id % 3 == 2; ids 2 and 5 share payload, 8 differs
    val d2 = java.nio.file.Files.createTempDirectory("graft-dupframes").toString
    val shared = "x" * 50
    Seq((2L, shared), (5L, shared), (8L, "y" * 50))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = Multimodal.dupFrames(spark, d2).collect()
    assert(rows.length == 1) // one shared 64-byte frame (50-char payloads -> 1 frame each)
    assert(rows.head.getLong(1) == 2L) // n_assets
    assert(rows.head.getLong(2) == 2L) // n_frames
    // and on the real corpus every reported sha really spans >= 2 assets
    val real = Multimodal.dupFrames(spark, dir).collect()
    val frames = Multimodal.frameSample(spark, dir).collect()
      .groupBy(_.getString(2)).map { case (sha, fs) =>
        sha -> fs.map(_.getLong(0)).distinct.length }
    real.foreach(r => assert(frames(r.getString(0)) == r.getLong(1) && r.getLong(1) >= 2))
  }
}
