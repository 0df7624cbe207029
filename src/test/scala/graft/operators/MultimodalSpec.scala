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

    // video: content is the concatenation of the decoded frame rasters,
    // re-derivable from the scene formula without touching a container
    val others = Multimodal.decodeAssets(spark, dir).collect()
      .filter(_.modality == "video")
    assert(others.nonEmpty)
    others.foreach { r =>
      val n = Multimodal.videoNFrames(r.asset_id)
      val px = for {
        f <- 0 until n
        sc = Multimodal.videoScene(r.asset_id, f)
        (w, h) = Multimodal.sceneDims(sc)
        y <- 0 until h; x <- 0 until w
      } yield Multimodal.scenePixel(sc, x, y)
      assert(r.width == n && r.height == 1)
      assert(r.n_bytes == px.length.toLong)
      assert(r.px_sum == px.map(_.toLong).sum)
      assert(r.px_min == px.min && r.px_max == px.max)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(px.map(_.toByte).toArray).map(b => f"$b%02x").mkString
      assert(r.content_sha256 == sha)
    }
  }

  test("GVID round-trip property: every asset id encodes/decodes to the formula rasters") {
    // property-style sweep over a spread of ids (not just corpus ids):
    // container parse + per-frame PNG decode must invert the encoder
    // exactly for any id, including the modulus edge ids
    val ids = (0L to 200L by 7L) ++ Seq(47L, 48L, 95L, 96L, 1000003L)
    ids.foreach { id =>
      val (n, frames) = Multimodal.readVideoPayloads(Multimodal.videoBytes(id))
      assert(n == Multimodal.videoNFrames(id))
      frames.zipWithIndex.foreach { case (png, f) =>
        val sc = Multimodal.videoScene(id, f)
        val (w, h) = Multimodal.sceneDims(sc)
        val expected = (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.scenePixel(sc, x, y).toByte).toArray
        assert(java.util.Arrays.equals(Multimodal.pngRaster(png), expected),
          s"raster of id=$id frame=$f")
      }
    }
  }

  test("video payloads are real GVID containers of real PNG frames") {
    val a = Multimodal.assets(spark, dir)
      .filter(org.apache.spark.sql.functions.col("modality") === "video")
      .head()
    val (n, frames) = Multimodal.readVideoPayloads(a.payload)
    assert(n == Multimodal.videoNFrames(a.asset_id))
    frames.zipWithIndex.foreach { case (png, f) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null) // each frame payload is a standalone decodable PNG
      val sc = Multimodal.videoScene(a.asset_id, f)
      assert((img.getWidth, img.getHeight) == Multimodal.sceneDims(sc))
    }
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

  test("frame sampling decodes every stride-th frame; hashes match the scene formula") {
    val frames = Multimodal.frameSample(spark, dir, stride = 4).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.getLong(0)).foreach { case (id, fs) =>
      val idxs = fs.map(_.getLong(1)).sorted.toSeq
      val expected = (0 until Multimodal.videoNFrames(id) by 4).map(_.toLong)
      assert(idxs == expected, s"sampled idxs of $id")
    }
    frames.foreach { r =>
      val sc = Multimodal.videoScene(r.getLong(0), r.getLong(1).toInt)
      val (w, h) = Multimodal.sceneDims(sc)
      val px = for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.scenePixel(sc, x, y).toByte
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(px.toArray).map(b => f"$b%02x").mkString
      assert(r.getString(2) == sha)
    }
  }

  test("streamed decode fold is bit-identical to concatenate-then-digest at many-frames scale") {
    // 10k chunks of varying size (~1.1 MB total) — far past any real
    // GVID in the corpus; the streamed fold must equal the reference
    // that materializes the whole concatenation (the thing the operator
    // no longer does)
    val rnd = new scala.util.Random(7)
    val chunks = Vector.tabulate(10000) { i =>
      Array.fill(1 + rnd.nextInt(220))((rnd.nextInt(256) - 128).toByte)
    }
    val concat = chunks.flatten.toArray
    val refSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(concat).map(b => f"$b%02x").mkString
    val vals = concat.map(_ & 0xFF)
    val (n, sum, mn, mx, sha) = Multimodal.foldContentChunks(chunks.iterator)
    assert(n == concat.length.toLong)
    assert(sum == vals.map(_.toLong).sum)
    assert(mn == vals.min && mx == vals.max)
    assert(sha == refSha)
    // and the empty stream (zero-frame container) stays well-defined
    val (n0, s0, _, _, sha0) = Multimodal.foldContentChunks(Iterator.empty)
    assert(n0 == 0L && s0 == 0L)
    assert(sha0 == java.security.MessageDigest.getInstance("SHA-256")
      .digest(Array.emptyByteArray).map(b => f"$b%02x").mkString)
  }

  test("stride-aware reader yields exactly the sampled frames and skips the rest") {
    val ids = Seq(2L, 8L, 50L, 1000003L)
    for (id <- ids; stride <- Seq(1, 3, 4)) {
      val payload = Multimodal.videoBytes(id)
      val sampled = Multimodal.sampledFramePayloads(payload, stride).toVector
      val all = Multimodal.readVideoPayloads(payload)._2.toVector
      val expected = all.zipWithIndex.collect {
        case (png, f) if f % stride == 0 => (f, png)
      }
      assert(sampled.map(_._1) == expected.map(_._1), s"idxs id=$id stride=$stride")
      sampled.zip(expected).foreach { case ((_, got), (_, want)) =>
        assert(java.util.Arrays.equals(got, want))
      }
    }
  }

  test("dup frames: same-scene assets collide, distinct scenes do not") {
    import spark.implicits._
    // video assets are doc_id % 3 == 2; scene(id, f) = (id + 17f) % 48,
    // so ids 2 and 50 (≡ 2 mod 48) share every overlapping frame's
    // content; id 8's scenes {8, 28, 0} overlap neither
    val d2 = java.nio.file.Files.createTempDirectory("graft-dupframes").toString
    Seq(2L, 50L, 8L)
      .map { id => (id, "t" * 50, "en", "s", 50L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = Multimodal.dupFrames(spark, d2).collect()
    // sampled frames: id 2 → f∈{0,4} scenes {2,22}; id 50 → f∈{0,4,8}
    // scenes {2,22,42}; id 8 → f∈{0,4,8} scenes {8,28,0}
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 2L) // n_assets: ids 2 and 50
      assert(r.getLong(2) == 2L) // one sampled frame from each
    }
    // and on the real corpus every reported sha really spans >= 2 assets
    val real = Multimodal.dupFrames(spark, dir).collect()
    assert(real.nonEmpty)
    val frames = Multimodal.frameSample(spark, dir).collect()
      .groupBy(_.getString(2)).map { case (sha, fs) =>
        sha -> fs.map(_.getLong(0)).distinct.length }
    real.foreach(r => assert(frames(r.getString(0)) == r.getLong(1) && r.getLong(1) >= 2))
  }

  test("audiofp: decoded window hashes equal the formula; dup rows span >= 2 assets") {
    // reference: windows straight from the generation formula, no decode
    def refWins(id: Long): Seq[String] = {
      val samples = Multimodal.audioSamples(id)
      samples.sliding(8).filter(_.length == 8).map { w =>
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(w).map(b => f"$b%02x").mkString
      }.toSeq
    }
    val got = Multimodal.audioFingerprints(spark, dir).collect()
      .groupBy(_.asset_id)
    assert(got.nonEmpty)
    got.foreach { case (id, rows) =>
      assert(rows.sortBy(_.off).map(_.fp_sha).toSeq == refWins(id), s"id $id")
    }
    // dup report: every row really spans >= 2 distinct assets, counts match
    val byFp = got.values.flatten.groupBy(_.fp_sha)
      .map { case (fp, rs) => fp -> (rs.map(_.asset_id).toSet.size.toLong,
        rs.size.toLong) }
    val dup = Multimodal.dupAudio(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(dup.nonEmpty)
    dup.foreach { case (fp, na, nw) =>
      assert(na >= 2 && byFp(fp) == ((na, nw)), s"$fp") }
    assert(byFp.count(_._2._1 >= 2) == dup.length)
  }

  test("phash: decoded aHash equals formula reference; banded join equals brute force") {
    // independent reference: hashes straight from the generation formula
    // (no decode), then all-pairs Hamming — the banded operator must
    // reproduce both exactly
    def refHash(id: Long): (Long, Long) = {
      val (w, h) = Multimodal.imageDims(id)
      val g = for (j <- 0 until 8; i <- 0 until 8)
        yield Multimodal.pixel(id, i * w / 8, j * h / 8)
      val s = g.map(_.toLong).sum
      var lo = 0L; var hi = 0L
      for (b <- 0 until 64 if 64L * g(b) >= s)
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      (lo, hi)
    }
    val hashes = Multimodal.imageAHashes(spark, dir).collect()
      .map(a => a.asset_id -> (a.ahash_lo, a.ahash_hi)).toMap
    assert(hashes.nonEmpty)
    hashes.foreach { case (id, hl) => assert(hl == refHash(id), s"id $id") }
    // brute-force near-dup degree
    val ids = hashes.keys.toSeq.sorted
    def dist(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val brute = ids.map(i =>
      i -> ids.count(j => j != i && dist(hashes(i), hashes(j)) <= 3).toLong).toMap
    val out = Multimodal.perceptualDupImages(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == ids, "every image present exactly once")
    out.foreach { case (id, lo, hi, n) =>
      assert((lo, hi) == hashes(id))
      assert(n == brute(id), s"id $id: banded $n vs brute ${brute(id)}")
    }
    // the fixture genuinely exercises the near-dup path
    assert(out.exists(_._4 > 0), "no near-dup pair at sf0.001 — fixture dead")
  }

  test("scene cuts: decoded diffs equal the generation-formula replay") {
    val dir = "/root/testdata/sf0.001"
    val out = Multimodal.sceneCuts(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.nonEmpty)
    // independent replay: scene/dims/pixel formulas + the 8x8 NN grid
    def grid(id: Long, f: Int): Array[Int] = {
      val sc = Multimodal.videoScene(id, f)
      val (w, h) = Multimodal.sceneDims(sc)
      Array.tabulate(64)(b => Multimodal.scenePixel(sc, (b % 8) * w / 8, (b / 8) * h / 8))
    }
    val vids = out.keys.map(_._1).toSeq.distinct.sorted
    vids.foreach { id =>
      val n = Multimodal.videoNFrames(id)
      (1 until n).foreach { f =>
        val d = grid(id, f).zip(grid(id, f - 1)).map { case (a, b) => (a - b).abs.toLong }.sum
        assert(out((id, f.toLong)) == ((d, d >= 1200L)), s"asset $id frame $f")
      }
    }
    // threshold discriminates on this corpus
    assert(out.values.exists(_._2) && out.values.exists(!_._2))
  }

  test("keyframes: shots and per-shot argmax equal the generation-formula replay") {
    val dir = "/root/testdata/sf0.001"
    val out = Multimodal.keyframes(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.nonEmpty)
    def grid(id: Long, f: Int): Array[Int] = {
      val sc = Multimodal.videoScene(id, f)
      val (w, h) = Multimodal.sceneDims(sc)
      Array.tabulate(64)(b => Multimodal.scenePixel(sc, (b % 8) * w / 8, (b / 8) * h / 8))
    }
    val vids = out.keys.map(_._1).toSeq.distinct.sorted
    var sawMultiFrameShot = false
    vids.foreach { id =>
      val n = Multimodal.videoNFrames(id)
      val grids = (0 until n).map(f => grid(id, f))
      val sums = grids.map(_.map(_.toLong).sum)
      val shotOf = new Array[Int](n)
      (1 until n).foreach { f =>
        val d = grids(f).zip(grids(f - 1)).map { case (a, b) => (a - b).abs.toLong }.sum
        shotOf(f) = shotOf(f - 1) + (if (d >= 1200L) 1 else 0)
      }
      (0 until n).groupBy(shotOf).foreach { case (shot, fs) =>
        val key = fs.maxBy(i => (sums(i), -i))
        if (fs.size > 1) sawMultiFrameShot = true
        assert(out((id, shot.toLong)) ==
          ((fs.min.toLong, fs.size.toLong, key.toLong, sums(key))),
          s"asset $id shot $shot")
      }
      assert(out.keys.count(_._1 == id) == shotOf(n - 1) + 1)
    }
    assert(sawMultiFrameShot) // the argmax genuinely chooses among frames
  }

  test("quiet segments: counts, membership sum and runs equal a brute replay") {
    val dir = "/root/testdata/sf0.001"
    val out = Multimodal.quietSegments(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.nonEmpty)
    out.keys.toSeq.sorted.foreach { id =>
      val samples = Multimodal.audioSamples(id).map(_ & 0xff)
      val rngs = (0 to samples.length - 8)
        .map(o => (o.toLong, samples.slice(o, o + 8).max - samples.slice(o, o + 8).min))
      val quiet = rngs.filter(_._2 <= 52).map(_._1)
      // longest consecutive-offset run
      val longest = if (quiet.isEmpty) 0L else
        quiet.foldLeft((0L, 0L, Long.MinValue)) { case ((best, cur, prev), o) =>
          val c = if (o == prev + 1) cur + 1 else 1L
          (math.max(best, c), c, o)
        }._1
      assert(out(id) == ((rngs.length.toLong, quiet.length.toLong, quiet.sum, longest)),
        s"asset $id")
    }
    val vals = out.values
    assert(vals.exists(_._2 > 0) && vals.exists(v => v._2 < v._1))
  }
}
