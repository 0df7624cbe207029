package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, flowing through real Spark schema /
  * partitioning / batch machinery.
  *
  * IMAGE payloads are REAL PNGs: generated deterministically per asset
  * (tiny gray images, pixel values a pure function of (asset, x, y)),
  * encoded AND decoded with pure-JVM `javax.imageio` on the executors —
  * no native codec needed. The decode side reports stats of the DECODED
  * raster, so the DuckDB oracle (which re-derives the same pixels from
  * the formula, never seeing a PNG) verifies the whole
  * encode→store→decode loop end to end: a broken encoder, decoder or
  * byte shuffle anywhere breaks the content hash.
  *
  * AUDIO payloads are REAL WAVs: deterministic 8-bit PCM mono signals
  * written and parsed with pure-JVM `javax.sound.sampled` — the decode
  * side reads the container's declared frame count and the PCM frames
  * through `AudioInputStream`, so header parsing and sample extraction
  * are the real thing, oracle-pinned the same way as images.
  *
  * VIDEO payloads are REAL MJPEG-style containers ("GVID": magic +
  * frame count + length-prefixed per-frame payloads), with each frame a
  * real PNG decoded by the same `javax.imageio` executor path images
  * use — PNG instead of JPEG for the frame codec solely because it is
  * lossless, so the oracle can re-derive the decoded rasters from the
  * generation formula exactly as it does for images (a lossy JPEG
  * decode is not re-derivable in SQL). Frame CONTENT is keyed by a
  * "scene" id shared across assets, so cross-asset duplicate frames —
  * the thing video dedup exists to find — occur by construction and
  * the dupframes oracle can recompute them.
  */
object Multimodal {

  /** Deterministic tiny image shape per asset: width 4-16, height 3-9 —
    * small enough that the oracle re-derives per-pixel expectations over
    * an unnest(range(...)) grid without blowing up. */
  private[graft] def imageDims(id: Long): (Int, Int) =
    (4 + (id % 13).toInt, 3 + (id % 7).toInt)

  /** Gray value of pixel (x, y) of asset `id`, in the printable-ASCII
    * band 32-95 so the oracle can rebuild the raster byte string with
    * chr()/string_agg and hash it. */
  private[graft] def pixel(id: Long, x: Int, y: Int): Int =
    32 + ((x + y + id) % 64).toInt

  // ImageIO defaults to a FILE-backed stream cache: every read/write
  // creates (and deletes) a temp file — measured at ~0.3 ms/call of pure
  // syscall churn, which dominates when the rasters are tens of bytes
  // and the corpus is tens of thousands of frames (the r9 close put
  // +25 s across the multimodal family on it). In-memory streams are
  // strictly better at these sizes. The switch IS JVM-global ImageIO
  // state, so it is applied explicitly (idempotently) at the top of the
  // two encode/decode entry points below rather than as an
  // object-initializer side effect — other code in the same driver or
  // executor process never pays it unless this module's codecs run.
  private def disableImageIoFileCache(): Unit = ImageIO.setUseCache(false)

  /** Real PNG bytes of a w×h gray raster with pixel function `px`
    * (TYPE_BYTE_GRAY). PNG is lossless, so the decode side recovers the
    * exact gray values; runs per partition on executors. */
  private def grayPng(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    disableImageIoFileCache()
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, px(x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real PNG bytes for image asset `id` (deterministic pixels). */
  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val (w, h) = imageDims(id)
    grayPng(w, h, (x, y) => pixel(id, x, y))
  }

  /** Deterministic audio signal per asset: 32-72 samples of 8-bit PCM,
    * values in the same printable band as pixels (32-95) so the oracle
    * rebuilds the sample string with chr()/string_agg and hashes it. */
  private[graft] def audioSamples(id: Long): Array[Byte] = {
    val n = 32 + (id % 41).toInt
    Array.tabulate(n)(i => (32 + ((7L * i + id) % 64)).toByte)
  }

  /** Real WAV bytes for asset `id`: 8-bit UNSIGNED PCM mono (the WAV
    * convention for 8-bit), so sample bytes round-trip the container
    * exactly. */
  private[graft] def wavBytes(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = audioSamples(id)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Frame count of video asset `id`: 4-12. */
  private[graft] def videoNFrames(id: Long): Int = 4 + (id % 9).toInt

  /** "Scene" id of frame `f` of asset `id` — the content key. 48
    * distinct scenes across the corpus, so different assets share whole
    * frames by construction (re-uploads / edits / mirrored clips share
    * frame content long before they share file hashes — the thing the
    * dupframes query exists to surface). 17·f mod 48 is injective for
    * f < 13, so a single asset never repeats a scene: every duplicate
    * is genuinely CROSS-asset. */
  private[graft] def videoScene(id: Long, f: Int): Int =
    ((id + 17L * f) % 48).toInt

  /** Frame dims depend only on the scene: width 4-8, height 3-6. */
  private[graft] def sceneDims(sc: Int): (Int, Int) = (4 + sc % 5, 3 + sc % 4)

  /** Gray value of pixel (x, y) of scene `sc`, printable band 32-95 so
    * the oracle rebuilds the raster with chr()/string_agg. */
  private[graft] def scenePixel(sc: Int, x: Int, y: Int): Int =
    32 + ((x + 2 * y + 5 * sc) % 64)

  /** Real container bytes for video asset `id`: magic "GVID", int32
    * frame count, then per frame an int32 length + a real PNG of that
    * frame's scene raster (all ints big-endian). The per-frame-payload
    * layout is MJPEG's; PNG is the frame codec because it is lossless
    * (see the object scaladoc). */
  private[graft] def videoBytes(id: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeBytes("GVID")
    val n = videoNFrames(id)
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val sc = videoScene(id, f)
      val (w, h) = sceneDims(sc)
      val png = grayPng(w, h, (x, y) => scenePixel(sc, x, y))
      dos.writeInt(png.length)
      dos.write(png)
      f += 1
    }
    dos.flush()
    out.toByteArray
  }

  /** Parse a GVID container: (declared frame count, a LAZY iterator of
    * raw per-frame PNG payloads). Decode is the caller's choice — a
    * sampler length-skips frames it never decodes. Runs on executors
    * inside the mapPartitions decode contract. */
  private[graft] def readVideoPayloads(payload: Array[Byte]): (Int, Iterator[Array[Byte]]) = {
    val dis = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    val magic = new Array[Byte](4)
    dis.readFully(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID container")
    val n = dis.readInt()
    val frames = Iterator.tabulate(n) { _ =>
      val len = dis.readInt()
      val png = new Array[Byte](len)
      dis.readFully(png)
      png
    }
    (n, frames)
  }

  /** Stride-aware GVID reader: yields (frame_idx, payload) for every
    * `stride`-th frame and `skipBytes` past the rest using their length
    * prefix — skipped frames are neither copied nor decoded (contrast
    * [[readVideoPayloads]], which allocates every payload; this is the
    * reader a sampler wants). Over a ByteArrayInputStream skipBytes is a
    * position bump; over a real file stream it is a seek. */
  private[graft] def sampledFramePayloads(payload: Array[Byte],
                                          stride: Int): Iterator[(Int, Array[Byte])] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val dis = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    val magic = new Array[Byte](4)
    dis.readFully(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID container")
    val n = dis.readInt()
    Iterator.tabulate(n) { f =>
      val len = dis.readInt()
      if (f % stride == 0) {
        val png = new Array[Byte](len)
        dis.readFully(png)
        Some((f, png))
      } else {
        var left = len
        while (left > 0) {
          val k = dis.skipBytes(left)
          if (k <= 0) throw new java.io.EOFException(
            s"GVID truncated while skipping frame $f")
          left -= k
        }
        None
      }
    }.flatten
  }

  /** Decode a gray PNG to its raster bytes in row-major order. */
  private[graft] def pngRaster(png: Array[Byte]): Array[Byte] = {
    disableImageIoFileCache()
    val img = ImageIO.read(new ByteArrayInputStream(png))
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val bytes = new Array[Byte](w * h)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { bytes(i) = raster.getSample(x, y, 0).toByte; i += 1; x += 1 }
      y += 1
    }
    bytes
  }

  final case class AssetMeta(width: Int, height: Int, format: String)
  final case class Asset(asset_id: Long, modality: String,
                         payload: Array[Byte], meta: AssetMeta)

  /** Asset table derived deterministically from `documents`: every
    * payload is a real container built on the executors (the encode leg
    * of the decode loop the oracle pins) — PNG images, WAV audio, GVID
    * frame-sequence video. */
  def assets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        id % 3 match {
          case 0 =>
            val (w, h) = imageDims(id)
            Asset(id, "image", pngBytes(id), AssetMeta(w, h, "image/png"))
          case 1 =>
            // 1-D signal in 2-D metadata: (n_samples, 1) — keeps the
            // decoded-stats contract uniform across modalities.
            Asset(id, "audio", wavBytes(id),
              AssetMeta(audioSamples(id).length, 1, "audio/wav"))
          case _ =>
            // (n_frames, 1): a frame sequence's declared extent, the
            // same 1-D convention the audio rows use.
            Asset(id, "video", videoBytes(id),
              AssetMeta(videoNFrames(id), 1, "video/x-gvid"))
        }
      })
  }

  /** A decoded asset: dimensions, content size and exact integer pixel
    * stats, plus the content hash. For images every field comes from the
    * DECODED raster (row-major byte order), not the metadata — that is
    * the point. */
  final case class DecodedAsset(
      asset_id: Long, modality: String, width: Int, height: Int,
      n_bytes: Long, px_sum: Long, px_min: Int, px_max: Int,
      content_sha256: String)

  /** Distributed decode/feature-extract over the binary column via
    * `mapPartitions` on a typed Dataset — the Scala analogue of a Pandas
    * `mapInPandas` batch UDF: executors stream batches of assets through
    * the decoder, never materializing the table anywhere.
    *
    * image → `ImageIO.read` of the PNG payload; width/height and the
    * pixel bytes come from the decoded raster. audio →
    * `AudioSystem.getAudioInputStream` over the WAV payload; the frame
    * count comes from the parsed header and the sample bytes from the
    * PCM stream. video → the GVID container is parsed and EVERY frame
    * PNG decoded; the content is the concatenated frame rasters in
    * (frame, row, column) order and (width, height) report the parsed
    * frame count as a 1-D extent, mirroring audio. Stats are exact
    * integers and the hash is the canonical content order — all
    * recomputable by the oracle from the generation formulas. */
  def decodeAssets(s: SparkSession, dir: String): Dataset[DecodedAsset] = {
    import s.implicits._
    assets(s, dir).mapPartitions(_.map { a =>
      val (w, h, chunks) = a.modality match {
        case "image" =>
          disableImageIoFileCache()
          val img = ImageIO.read(new ByteArrayInputStream(a.payload))
          val (iw, ih) = (img.getWidth, img.getHeight)
          val bytes = new Array[Byte](iw * ih)
          val raster = img.getRaster
          var i = 0
          var y = 0
          while (y < ih) {
            var x = 0
            while (x < iw) {
              bytes(i) = raster.getSample(x, y, 0).toByte; i += 1; x += 1
            }
            y += 1
          }
          (iw, ih, Iterator.single(bytes))
        case "audio" =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(a.payload))
          // bytes = frames × frame size (1 on the 8-bit mono corpus; a
          // 16-bit/stereo WAV would otherwise be silently half-read)
          val n = ais.getFrameLength.toInt * ais.getFormat.getFrameSize
          val bytes = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = ais.read(bytes, off, n - off)
            if (r < 0) throw new IllegalStateException(
              s"WAV stream of asset ${a.asset_id} ended at $off of $n frames")
            off += r
          }
          (n, 1, Iterator.single(bytes))
        case _ =>
          // STREAMED fold: the lazy frame iterator feeds one decoded
          // raster at a time — per-asset transient memory is O(one
          // frame), not O(total raster bytes), which is what survives
          // real (minutes-long) videos. SHA-256 over incremental
          // update() calls is bit-identical to digesting the
          // concatenation (Merkle–Damgård streaming is the definition),
          // and the running sum/min/max are order-insensitive — the
          // many-frames fixture in MultimodalSpec pins equality against
          // a concatenate-then-digest reference.
          val (nFrames, frames) = readVideoPayloads(a.payload)
          (nFrames, 1, frames.map(pngRaster))
      }
      val (nBytes, sum, mn, mx, sha) = foldContentChunks(chunks)
      DecodedAsset(a.asset_id, a.modality, w, h, nBytes, sum, mn, mx, sha)
    })
  }

  /** Incremental (n_bytes, px_sum, px_min, px_max, sha256-hex) over a
    * stream of content chunks — O(one chunk) transient memory however
    * long the stream. SHA-256 over incremental `update` calls is
    * bit-identical to digesting the concatenation, and sum/min/max are
    * order-insensitive folds; MultimodalSpec's many-frames fixture pins
    * equality against a concatenate-then-digest reference. */
  private[graft] def foldContentChunks(chunks: Iterator[Array[Byte]])
      : (Long, Long, Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    var sum = 0L; var mn = 255; var mx = 0; var nBytes = 0L
    chunks.foreach { chunk =>
      var i = 0
      while (i < chunk.length) {
        val v = chunk(i) & 0xFF
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      nBytes += chunk.length
      md.update(chunk)
    }
    (nBytes, sum, mn, mx, md.digest().map(b => f"$b%02x").mkString)
  }

  /** Oracle-checkable summary of the multimodal pipeline: size, hash
    * and width are of the DECODED content for every modality — raster
    * bytes, PCM frames, concatenated frame rasters — verifying the PNG,
    * WAV and GVID round-trips respectively. */
  def assetSummary(s: SparkSession, dir: String): DataFrame =
    decodeAssets(s, dir).toDF().select(
      col("asset_id"), col("modality"), col("n_bytes"),
      col("content_sha256").as("payload_sha256"),
      col("width").cast("long").as("width"))
      .orderBy("asset_id")

  final case class ResizedAsset(
      asset_id: Long, src_w: Long, src_h: Long, width: Long, height: Long,
      px_sum: Long, resized_sha256: String)

  /** Image RESIZE on the executors — the remaining verb of the
    * decode / feature-extract / resize / frame-sample quartet: decode
    * the PNG payload, downscale the raster to a fixed (tw × th)
    * thumbnail by NEAREST-NEIGHBOR with pure integer source mapping
    * (sx = ⌊x·w/tw⌋, sy = ⌊y·h/th⌋ — no float filter kernels, so the
    * resampled bytes are engine-reproducible), and report exact stats +
    * the sha256 of the resized raster in row-major order. The oracle
    * re-derives the same thumbnail from the pixel formula with the same
    * floor arithmetic and hashes it — pinning decode, the index mapping
    * and the byte order end to end. Same `mapPartitions` batch contract
    * as [[decodeAssets]]; a real resampling filter (area/bilinear) slots
    * into the same loop, trading oracle exactness for quality, which is
    * why nearest stays the checked default. */
  def resizeImages(s: SparkSession, dir: String,
                   tw: Int = 3, th: Int = 2): DataFrame = {
    import s.implicits._
    assets(s, dir).filter(col("modality") === "image")
      .mapPartitions(_.map { a =>
        disableImageIoFileCache()
        val img = ImageIO.read(new ByteArrayInputStream(a.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val bytes = new Array[Byte](tw * th)
        var sum = 0L
        var i = 0
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val v = raster.getSample(x * w / tw, y * h / th, 0)
            bytes(i) = v.toByte; sum += v; i += 1; x += 1
          }
          y += 1
        }
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(bytes).map(b => f"$b%02x").mkString
        ResizedAsset(a.asset_id, w.toLong, h.toLong, tw.toLong, th.toLong,
          sum, sha)
      }).toDF().orderBy("asset_id")
  }

  final case class SampledFrame(asset_id: Long, frame_idx: Long, frame_sha: String)

  /** Frame sampling: REAL decode of every `stride`-th frame of the GVID
    * container — parse the header, `skipBytes` past non-sampled frame
    * payloads via their length prefix (never copied, never decoded —
    * [[sampledFramePayloads]], exactly what a production frame sampler
    * does with an MJPEG index), PNG-decode the sampled ones and hash the
    * decoded raster. Same `mapPartitions` executor contract as
    * [[decodeAssets]]; only (asset_id, frame_idx, sha) rows leave the
    * partition — frame bytes never move. */
  def frameSample(s: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    import s.implicits._
    assets(s, dir).filter(col("modality") === "video")
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.flatMap { a =>
          sampledFramePayloads(a.payload, stride).map { case (f, png) =>
            md.reset()
            SampledFrame(a.asset_id, f.toLong,
              md.digest(pngRaster(png)).map(b => f"$b%02x").mkString)
          }.toVector
        }
      }
      .toDF()
      .orderBy("asset_id", "frame_idx")
  }

  /** Cross-asset duplicate frames: every frame hash sampled from ≥ 2
    * DISTINCT video assets, with how many assets and how many sampled
    * frames carry it — the video-dedup primitive (re-uploads, edits and
    * mirrored clips share exact frame content long before they share
    * whole-file hashes). Consumes [[frameSample]]'s hashes of the
    * DECODED frame rasters; a perceptual hash slots in at the same
    * column.
    *
    * One exchange: the groupBy on the 32-byte sha (frame bodies were
    * already dropped by frameSample — only (asset_id, sha) rows move);
    * count(distinct) folds into the same aggregate via Spark's expand
    * rewrite, and frameSample's presentation sort is eliminated under
    * the aggregate (verified plan property, see DocPipeline). At 100 TB
    * the exchange carries one row per sampled frame — the scan of the
    * video payloads dominates, as it must. */
  def dupFrames(s: SparkSession, dir: String, stride: Int = 4): DataFrame =
    frameSample(s, dir, stride)
      .groupBy("frame_sha")
      .agg(countDistinct(col("asset_id")).as("n_assets"),
        count(lit(1)).as("n_frames"))
      .filter(col("n_assets") >= 2)
      .orderBy("frame_sha")

  final case class AudioWindow(asset_id: Long, off: Long, fp_sha: String)

  /** AUDIO fingerprinting — [[dupFrames]]' analogue for the audio
    * modality (Shazam-style constellation hashing, reduced to its core:
    * hash every length-`win` sliding window of the DECODED PCM sample
    * stream, then find window hashes shared across assets — re-uploads,
    * trims and concatenations collide on their overlapping windows long
    * before whole-file hashes agree). The decode is the real WAV parse
    * ([[decodeAssets]]' audio leg); only (asset_id, window-hash) rows
    * leave the partition — sample bytes never move, and the one
    * exchange is the groupBy on the 32-byte hash, bounded by window
    * count. */
  private[graft] def audioFingerprints(s: SparkSession, dir: String,
                                       win: Int = 8): Dataset[AudioWindow] = {
    import s.implicits._
    assets(s, dir).filter(col("modality") === "audio")
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.flatMap { a =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(a.payload))
          // bytes = frames × frame size (1 on the 8-bit mono corpus; a
          // 16-bit/stereo WAV would otherwise be silently half-read)
          val n = ais.getFrameLength.toInt * ais.getFormat.getFrameSize
          val bytes = new Array[Byte](n)
          var offr = 0
          while (offr < n) {
            val r = ais.read(bytes, offr, n - offr)
            if (r < 0) throw new IllegalStateException(
              s"WAV stream of asset ${a.asset_id} ended at $offr of $n")
            offr += r
          }
          (0 to n - win).map { o =>
            md.reset()
            AudioWindow(a.asset_id, o.toLong,
              md.digest(java.util.Arrays.copyOfRange(bytes, o, o + win))
                .map(b => f"$b%02x").mkString)
          }.toVector
        }
      }
  }

  /** Cross-asset duplicate audio windows: every window hash present in
    * ≥ 2 distinct assets, with the asset and window counts — the audio
    * near-dup primitive. Same shape and oracle stance as [[dupFrames]]:
    * the generation formula stands in as the oracle's sample stream,
    * decode fidelity itself is pinned by multimodal_summary. */
  def dupAudio(s: SparkSession, dir: String, win: Int = 8): DataFrame =
    audioFingerprints(s, dir, win)
      .groupBy("fp_sha")
      .agg(countDistinct(col("asset_id")).as("n_assets"),
        count(lit(1)).as("n_windows"))
      .filter(col("n_assets") >= 2)
      .orderBy("fp_sha")

  final case class SceneCut(asset_id: Long, frame_idx: Long, diff_sum: Long,
                            is_cut: Boolean)

  /** SCENE-CHANGE detection — the shot-boundary primitive every video
    * curation pipeline runs before sampling ("keyframe per shot", "drop
    * static segments"): consecutive decoded frames are compared on the
    * canonical 8×8 nearest-neighbor grid (the [[imageAHashes]] resample
    * rule, which makes frames of DIFFERENT dimensions comparable), and a
    * boundary is a cut when the summed absolute gray difference reaches
    * `tau`. All arithmetic after the PNG decode is exact integers, so
    * the oracle rebuilds identical diffs from the pixel-generation
    * formula (decode fidelity itself is pinned by multimodal_summary —
    * the [[dupFrames]] stance). τ=1200 sits between this corpus's
    * within-gradient diffs (min 1056) and its median 1704, so the flag
    * genuinely discriminates (53 non-cuts / 1272 cuts at sf0.01).
    *
    * Scale shape: one pass over video payloads, each frame decoded once
    * and held only as its 64-cell grid (the previous frame's grid is
    * the only state); output rows are (asset, frame) pairs — payload
    * bytes never leave the partition. */
  def sceneCuts(s: SparkSession, dir: String, tau: Long = 1200L): DataFrame = {
    import s.implicits._
    assets(s, dir).filter(col("modality") === "video")
      .mapPartitions { it =>
        disableImageIoFileCache()
        it.flatMap { a =>
          val (_, frames) = readVideoPayloads(a.payload)
          val grids = frames.map { png =>
            val img = ImageIO.read(new ByteArrayInputStream(png))
            val (w, h) = (img.getWidth, img.getHeight)
            val r = img.getRaster
            Array.tabulate(64)(b => r.getSample((b % 8) * w / 8, (b / 8) * h / 8, 0))
          }.toVector
          grids.indices.drop(1).map { f =>
            var d = 0L
            var b = 0
            while (b < 64) { d += math.abs(grids(f)(b) - grids(f - 1)(b)); b += 1 }
            SceneCut(a.asset_id, f.toLong, d, d >= tau)
          }
        }
      }.toDF().orderBy("asset_id", "frame_idx")
  }

  final case class QuietWindow(asset_id: Long, off: Long, rng: Long)

  /** LOW-DYNAMIC-RANGE audio segmentation — the voice-activity-style
    * sweep ("find and cut the quiet stretches") reduced to its exact
    * core: every length-`win` sliding window of the DECODED PCM stream
    * is scored by its amplitude range (max − min, exact integers), a
    * window is quiet when the range is ≤ `tau`, and per asset the
    * output reports window/quiet counts, the quiet-offset sum (so the
    * oracle pins WHICH windows, not just how many) and the longest
    * consecutive quiet run (the islands/gaps trick: off − rank is
    * constant within a run — a per-asset window over bounded offsets).
    * On this corpus the 7-step mod-64 sample walk makes the range
    * bimodal (49 unwrapped / 57 wrapped), so τ=52 discriminates
    * exactly; real audio gives a continuous range distribution, same
    * plan. Decode is the real WAV parse ([[audioFingerprints]]' leg);
    * sample bytes never leave the partition. */
  def quietSegments(s: SparkSession, dir: String, win: Int = 8,
                    tau: Long = 52L): DataFrame = {
    import s.implicits._
    val wins = assets(s, dir).filter(col("modality") === "audio")
      .mapPartitions { it =>
        it.flatMap { a =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(a.payload))
          // bytes = frames × frame size (1 on the 8-bit mono corpus; a
          // 16-bit/stereo WAV would otherwise be silently half-read)
          val n = ais.getFrameLength.toInt * ais.getFormat.getFrameSize
          val bytes = new Array[Byte](n)
          var offr = 0
          while (offr < n) {
            val r = ais.read(bytes, offr, n - offr)
            if (r < 0) throw new IllegalStateException(
              s"WAV stream of asset ${a.asset_id} ended at $offr of $n")
            offr += r
          }
          (0 to n - win).map { o =>
            var mn = 256; var mx = -1
            var j = 0
            while (j < win) {
              val v = bytes(o + j) & 0xff
              if (v < mn) mn = v
              if (v > mx) mx = v
              j += 1
            }
            QuietWindow(a.asset_id, o.toLong, (mx - mn).toLong)
          }
        }
      }.toDF()
    val quiet = wins.filter(col("rng") <= tau)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("asset_id").orderBy("off")
    val runs = quiet
      .withColumn("grp", col("off") - row_number().over(wRun))
      .groupBy("asset_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("asset_id").agg(max("run").as("longest_quiet_run"))
    wins.groupBy("asset_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("rng") <= tau, 1L).otherwise(0L)).as("n_quiet"),
        sum(when(col("rng") <= tau, col("off")).otherwise(0L)).as("sum_quiet_off"))
      .join(runs, Seq("asset_id"), "left")
      .na.fill(0L, Seq("longest_quiet_run"))
      .orderBy("asset_id")
  }

  final case class Keyframe(asset_id: Long, shot_idx: Long, start_frame: Long,
                            n_frames: Long, key_frame: Long, key_sum: Long)

  /** KEYFRAME-PER-SHOT selection — the step video curation runs right
    * after shot-boundary detection ("one representative frame per shot,
    * drop the rest"): frames segment into shots at the [[sceneCuts]]
    * boundaries (diff ≥ τ on the canonical 8×8 grid starts a new shot),
    * and each shot's keyframe is its brightest frame — argmax of the
    * summed 8×8 grid, ties to the EARLIEST frame (a deterministic,
    * decode-exact stand-in for the sharpness/entropy scorers production
    * uses; the plumbing — decode, grid, segment, per-shot argmax — is
    * identical). All post-decode arithmetic is exact integers, so the
    * oracle replays shots and argmaxes from the pixel-generation formula
    * (decode fidelity pinned by multimodal_summary).
    *
    * Scale shape: one pass over video payloads, one frame decoded at a
    * time, state = previous grid + current-shot accumulator (O(1) per
    * asset); output is one row per shot. Payload bytes never leave the
    * partition — the downstream image pipeline receives (asset, frame)
    * pointers, the frame-sampler re-decode pattern. */
  def keyframes(s: SparkSession, dir: String, tau: Long = 1200L): DataFrame = {
    import s.implicits._
    assets(s, dir).filter(col("modality") === "video")
      .mapPartitions { it =>
        disableImageIoFileCache()
        it.flatMap { a =>
          val (_, frames) = readVideoPayloads(a.payload)
          val grids = frames.map { png =>
            val img = ImageIO.read(new ByteArrayInputStream(png))
            val (w, h) = (img.getWidth, img.getHeight)
            val r = img.getRaster
            Array.tabulate(64)(b => r.getSample((b % 8) * w / 8, (b / 8) * h / 8, 0))
          }.toVector
          val sums = grids.map(_.map(_.toLong).sum)
          // shot index per frame: cumulative count of cut boundaries
          val shotOf = new Array[Int](grids.length)
          var f = 1
          while (f < grids.length) {
            var d = 0L
            var b = 0
            while (b < 64) { d += math.abs(grids(f)(b) - grids(f - 1)(b)); b += 1 }
            shotOf(f) = shotOf(f - 1) + (if (d >= tau) 1 else 0)
            f += 1
          }
          grids.indices.groupBy(shotOf).toSeq.sortBy(_._1).map {
            case (shot, fs) =>
              val key = fs.maxBy(i => (sums(i), -i))
              Keyframe(a.asset_id, shot.toLong, fs.min.toLong, fs.size.toLong,
                key.toLong, sums(key))
          }
        }
      }.toDF().orderBy("asset_id", "shot_idx")
  }

  final case class AHash(asset_id: Long, ahash_lo: Long, ahash_hi: Long)

  /** Average-hash (aHash) of every image asset from its DECODED raster:
    * nearest-neighbor resample to the canonical 8×8 grid (sample at
    * (i·w/8, j·h/8) — integer floor, the [[resizeImages]] rule), then
    * one bit per cell set iff the cell is at least the 64-cell mean,
    * compared exactly as 64·g ≥ Σg (no float mean). The 64 bits ride as
    * two BIGINT halves (bits 0-31 / 32-63) so both engines stay inside
    * signed-64 arithmetic. Everything after the PNG decode is exact
    * integer math, so the oracle rebuilds identical hashes from the
    * pixel-generation formula. */
  private[graft] def imageAHashes(s: SparkSession, dir: String): Dataset[AHash] = {
    import s.implicits._
    assets(s, dir).filter(col("modality") === "image")
      .mapPartitions(_.map { a =>
        disableImageIoFileCache()
        val img = ImageIO.read(new ByteArrayInputStream(a.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val g = new Array[Int](64)
        var sum = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val v = raster.getSample(i * w / 8, j * h / 8, 0)
            g(j * 8 + i) = v; sum += v; i += 1
          }
          j += 1
        }
        var lo = 0L
        var hi = 0L
        var b = 0
        while (b < 64) {
          if (64L * g(b) >= sum) {
            if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
          }
          b += 1
        }
        AHash(a.asset_id, lo, hi)
      })
  }

  /** PERCEPTUAL image near-dup — the cross-format/cross-resolution
    * complement of [[dupFrames]]' exact content hashing: two images
    * that decode to similar-looking rasters (re-encodes, rescales,
    * slight edits) land within a small Hamming distance of each other's
    * [[imageAHashes]], long after their bytes and exact hashes diverge.
    * Output per image: its hash halves and how many other images sit
    * within `maxDist` bits (64-bit Hamming) — the per-asset near-dup
    * degree a curation pass thresholds on.
    *
    * Scale shape — the SimHash banding argument, on images: candidates
    * come from a 4×16-bit band equi-join (pigeonhole: any pair within
    * Hamming 3 of 64 bits agrees exactly on ≥ 1 of 4 bands), so the
    * exchange is keyed by (band_idx, band_value) and pair enumeration
    * is bounded by band-bucket occupancy — never all-pairs. The exact
    * `bit_count(xor)` filter then prunes candidates to true near-dups.
    * Structured corpora can pile into few band buckets (these synthetic
    * gradients do); at 100 TB the standard remedies are more/narrower
    * bands and a bucket-size cap, same as dedup_simhash documents. The
    * hash relation is localCheckpointed once (~16 B/image) and feeds
    * all four legs; only the initial decode touches payload bytes. */
  def perceptualDupImages(s: SparkSession, dir: String,
                          maxDist: Int = 3): DataFrame = {
    val hashes = imageAHashes(s, dir).toDF().localCheckpoint()
    def band16(c: org.apache.spark.sql.Column, sh: Int) =
      shiftright(c, sh).bitwiseAND(lit(0xFFFFL))
    // r17 (guide §2.3 aggregate-before-shuffle, §2.4 remove exchanges):
    // pair enumeration runs over DISTINCT hash values with
    // multiplicities, not over assets. Re-encodes/rescales of the same
    // content decode to the SAME aHash, so one near-dup class of B
    // assets used to put B band rows in one bucket and B² rows through
    // the candidate self-join + a B²-row distinct + two hash re-joins;
    // the class rollup sends ONE row per distinct hash through the band
    // join and weights the per-asset count arithmetic by class size —
    // per-asset output identical (n_neardup(a) = (m_class − 1) +
    // Σ_{class' within maxDist} m_class'). The exactly-once rule also
    // drops the old distinct: a class pair within Hamming maxDist ≤ 3
    // of 64 bits agrees on ≥ 1 of the 4 bands (pigeonhole), and it is
    // counted only where band_idx = its FIRST agreeing band — the
    // [[nearDupStream]] dedup rule, here as a codegen conjunction.
    val classes = hashes.groupBy(col("ahash_lo").as("lo"), col("ahash_hi").as("hi"))
      .agg(count(lit(1)).as("m"))
    val bands = classes.select(col("lo"), col("hi"), col("m"), posexplode(array(
      band16(col("lo"), 0), band16(col("lo"), 16),
      band16(col("hi"), 0), band16(col("hi"), 16)))
      .as(Seq("band_idx", "band_val")))
    // class order (lo, hi) lexicographic replaces the old ia < ib: each
    // unordered class pair meets once per agreeing band
    val classLt = col("x.lo") < col("y.lo") ||
      (col("x.lo") === col("y.lo") && col("x.hi") < col("y.hi"))
    val firstBand = when(band16(col("x.lo"), 0) === band16(col("y.lo"), 0), 0)
      .when(band16(col("x.lo"), 16) === band16(col("y.lo"), 16), 1)
      .when(band16(col("x.hi"), 0) === band16(col("y.hi"), 0), 2)
      .otherwise(3)
    val classPairs = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") && classLt)
      .filter(bit_count(col("x.lo").bitwiseXOR(col("y.lo"))) +
        bit_count(col("x.hi").bitwiseXOR(col("y.hi"))) <= maxDist)
      .filter(col("x.band_idx") === firstBand)
      .select(col("x.lo").as("la"), col("x.hi").as("ha"), col("x.m").as("ma"),
        col("y.lo").as("lb"), col("y.hi").as("hb"), col("y.m").as("mb"))
    // each side of a qualifying class pair contributes the OTHER side's
    // multiplicity to every asset in it
    val nbr = classPairs
      .select(col("la").as("lo"), col("ha").as("hi"), col("mb").as("w"))
      .unionByName(classPairs
        .select(col("lb").as("lo"), col("hb").as("hi"), col("ma").as("w")))
      .groupBy("lo", "hi").agg(sum(col("w")).as("nbr"))
    hashes
      .join(classes, col("ahash_lo") === col("lo") && col("ahash_hi") === col("hi"))
      .join(nbr, Seq("lo", "hi"), "left")
      .select(col("asset_id"), col("ahash_lo"), col("ahash_hi"),
        (col("m") - 1L + coalesce(col("nbr"), lit(0L))).as("n_neardup"))
      .orderBy("asset_id")
  }
}
