package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in partition-sized
  * batches.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio
  * codecs, so `decodeStub` derives deterministic fake features (byte
  * histograms) from the payload. Everything around it is the real
  * production shape: binary column + metadata struct schema, batched
  * `mapPartitions` (one model/codec init per partition, the same
  * contract as an mapInPandas/ONNX runtime at scale), fixed-width
  * feature vectors, partition-count preservation.
  */
object Multimodal {

  /** One media item: payload + typed metadata (the multimodal schema). */
  case class MediaItem(doc_id: Long, media_type: String, n_bytes: Long,
    payload: Array[Byte])

  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
    n_frames: Int, features: Array[Float])

  val FeatureDim = 16

  /** Media table derived in-flight from `documents` (payload = UTF-8
    * bytes standing in for encoded media; media_type round-robins so
    * the type-dispatch path is exercised).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image/fake"), lit("audio/fake"),
          lit("video/fake")), (col("doc_id") % 3 + 1).cast("int"))
          .as("media_type"),
        length(col("text")).cast("long").as("n_bytes"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaItem]
  }

  /** STUB decoder: a deterministic 16-bin byte histogram, L1-normalized
    * — stands in for image decode + CNN/CLIP feature extraction. Real
    * implementation would initialize a codec/model once per partition
    * (exactly where this function's `init` comment sits) and run
    * batched inference.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) % FeatureDim) += 1f
      i += 1
    }
    val total = math.max(1f, payload.length.toFloat)
    var j = 0
    while (j < FeatureDim) { hist(j) /= total; j += 1 }
    hist
  }

  /** "Frame sampling" for video payloads: every k-th 64-byte chunk. */
  private def sampleFrames(payload: Array[Byte], k: Int): Seq[Array[Byte]] =
    payload.grouped(64).zipWithIndex.collect {
      case (chunk, idx) if idx % k == 0 => chunk
    }.toSeq

  /** Feature extraction over the media table — one decoder init per
    * partition, batch loop inside; output is fixed-width vectors ready
    * for the q40/q41 ANN operators.
    */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { items =>
      // [decoder/model init happens here — once per partition]
      items.map { m =>
        val frames: Seq[Array[Byte]] = m.media_type match {
          case "video/fake" => sampleFrames(m.payload, 4)
          case _ => Seq(m.payload)
        }
        val feats = frames.map(decodeStub)
        // mean-pool frame features
        val pooled = new Array[Float](FeatureDim)
        feats.foreach { f =>
          var i = 0; while (i < FeatureDim) { pooled(i) += f(i); i += 1 }
        }
        var i = 0
        while (i < FeatureDim) { pooled(i) /= feats.size.toFloat; i += 1 }
        MediaFeatures(m.doc_id, m.media_type, m.n_bytes, feats.size, pooled)
      }
    }
  }

  /** q70: multimodal feature extraction summary — deterministic, so the
    * rows-only gate is stable across runs.
    */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("n_frames"),
        round(expr("aggregate(features, 0D, (a, x) -> a + CAST(x AS DOUBLE))"), 6)
          .as("feat_l1"),
        size(col("features")).as("dim"))
      .orderBy(col("doc_id"))
  }

  // --- real image decode path (no stub): the JDK ships PNG/BMP/GIF
  // codecs in javax.imageio, so the encode→decode→feature pipeline
  // below is the production shape end to end — only the IMAGE
  // CONTENT is synthetic (no image files exist in the test data).

  /** One encoded image: PNG payload + the metadata a real ingest
    * pipeline would carry alongside the binary column.
    */
  case class ImageItem(doc_id: Long, width: Int, height: Int,
    payload: Array[Byte])

  /** Deterministic RGB for pixel (x, y) of image `id` — a 64-bit mix
    * so every image differs and every pixel is reproducible anywhere
    * (the property the round-trip spec leans on).
    */
  private[graft] def pixel(id: Long, x: Int, y: Int): Int = {
    var h = id * 0x9E3779B97F4A7C15L + x * 0xC2B2AE3D27D4EB4FL + y
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    (h & 0xFFFFFF).toInt
  }

  /** Synthetic-but-REAL image table: per document a deterministic RGB
    * image (sizes vary 16–32 px so resize paths can't assume a fixed
    * shape), encoded to actual PNG bytes with the JDK's ImageIO —
    * one encoder per partition, batch loop inside, the same
    * `mapPartitions` contract as a production media ingest.
    */
  def imageTable(spark: SparkSession, dir: String): Dataset[ImageItem] = {
    import spark.implicits._
    Tables.spread(Tables(spark, dir, "documents").select(col("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        // codec init once per partition: the PNG ImageWriter is looked
        // up in the IIORegistry here and reused for every image (a
        // per-row ImageIO.write would repeat the registry scan +
        // writer allocation per image)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val out = ids.map { id =>
          val w = 16 + (id % 3).toInt * 8
          val h = 16 + (id % 5).toInt * 4
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, pixel(id, x, y)); x += 1 }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
          writer.setOutput(ios)
          writer.write(img)
          ios.close()
          ImageItem(id, w, h, baos.toByteArray)
        }
        // ++ is by-name: the dispose runs when the data iterator is
        // exhausted, i.e. at end-of-partition
        out ++ { writer.dispose(); Iterator.empty }
      }
  }

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
    n_bytes: Long, features: Array[Float])

  val GridDim = 4

  /** REAL decode + resize + feature extraction: ImageIO-decode the
    * PNG payload (lossless, so pixels are bit-identical to what was
    * encoded), grid-resize to [[GridDim]]×[[GridDim]] by cell
    * averaging, one mean-luminance float per cell. Pixel sums are
    * integer-exact; the only float op is the final per-cell divide —
    * deterministic across runs, partitionings, and engines.
    */
  def decodeImageFeatures(images: Dataset[ImageItem]): Dataset[ImageFeatures] = {
    import images.sparkSession.implicits._
    images.mapPartitions { items =>
      // decoder init once per partition: one PNG ImageReader from the
      // IIORegistry, reset via setInput per image (ImageIO.read would
      // redo the registry lookup per row, and returns null instead of
      // throwing on undecodable bytes)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      val out = items.map { im =>
        // ImageInputStream documents close() as required — its cache
        // blocks are not GC-driven
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(im.payload))
        val img =
          try {
            reader.setInput(iis, true, true)
            reader.read(0)
          } catch {
            case e: java.io.IOException =>
              throw new IllegalArgumentException(
                s"doc ${im.doc_id}: undecodable image payload", e)
          } finally iis.close()
        require(img.getWidth == im.width && img.getHeight == im.height,
          s"decoded dims ${img.getWidth}x${img.getHeight} != metadata")
        val sums = new Array[Long](GridDim * GridDim)
        val counts = new Array[Long](GridDim * GridDim)
        var y = 0
        while (y < im.height) {
          val cy = y * GridDim / im.height
          var x = 0
          while (x < im.width) {
            val cx = x * GridDim / im.width
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            sums(cy * GridDim + cx) += lum
            counts(cy * GridDim + cx) += 1
            x += 1
          }
          y += 1
        }
        val feats = Array.tabulate(GridDim * GridDim) { i =>
          (sums(i).toDouble / (3.0 * counts(i))).toFloat
        }
        ImageFeatures(im.doc_id, im.width, im.height,
          im.payload.length.toLong, feats)
      }
      out ++ { reader.dispose(); Iterator.empty }
    }
  }

  /** q71: real image decode/resize/feature summary — encode→decode is
    * lossless PNG, features are integer-sum-exact, so the rows-only
    * gate is bit-stable across runs and partitionings.
    */
  def q71(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeImageFeatures(imageTable(spark, dir))
      .select(col("doc_id"), col("width"), col("height"), col("n_bytes"),
        size(col("features")).as("dim"),
        round(expr("aggregate(features, 0D, (a, x) -> a + CAST(x AS DOUBLE))"), 4)
          .as("feat_l1"))
      .orderBy(col("doc_id"))
  }

  /** A resized image next to its source metadata — media OUT, not
    * features: the transform a thumbnail/preprocess stage persists.
    */
  case class ResizedImage(doc_id: Long, width: Int, height: Int,
    new_width: Int, new_height: Int, payload: Array[Byte])

  /** REAL media-out resize (round 9 — [[decodeImageFeatures]] reduces
    * to features; production preprocessing also needs the transformed
    * MEDIA back as a binary column): ImageIO-decode, 2×2 average-pool
    * (per-channel integer sums, one floor division per cell —
    * bit-deterministic; odd edges pool the 1–2 surviving pixels), PNG
    * re-encode. Same mapPartitions contract as the rest of the file:
    * one reader + one writer per partition, map-only, no shuffle —
    * at 100 TB this pipelines inside the scan stage and writes
    * straight to a binary-column sink.
    */
  def resizeImages(images: Dataset[ImageItem]): Dataset[ResizedImage] = {
    import images.sparkSession.implicits._
    images.mapPartitions { items =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      val out = items.map { im =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(im.payload))
        val img =
          try { reader.setInput(iis, true, true); reader.read(0) }
          finally iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        val (nw, nh) = ((w + 1) / 2, (h + 1) / 2)
        val small = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var cy = 0
        while (cy < nh) {
          var cx = 0
          while (cx < nw) {
            var r = 0; var g = 0; var b = 0; var n = 0
            var dy = 0
            while (dy < 2) {
              val y = cy * 2 + dy
              var dx = 0
              while (dx < 2) {
                val x = cx * 2 + dx
                if (x < w && y < h) {
                  val rgb = img.getRGB(x, y)
                  r += (rgb >> 16) & 0xFF; g += (rgb >> 8) & 0xFF
                  b += rgb & 0xFF; n += 1
                }
                dx += 1
              }
              dy += 1
            }
            small.setRGB(cx, cy, ((r / n) << 16) | ((g / n) << 8) | (b / n))
            cx += 1
          }
          cy += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(small)
        ios.close()
        ResizedImage(im.doc_id, w, h, nw, nh, baos.toByteArray)
      }
      out ++ { reader.dispose(); writer.dispose(); Iterator.empty }
    }
  }

  /** q116: media-out image resize summary. `out_luma` is the exact
    * integer luminance sum of the RESIZED image's pixels (re-decoded
    * from the output PNG), so the gate value certifies the whole
    * decode→pool→encode chain, not just the byte count.
    */
  def q116(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resizeImages(imageTable(spark, dir))
      .mapPartitions { items =>
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        val out = items.map { rz =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(rz.payload))
          val img =
            try { reader.setInput(iis, true, true); reader.read(0) }
            finally iis.close()
          var luma = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              luma += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          (rz.doc_id, rz.width, rz.height, rz.new_width, rz.new_height,
            rz.payload.length.toLong, luma)
        }
        out ++ { reader.dispose(); Iterator.empty }
      }
      .toDF("doc_id", "width", "height", "new_width", "new_height",
        "n_bytes_out", "out_luma")
      .orderBy(col("doc_id"))
  }

  // --- video: a typed frame container + sampling that never decodes
  // what it skips. No video codec ships in the JDK, so the CONTAINER
  // is this engine's own deterministic format (length-prefixed PNG
  // frames behind an int32 header) — the codec seam is stubbed, the
  // Spark-side plumbing (binary column, seek-don't-decode sampling,
  // per-frame explode, partition-level reader reuse) is real.

  /** One "video": int32 n_frames, then per frame int32 length + PNG
    * bytes (big-endian, [[java.nio.ByteBuffer]]'s default).
    */
  case class VideoItem(doc_id: Long, n_frames: Int, payload: Array[Byte])

  /** One sampled frame row — the explode shape a frame-level feature
    * stage consumes. `luma` is the exact integer luminance sum of the
    * decoded frame.
    */
  case class SampledFrame(doc_id: Long, frame_idx: Int, width: Int,
    height: Int, n_bytes: Int, luma: Long)

  val FrameDim = 16

  /** Deterministic video table: 4–10 frames per doc, every frame a
    * real 16×16 PNG (frame f of doc d draws pixels from
    * `pixel(d ⊕ (f+1) << 40, x, y)` so frames differ within a video).
    */
  def videoTable(spark: SparkSession, dir: String): Dataset[VideoItem] = {
    import spark.implicits._
    Tables.spread(Tables(spark, dir, "documents").select(col("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val out = ids.map { id =>
          val nFrames = 4 + (id % 7).toInt
          val frames = (0 until nFrames).map { f =>
            val img = new java.awt.image.BufferedImage(
              FrameDim, FrameDim, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < FrameDim) {
              var x = 0
              while (x < FrameDim) {
                img.setRGB(x, y, pixel(id ^ ((f + 1).toLong << 40), x, y))
                x += 1
              }
              y += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            val ios =
              new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
            writer.setOutput(ios)
            writer.write(img)
            ios.close()
            baos.toByteArray
          }
          val size = 4 + frames.map(4 + _.length).sum
          val buf = java.nio.ByteBuffer.allocate(size)
          buf.putInt(nFrames)
          frames.foreach { fb => buf.putInt(fb.length); buf.put(fb) }
          VideoItem(id, nFrames, buf.array())
        }
        out ++ { writer.dispose(); Iterator.empty }
      }
  }

  /** Frame sampling: decode every `everyK`-th frame, SEEK past the
    * rest — the length prefixes let the walk skip a frame in O(1)
    * without touching its bytes, which is the entire point of
    * sampling at scale (a 1-fps sample of 30-fps video reads 1/30th
    * of the codec work; spec-asserted by planting CORRUPT bytes in a
    * skipped frame). Map-only, one reader per partition, one output
    * row per sampled frame.
    */
  def sampleFrameRows(videos: Dataset[VideoItem],
      everyK: Int): Dataset[SampledFrame] = {
    import videos.sparkSession.implicits._
    require(everyK >= 1)
    videos.mapPartitions { items =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      val out = items.flatMap { v =>
        val buf = java.nio.ByteBuffer.wrap(v.payload)
        val n = buf.getInt()
        require(n == v.n_frames,
          s"doc ${v.doc_id}: container header $n != metadata ${v.n_frames}")
        (0 until n).iterator.flatMap { f =>
          val len = buf.getInt()
          if (f % everyK != 0) {
            buf.position(buf.position() + len) // skipped: NEVER decoded
            Iterator.empty
          } else {
            val fb = new Array[Byte](len)
            buf.get(fb)
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(fb))
            val img =
              try { reader.setInput(iis, true, true); reader.read(0) }
              finally iis.close()
            var luma = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                luma +=
                  ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            Iterator.single(SampledFrame(v.doc_id, f, img.getWidth,
              img.getHeight, len, luma))
          }
        }
      }
      out ++ { reader.dispose(); Iterator.empty }
    }
  }

  /** q117: video frame-sample summary — one row per sampled frame
    * (every 3rd), exact integer luminance per frame.
    */
  def q117(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrameRows(videoTable(spark, dir), everyK = 3)
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // --- audio: raw 16-bit PCM in a binary column, windowed DSP
  // features. PCM needs no codec, so unlike image (real PNG) and
  // video (container + real frames), EVERYTHING here is real — only
  // the waveform content is synthetic.

  /** One audio clip: little-endian int16 PCM samples + the metadata
    * column (sample count) an ingest pipeline carries.
    */
  case class AudioItem(doc_id: Long, n_samples: Int, pcm: Array[Byte])

  /** One analysis window: exact integer features — `energy` = Σx²
    * (int64), `zcr` = sign-change count, `peak` = max |x|. No float
    * touches the path, so the gate is bit-stable by construction.
    */
  case class AudioWindow(doc_id: Long, window_idx: Int, n_samples: Int,
    energy: Long, zcr: Int, peak: Int)

  val AudioWindowSize = 256

  /** Deterministic int16 sample `i` of clip `id`: two integer
    * triangle waves (id-derived periods) + small hash noise — varied,
    * reproducible anywhere, zero floating point.
    */
  private[graft] def pcmSample(id: Long, i: Int): Short = {
    def tri(period: Int, amp: Int): Int = {
      val ph = i % period
      val half = period / 2
      val v = if (ph < half) ph * 2 * amp / half - amp
        else amp - (ph - half) * 2 * amp / half
      v
    }
    val noise = ((pixel(id, i & 0xFFFF, i >>> 16) & 0xFF) - 128) * 4
    val v = tri(64 + (id % 37).toInt, 9000) +
      tri(180 + (id % 101).toInt, 6000) + noise
    math.max(Short.MinValue.toInt, math.min(Short.MaxValue.toInt, v)).toShort
  }

  /** Synthetic-but-real audio table: 2000–4095 samples per doc,
    * serialized as actual little-endian int16 PCM bytes.
    */
  def audioTable(spark: SparkSession, dir: String): Dataset[AudioItem] = {
    import spark.implicits._
    Tables.spread(Tables(spark, dir, "documents").select(col("doc_id")))
      .as[Long]
      .map { id =>
        val n = 2000 + (id % 2096).toInt
        val buf = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) { buf.putShort(pcmSample(id, i)); i += 1 }
        AudioItem(id, n, buf.array())
      }
  }

  /** Windowed audio feature extraction: parse PCM bytes → int16,
    * split into [[AudioWindowSize]]-sample windows (last window is
    * the remainder), per window exact integer energy / zero-crossing
    * count / peak. Map-only explode shape (one row per window) —
    * the same contract a real spectrogram/VAD stage runs, with the
    * FFT seam replaced by integer features so the gate stays
    * bit-deterministic.
    */
  def audioWindows(audio: Dataset[AudioItem]): Dataset[AudioWindow] = {
    import audio.sparkSession.implicits._
    audio.flatMap { a =>
      require(a.pcm.length == a.n_samples * 2,
        s"doc ${a.doc_id}: PCM byte length ${a.pcm.length} != metadata")
      val buf = java.nio.ByteBuffer.wrap(a.pcm)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val nWin = (a.n_samples + AudioWindowSize - 1) / AudioWindowSize
      (0 until nWin).iterator.map { w =>
        val start = w * AudioWindowSize
        val end = math.min(start + AudioWindowSize, a.n_samples)
        var energy = 0L
        var zcr = 0
        var peak = 0
        var prevSign = 0
        var i = start
        while (i < end) {
          val x = buf.getShort(i * 2).toInt
          energy += x.toLong * x
          val s = Integer.signum(x)
          if (s != 0) {
            if (prevSign != 0 && s != prevSign) zcr += 1
            prevSign = s
          }
          if (math.abs(x) > peak) peak = math.abs(x)
          i += 1
        }
        AudioWindow(a.doc_id, w, end - start, energy, zcr, peak)
      }
    }
  }

  /** q118: audio window features — one row per 256-sample window,
    * every value an exact integer.
    */
  def q118(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioWindows(audioTable(spark, dir))
      .toDF()
      .orderBy(col("doc_id"), col("window_idx"))
  }
}
