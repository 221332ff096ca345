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

  /** Deterministic PHOTO-LIKE content: bilinear interpolation of a
    * per-image 5×5 random lattice (channels from [[pixel]] at lattice
    * coords) — spatially coherent the way photographs are, which is
    * the operating assumption of perceptual hashing ([[q119]]): a
    * white-noise image has no perceptual content for a hash to
    * preserve, and a pooled rendition of noise genuinely cannot
    * reconstruct which side of a grid boundary a pixel's variance
    * belonged to. Pure IEEE add/mul on hash-derived lattice bytes —
    * no libm — so the value is bit-identical on every JVM.
    */
  private[graft] def smoothPixel(id: Long, x: Int, y: Int,
      w: Int, h: Int): Int = {
    val gx = x.toDouble * 4 / w
    val gy = y.toDouble * 4 / h
    val i = gx.toInt; val j = gy.toInt
    val fx = gx - i; val fy = gy - j
    var rgb = 0
    var ch = 0
    while (ch < 3) {
      def l(a: Int, b: Int): Double =
        ((pixel(id, a, b) >> (8 * ch)) & 0xFF).toDouble
      val v = l(i, j) * (1 - fx) * (1 - fy) + l(i + 1, j) * fx * (1 - fy) +
        l(i, j + 1) * (1 - fx) * fy + l(i + 1, j + 1) * fx * fy
      rgb |= (v.toInt & 0xFF) << (8 * ch)
      ch += 1
    }
    rgb
  }

  /** Synthetic-but-REAL image table: per document a deterministic RGB
    * image (sizes vary 16–32 px so resize paths can't assume a fixed
    * shape), encoded to actual PNG bytes with the JDK's ImageIO —
    * one encoder per partition, batch loop inside, the same
    * `mapPartitions` contract as a production media ingest.
    * `content` supplies the pixel function — default the [[pixel]]
    * noise mixer (maximal-entropy content, what the codec round-trip
    * specs pin); [[photoTable]] passes [[smoothPixel]].
    */
  def imageTable(spark: SparkSession, dir: String,
      content: (Long, Int, Int, Int, Int) => Int =
        (id, x, y, _, _) => pixel(id, x, y)): Dataset[ImageItem] = {
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
            while (x < w) {
              img.setRGB(x, y, content(id, x, y, w, h)); x += 1
            }
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

  /** [[imageTable]] with [[smoothPixel]] content — the photo-like
    * corpus the perceptual-hash operators run on.
    */
  def photoTable(spark: SparkSession, dir: String): Dataset[ImageItem] =
    imageTable(spark, dir, smoothPixel)

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
  /** One 2×2-box-mean downscale step over a decoded image — the
    * resize kernel shared by [[resizeImages]] (which PNG-encodes the
    * result as the media artifact) and [[imageHashes]] (which hashes
    * the pixels directly: PNG is lossless, so hashing the buffer is
    * bit-identical to hashing a decode of its encoding — the
    * PNG-lossless spec pins exactly this).
    */
  private def halveImage(
      img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
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
    small
  }

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
        val small = halveImage(img)
        val baos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(small)
        ios.close()
        ResizedImage(im.doc_id, w, h, small.getWidth, small.getHeight,
          baos.toByteArray)
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

  // --- image near-duplicate detection: the IMAGE side of the dedup
  // family (text has exact / MinHash / SimHash / LCS — q30/q32/q33/
  // q39; images at scale dedup by PERCEPTUAL hash, the LAION recipe:
  // a 64-bit difference hash that survives re-encoding and resizing,
  // then the same banded-Hamming machinery SimHash uses).

  /** dHash grid side: the image is cell-averaged to
    * [[PhashGrid]]×[[PhashGrid]] luminance cells before hashing, so
    * two renditions of the same picture at different resolutions land
    * on (nearly) the same cells. 8 keeps every test image (≥ 8 px a
    * side after one 2× pool) free of empty cells and yields a 64-bit
    * hash — one band layout shared with q33.
    */
  val PhashGrid = 8

  /** Max Hamming distance for a near-dup pair. With 8 bands of 8 bits
    * the banded join has FULL recall for distance ≤ 7 (pigeonhole)
    * and is probabilistic at exactly 8 — q33's contract.
    */
  val PhashMaxHamming = 8

  /** One hashed rendition: `img_id = doc_id × 2 + variant` (variant 0
    * = source, 1 = thumbnail) keys the pair machinery with a single
    * int64, the (doc_id, variant) columns keep the output readable.
    */
  case class ImageHash(img_id: Long, doc_id: Long, variant: String,
    phash: Long)

  /** 64-bit difference hash of a decoded image, in EXACT integer
    * arithmetic end to end. The grid resize is AREA-EXACT: cell
    * (r, c) covers the fractional rectangle
    * [c·w/8, (c+1)·w/8) × [r·h/8, (r+1)·h/8), and each pixel
    * contributes its exact overlap area as an integer weight (working
    * in 1/8-pixel units clears every denominator). Floor-bucketing
    * pixels into cells instead (`cx = x·8/w`) would shift cell
    * boundaries by up to a pixel whenever a dimension isn't a
    * multiple of 8 — measured on this corpus, that misalignment broke
    * rendition folding for 60% of images, because two renditions of
    * the same picture were then averaging DIFFERENT source regions.
    * Area-exact weights make the grid geometry identical at every
    * resolution, which is the invariance pHash exists to provide.
    *
    * Every cell's total weight is exactly w·h (the overlaps tile the
    * image), so comparing weighted sums IS comparing means — no
    * division anywhere, and the hash is bit-deterministic on every
    * JVM and partitioning (the [[decodeImageFeatures]]
    * integer-exactness discipline). Bit (r, c) compares cell (r, c)
    * against its row neighbour (r, (c+1) mod 8); wraparound closes
    * the row so all 64 bits are defined by the 8×8 grid alone
    * (classic dHash uses a 9×8 grid; the wrap keeps the minimum
    * viable image at 8 px, which a pooled 16 px source is).
    */
  private[graft] def dHash(img: java.awt.image.BufferedImage): Long = {
    val g = PhashGrid
    val sums = new Array[Long](g * g)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      // pixel y covers [g·y, g·y+g) in 1/g-pixel units; row cell r
      // covers [r·h, (r+1)·h) — a pixel overlaps at most two cells
      val py0 = g * y; val py1 = py0 + g
      val r0 = py0 / h; val r1 = math.min(g - 1, (py1 - 1) / h)
      var x = 0
      while (x < w) {
        val px0 = g * x; val px1 = px0 + g
        val c0 = px0 / w; val c1 = math.min(g - 1, (px1 - 1) / w)
        val rgb = img.getRGB(x, y)
        val lum =
          ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        var r = r0
        while (r <= r1) {
          val oy = math.min(py1, (r + 1) * h) - math.max(py0, r * h)
          var c = c0
          while (c <= c1) {
            val ox = math.min(px1, (c + 1) * w) - math.max(px0, c * w)
            sums(r * g + c) += ox.toLong * oy * lum
            c += 1
          }
          r += 1
        }
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < g) {
      var c = 0
      while (c < g) {
        if (sums(r * g + c) > sums(r * g + (c + 1) % g))
          hash |= 1L << (r * g + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Perceptual hashes of the rendition corpus: every source image
    * PLUS its 2×-pooled thumbnail ([[resizeImages]]) — the production
    * shape, where the same picture arrives as multiple renditions
    * (re-encodes, thumbnails, crawler copies) and dedup must fold
    * them. Map-only: decode, hash, one narrow row out; at 100 TB this
    * pipelines inside the media scan and only 16-byte (id, hash) rows
    * ever shuffle.
    */
  def imageHashes(images: Dataset[ImageItem]): Dataset[ImageHash] = {
    import images.sparkSession.implicits._
    // ONE decode per image (round 14): the old form decoded each
    // source, then resizeImages decoded it again and PNG-ENCODED the
    // thumb, then the thumb hash pass decoded THAT — three decodes and
    // one encode per image, all for 16 bytes of hashes. PNG is
    // lossless (spec-pinned), so dHash over the in-memory halved
    // buffer is bit-identical to dHash over a decode of its encoding;
    // both hashes now come out of one decode in one map stage.
    images.mapPartitions { items =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      val out = items.flatMap { im =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(im.payload))
        val img =
          try { reader.setInput(iis, true, true); reader.read(0) }
          finally iis.close()
        Iterator(
          ImageHash(im.doc_id * 2, im.doc_id, "src", dHash(img)),
          ImageHash(im.doc_id * 2 + 1, im.doc_id, "thumb",
            dHash(halveImage(img))))
      }
      out ++ { reader.dispose(); Iterator.empty }
    }
  }

  /** q119: image near-duplicate pairs by banded perceptual hash —
    * every pair of renditions within Hamming [[PhashMaxHamming]],
    * found through q33's band join (8 bands of 8 bits: candidates
    * share at least one band, full recall ≤ 7 by pigeonhole) so the
    * corpus is never all-paired. Runs on [[photoTable]] — coherent
    * content is pHash's operating assumption (see [[smoothPixel]]).
    * The structural near-dups are each image and its own thumbnail
    * (dHash is resolution-invariant by construction — both renditions
    * average to the same 8×8 grid up to pooling round-off);
    * cross-image collisions are whatever the corpus actually
    * contains. Output `(ia, ib, doc_a, variant_a, doc_b, variant_b,
    * hamming)`, `ia < ib`.
    *
    * Scale shape: hashing is map-only inside the media scan; pair
    * emission is q31's capped inverted index on (band, chunk) —
    * `collect_capped` bounds every bucket's posting buffer and
    * TOMBSTONES hot buckets map-side (round 10: a boilerplate band —
    * a constant-color cell row hashing every image to the same chunk
    * — would otherwise collect the whole corpus into ONE task and
    * emit C(N,2) pairs; at the cap the worst bucket emits
    * C(cap,2)), then each surviving sorted posting list emits its
    * pairs in codegen. Recall statement UNDER the cap: a pair is
    * found iff it shares at least one sub-cap band — pairs whose
    * only agreement is boilerplate bands are dropped exactly like
    * q31's stop-shingle overlaps (corpus-wide identical imagery is
    * q30-style exact dedup's job; MultimodalSpec pins both the
    * spread and the planted hot-band behavior). The exact Hamming
    * check runs on candidates only. Rows-only (dHash is not
    * SQL-expressible); MultimodalSpec asserts bit-equality against
    * an in-driver brute force at the full-recall threshold and
    * thumbnail-pair recall.
    */
  def q119(spark: SparkSession, dir: String): DataFrame =
    phashPairsOf(imageHashes(photoTable(spark, dir)).toDF())

  /** Posting cap per (band, chunk) bucket — the q31 `DefaultDfCap`
    * rationale at image scale: above it a bucket is boilerplate
    * imagery, its C(df,2) fan-out quadratic while its 8-bit-band
    * evidence is near zero.
    */
  val PhashBandDfCap = 1000

  /** [[q119]]'s pair machinery over an arbitrary
    * `(img_id, doc_id, variant, phash)` relation — the form the spec
    * feeds planted corpora.
    */
  private[graft] def phashPairsOf(hashes: DataFrame,
      maxHamming: Int = PhashMaxHamming,
      bandDfCap: Int = PhashBandDfCap): DataFrame = {
    graft.functions.GraftFunctions.register(hashes.sparkSession)
    // the hash relation feeds three consumers (bands + both sides of
    // the annotation rejoin) — materialize it once, or the upstream
    // image DECODE would run three times (and q75's multi-consumer
    // codegen lesson applies); 30-byte rows, corpus-hash-sized
    val hs = hashes.select(col("img_id"), col("doc_id"), col("variant"),
      col("phash")).localCheckpoint()
    // only (id, phash) rides the quadratic stage — 16-byte postings
    // through the exchange, 16-byte pairs through the dedup; the
    // annotation columns (doc, variant) rejoin AFTER the Hamming
    // filter, when the relation is near-dup-sized, not wedge-sized
    val banded = hs.select(
      struct(col("img_id").as("id"), col("phash")).as("img"),
      posexplode(array((0 until 8).map(j =>
        shiftrightunsigned(col("phash"), 8 * j)
          .bitwiseAND(lit(0xFFL))): _*)).as(Seq("band", "chunk")))
    // capped inverted index: hot buckets tombstone map-side (null),
    // survivors sort by img_id (unique within a bucket — one row per
    // (img, band)) so emitted pairs have ia < ib by construction.
    // Round 15: emission moved from the flatten(transform(...))
    // expression to a typed per-bucket loop with the Hamming check
    // INSIDE it (the q34/fastss shape) — the expression form allocated
    // a C(df,2)-struct array per bucket (smooth photo content piles
    // hashes into few chunk values: 729 live buckets, max df 448,
    // 8.4M candidate structs at sf0.1, measured) and ran `distinct`
    // over ALL candidates BEFORE the Hamming filter; now only passing
    // pairs (output-sized, not candidate-sized) reach the exchange.
    // filter∘distinct ≡ distinct∘filter row-wise, so rows identical.
    import hashes.sparkSession.implicits._
    val pairs = banded.groupBy(col("band"), col("chunk"))
      .agg(expr(s"collect_capped(img, $bandDfCap)").as("dsr"))
      .filter(col("dsr").isNotNull && size(col("dsr")) > 1)
      .select(col("dsr"))
      .as[Seq[(Long, Long)]]
      .flatMap { members =>
        val buf = members.toArray
        // id order (ids unique per bucket) — same order sort_array
        // gave the struct form, so ia < ib by construction
        java.util.Arrays.sort(buf, Ordering.by((x: (Long, Long)) => x._1))
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long)]
        var i = 0
        while (i < buf.length) {
          val (ia, pa) = buf(i)
          var j = i + 1
          while (j < buf.length) {
            val (ib, pb) = buf(j)
            val h = java.lang.Long.bitCount(pa ^ pb)
            if (h <= maxHamming) out += ((ia, ib, h.toLong))
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("ia", "ib", "hamming")
      .distinct()
    val meta = hs.select(col("img_id"), col("doc_id"), col("variant"))
    pairs
      .join(meta.select(col("img_id").as("ia"), col("doc_id").as("doc_a"),
        col("variant").as("variant_a")), Seq("ia"))
      .join(meta.select(col("img_id").as("ib"), col("doc_id").as("doc_b"),
        col("variant").as("variant_b")), Seq("ib"))
      .select(col("ia"), col("ib"), col("doc_a"), col("variant_a"),
        col("doc_b"), col("variant_b"), col("hamming"))
      .orderBy(col("ia"), col("ib"))
  }
}
