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
}
