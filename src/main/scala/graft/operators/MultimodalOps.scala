package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * run batched per partition. The actual codec calls are STUBBED (the
  * sandbox ships no image/audio libraries) behind `decodeStub` — a
  * deterministic fake keyed on the payload bytes — while the Spark-side
  * contract is real: binary schema, partition-batched iteration, typed
  * output rows, and a pure-arithmetic twin so the plumbing is
  * oracle-checkable end to end.
  */
object MultimodalOps {

  case class MediaMeta(url: String, byteLen: Long, width: Int, height: Int,
                       nFrames: Int, fingerprint: Long)

  /** STUB: stands in for an image/video decoder. Deterministic pure
    * function of the payload bytes — replace the body with a real codec
    * (e.g. javax.imageio / ffmpeg bindings) in a full deployment; the
    * signature (bytes in, dims + frame count out) is the real contract.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length.toLong
    val width = (320 + (n * 7919) % 1280).toInt
    val height = (240 + (n * 104729) % 720).toInt
    val nFrames = (1 + (n % 24)).toInt
    (width, height, nFrames)
  }

  /** Rolling polynomial fingerprint of the payload (base 131 mod 2^61-1) —
    * the binary analog of the text fingerprint.
    */
  def byteFingerprint(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 131 + (bytes(i) & 0xFF)) % 2305843009213693951L
      i += 1
    }
    h
  }

  case class FrameSample(url: String, frameIdx: Int, frameFp: Long)

  /** STUB resize: fit (w, h) into (maxW, maxH) preserving aspect ratio —
    * the dimension contract of a real scaler; no-ops when already within
    * bounds, never collapses below 1x1.
    */
  def resizeStub(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else {
      val s = math.min(maxW.toDouble / w, maxH.toDouble / h)
      (math.max(1, (w * s).toInt), math.max(1, (h * s).toInt))
    }

  /** Frame sampling over video-like payloads: every `stride`th frame index
    * of the decoded stream, capped at `maxFrames` per document — the
    * row-explosion (flatMap) shape a real video pipeline needs, one
    * decoder context per task. Frame "content" is a deterministic
    * per-frame fingerprint derived from the payload fingerprint.
    */
  def sampleFrames(spark: SparkSession, pages: DataFrame,
                   stride: Int, maxFrames: Int): Dataset[FrameSample] = {
    import spark.implicits._
    pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (url, bytes) =>
          val (_, _, nFrames) = decodeStub(bytes)
          val fp = byteFingerprint(bytes)
          (0 until nFrames by stride).take(maxFrames).iterator.map(i =>
            FrameSample(url, i, graft.core.TextHash.mix64(fp + i)))
        }
      }
  }

  /** Decode + feature-extract over a (url, html binary) pages table,
    * batched per partition (mapPartitions — one stub-codec context per
    * task, the shape a real decoder needs).
    */
  def extractMedia(spark: SparkSession, pages: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        // real decoders initialize a codec/session here, once per task
        it.map { case (url, bytes) =>
          val (w, h, f) = decodeStub(bytes)
          MediaMeta(url, bytes.length.toLong, w, h, f, byteFingerprint(bytes))
        }
      }
  }
}
