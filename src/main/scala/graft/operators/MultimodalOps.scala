package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * run batched per partition. Dimension extraction is REAL for the three
  * ubiquitous raster formats ([[parseDims]] — header-only PNG/JPEG/GIF
  * parse, golden-checked against javax.imageio output); full pixel/audio
  * decode stays STUBBED (the sandbox ships no media libraries) behind
  * `decodeStub` — a deterministic fake keyed on the payload bytes —
  * while the Spark-side contract is real: binary schema,
  * partition-batched iteration, typed output rows, and a
  * pure-arithmetic twin so the plumbing is oracle-checkable end to end.
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

  /** REAL header-only dimension parse for the three ubiquitous public
    * raster formats (no pixel decode — a few dozen header bytes suffice,
    * which is exactly what a 100 TB metadata pass wants to touch):
    *  - PNG: 8-byte signature, then the mandatory IHDR chunk carries
    *    width/height as big-endian u32 at offsets 16/20 (PNG spec §11.2.2);
    *  - JPEG: walk the FF-marker segments to the first start-of-frame
    *    (SOF0–SOF15 minus the DHT/JPG/DAC exceptions C4/C8/CC); height and
    *    width are big-endian u16 right after the precision byte
    *    (ITU T.81 §B.2.2) — covers baseline AND progressive;
    *  - GIF: "GIF87a"/"GIF89a", logical-screen width/height little-endian
    *    u16 at offsets 6/8.
    * Returns None for anything unrecognized or truncated — callers fall
    * back to [[decodeStub]], so non-media payloads keep the deterministic
    * fake the oracle mirrors.
    */
  def parseDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    @inline def u8(i: Int): Int = bytes(i) & 0xFF
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val n = bytes.length
    if (n >= 24 && be32(0) == 0x89504E47L && be32(4) == 0x0D0A1A0AL &&
        be32(12) == 0x49484452L) { // "IHDR"
      val w = be32(16); val h = be32(20)
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some((w.toInt, h.toInt)) else None
    } else if (n >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) { // JPEG SOI
      var i = 2
      while (i + 3 < n) {
        if (u8(i) != 0xFF) return None // marker desync
        var j = i
        while (j + 1 < n && u8(j + 1) == 0xFF) j += 1 // fill bytes
        val m = if (j + 1 < n) u8(j + 1) else return None
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          // SOFn: len(2) precision(1) height(2) width(2)
          return if (j + 8 < n) Some((be16(j + 7), be16(j + 5))) else None
        } else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
          i = j + 2 // standalone marker, no length field
        } else if (m == 0xD9 || m == 0xDA) {
          return None // EOI / entropy-coded data before any SOF
        } else {
          if (j + 3 >= n) return None
          i = j + 2 + be16(j + 2)
        }
      }
      None
    } else if (n >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      Some((le16(6), le16(8)))
    } else None
  }

  /** Production decode: REAL header parse for recognized PNG/JPEG/GIF
    * payloads (stills → 1 frame), deterministic stub for everything else
    * (the declared stand-in for formats needing a full codec). Same
    * (width, height, nFrames) contract either way.
    */
  def decode(bytes: Array[Byte]): (Int, Int, Int) =
    parseDims(bytes) match {
      case Some((w, h)) => (w, h, 1)
      case None         => decodeStub(bytes)
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
          val (_, _, nFrames) = decode(bytes)
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
          val (w, h, f) = decode(bytes)
          MediaMeta(url, bytes.length.toLong, w, h, f, byteFingerprint(bytes))
        }
      }
  }
}
