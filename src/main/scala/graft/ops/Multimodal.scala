package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched mapPartitions.
  *
  * The decode step is a DETERMINISTIC STUB (this container has no
  * image/audio codecs — see the builder contract): `decodeStub` derives
  * pseudo width/height/duration from a stable hash of the bytes. The
  * Spark-side plumbing — schema, batching, partitioning, output shape —
  * is real and is what these ops exercise. Swapping `decodeStub` for a
  * JNI/codec call is a one-function change.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Int,
                             checksum: Long, width: Int, height: Int,
                             frames: Int)

  /** Stable FNV-1a over bytes. */
  def checksum(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xff).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** STUB decode: real codecs are absent in this sandbox; metadata is a
    * pure function of the payload so tests are deterministic.
    */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val h = checksum(payload)
    val w = 64 + ((h >>> 8) % 1024).toInt.abs
    val ht = 64 + ((h >>> 24) % 1024).toInt.abs
    val frames = if (kind == "video") 1 + ((h >>> 40) % 300).toInt.abs else 1
    (w, ht, frames)
  }

  /** Build a media table from the documents table (payload = utf-8 bytes
    * of text — a stand-in binary column with realistic size distribution).
    */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, if (text == null) Array.empty else text.getBytes("UTF-8"))
      }
  }

  /** Feature-extract pass: batched mapPartitions over binary payloads →
    * typed metadata. This is the shape a real decode/resize/frame-sample
    * stage runs in (executor-local, no shuffle, bounded memory per batch).
    */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val (w, h, f) = decodeStub(row.kind, row.payload)
      MediaMeta(row.doc_id, row.kind, row.payload.length,
        checksum(row.payload), w, h, f)
    })
  }

  final case class ResizedMedia(doc_id: Long, kind: String, width: Int,
                                height: Int, payload: Array[Byte])

  /** Resize-shaped pass: binary in → binary out, batched per partition —
    * the executor-memory-bounded shape of a real thumbnailer. The pixel
    * work is the deterministic STUB (no codecs in this sandbox): output
    * payload = truncated input + an 8-byte header derived from the target
    * box, so tests can assert size/metadata behavior.
    */
  def resizeStub(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val (w, h, _) = decodeStub(row.kind, row.payload)
      val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
      val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
      val outLen = math.max(8, (row.payload.length * scale * scale).toInt)
      val out = new Array[Byte](outLen)
      out(0) = (nw >> 8).toByte; out(1) = nw.toByte
      out(2) = (nh >> 8).toByte; out(3) = nh.toByte
      System.arraycopy(row.payload, 0, out, 8,
        math.min(row.payload.length, outLen - 8))
      ResizedMedia(row.doc_id, row.kind, nw, nh, out)
    })
  }

  /** Frame-sampling plan for videos: every `stride`-th frame index, as a
    * (doc_id, frame_idx) table — the fan-out shape of a real frame
    * extractor (1 video row → N frame rows via explode, not a driver loop).
    */
  def frameSamplePlan(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride))).as("frame_idx"))
}
