package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque BINARY + typed metadata,
  * processed batch-wise in executors (the Scala analog of `mapInPandas` —
  * partition iterators chunked into fixed batches so a real decoder could
  * amortize model/codec setup per batch).
  *
  * The DECODE STEP IS A STUB (this container has no image/audio codecs —
  * builder prompt): `stubDecode` derives deterministic pseudo-features from
  * the bytes. Everything around it is real and tested: schema, binary
  * column, batch shape, partition-parallel execution, and the feature
  * table's join-ability. Swapping `stubDecode` for a JNI/ONNX call changes
  * no plumbing.
  *
  * Scale notes: mapPartitions keeps the decode distributed with zero
  * shuffle; batches bound peak memory; binary payloads stay columnar in
  * parquet (no driver collection).
  */
object Multimodal {

  val BatchSize = 64

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(
      doc_id: Long, mime: String, bytes_len: Long, sha256: String,
      width: Int, height: Int, n_frames: Int)

  /** Deterministic fake decoder: features derived purely from the payload
    * bytes. Replace with a real codec; the signature is the contract. */
  def stubDecode(payload: Array[Byte], mime: String): (Int, Int, Int) = {
    val n = payload.length
    val width = 64 + (n % 577)          // pseudo "resolution"
    val height = 64 + ((n * 31) % 421)
    val frames = if (mime.startsWith("video")) 1 + (n % 7) else 1
    (width, height, frames)
  }

  private def sha256Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  /** documents → media table: payload = UTF-8 bytes of text (the stand-in
    * binary), mime sniffed deterministically from content. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** Batch feature extraction over partition iterators — the mapInPandas-
    * shaped hot path. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch setup would go here (codec/model init)
        batch.iterator.map { r =>
          val (w, h, f) = stubDecode(r.payload, r.mime)
          MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
            sha256Hex(r.payload), w, h, f)
        }
      }
    }
  }
}
