package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque BINARY + typed metadata,
  * processed batch-wise in executors (the Scala analog of `mapInPandas` —
  * partition iterators chunked into fixed batches so a real decoder can
  * amortize codec/model setup per batch).
  *
  * The IMAGE and AUDIO paths are REAL decodes: image rows carry genuine
  * PNG payloads read back with the JDK's ImageIO (`decodePng`), audio rows
  * genuine RIFF/WAVE PCM16 payloads read back with javax.sound.sampled
  * (`decodeWav`) — dimensions, pixel probe, sample rate, frame count and
  * amplitudes can only come from actually parsing the bytes, and the
  * oracles recompute them from the same fixture arithmetic. VIDEO decode
  * remains a labeled STUB (`stubDecode`, deterministic pseudo-features —
  * the JDK ships no video codec and this container has no external ones);
  * swapping it for a JNI/ONNX call changes no plumbing.
  *
  * Scale notes: mapPartitions keeps the decode distributed with zero
  * shuffle; batches bound peak memory; binary payloads stay columnar in
  * parquet (no driver collection).
  */
object Multimodal {

  val BatchSize = 64

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeatures(
      doc_id: Long, mime: String,
      bytes_len: Option[Long],  // None for images: PNG byte count is
      sha256: Option[String],   //   encoder-dependent, not oracle-checkable
      width: Int, height: Int, n_frames: Int,
      rgb0: Long)               // decoded (0,0) pixel, packed RGB; -1 non-image

  /** Deterministic fake decoder for the codec-less modalities: features
    * derived purely from the payload bytes. Replace with a real codec; the
    * signature is the contract. */
  def stubDecode(payload: Array[Byte], mime: String): (Int, Int, Int) = {
    val n = payload.length
    val width = 64 + (n % 577)          // pseudo "resolution"
    val height = 64 + ((n * 31) % 421)
    val frames = if (mime.startsWith("video")) 1 + (n % 7) else 1
    (width, height, frames)
  }

  // fixture arithmetic for generated PNGs — the oracle mirrors these
  def pngWidth(docId: Long): Int = (1L + docId % 8L).toInt
  def pngHeight(docId: Long): Int = (1L + docId % 5L).toInt
  def pngRgb(docId: Long): Int =
    (((docId % 256L) << 16) | (((docId * 7L) % 256L) << 8) | ((docId * 13L) % 256L)).toInt

  // fixture arithmetic for generated WAVs — the oracle mirrors these. The
  // payload is a REAL RIFF/WAVE file (PCM16 mono, constant-fill samples),
  // so rate/frames/amplitude can only come from actually parsing it.
  def wavRate(docId: Long): Int =
    Array(8000, 16000, 32000, 44100)((docId % 4L).toInt)
  def wavSamples(docId: Long): Int = 50 + (docId % 200L).toInt
  def wavAmp(docId: Long): Int = ((docId * 37L) % 20000L).toInt - 10000

  /** A real WAV payload: canonical 44-byte RIFF header + little-endian
    * 16-bit PCM, every sample = wavAmp(docId). Byte-deterministic, so
    * bytes_len is oracle-checkable (44 + 2·nSamples). */
  def makeWav(docId: Long): Array[Byte] = {
    val rate = wavRate(docId)
    val n = wavSamples(docId)
    val amp = wavAmp(docId)
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) { bb.putShort(amp.toShort); i += 1 }
    bb.array()
  }

  /** The real audio decode: the JDK's javax.sound.sampled WAV codec over
    * the binary payload. (sampleRateHz, nSamples, firstSample, peakAbs);
    * (-2, -2, 0, -1) marks an undecodable payload — visible, never
    * silently stubbed. */
  def decodeWav(payload: Array[Byte]): (Int, Long, Int, Int) =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val bytes = ais.readAllBytes()
        val le = !fmt.isBigEndian
        var first = 0
        var peak = 0
        var i = 0
        while (i + 1 < bytes.length) {
          val s =
            if (le) ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toInt
            else ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort.toInt
          if (i == 0) first = s
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 2
        }
        (fmt.getSampleRate.toInt, frames, first, peak)
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
          _: java.io.IOException => (-2, -2L, 0, -1)
    }

  /** A real PNG payload: dimensions + constant fill color derived from
    * doc_id. Encoded with ImageIO — decodable by any PNG reader. */
  def makePng(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      pngWidth(docId), pngHeight(docId), java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = pngRgb(docId)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The real decode: JDK ImageIO over the binary payload. (width, height,
    * packed (0,0) RGB); (-2, -2, -1) marks an undecodable payload — made
    * visible, never silently stubbed. */
  def decodePng(payload: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) (-2, -2, -1L)
    else (img.getWidth, img.getHeight, (img.getRGB(0, 0) & 0xffffff).toLong)
  }

  /** Real RESIZE (pure JDK — Graphics2D, nearest-neighbor interpolation,
    * deterministic across JVMs): decode → scale to w×h → re-encode PNG.
    * The media-pipeline thumbnail/downsample stage, no external codecs.
    * Returns None for an undecodable payload. */
  def resizePng(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (src == null) None
    else {
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(src, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      Some(bos.toByteArray)
    }
  }

  final case class ResizedRow(doc_id: Long, width: Int, height: Int, rgb0: Long)

  /** Thumbnail pass over the image rows of a media table: resize each PNG
    * to w×h through the same batched mapPartitions path, then RE-DECODE
    * the resized payload to prove the round trip (dims + probed pixel).
    * Map-only, zero shuffle — the distributed shape of a corpus-wide
    * thumbnail job. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.where(col("mime") === "image/png").as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          resizePng(r.payload, w, h).map { resized =>
            val (dw, dh, rgb) = decodePng(resized)
            ResizedRow(r.doc_id, dw, dh, rgb)
          }
        }
      }
    }
  }

  private def sha256Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  /** documents → media table: image rows (doc_id ≡ 0 mod 3) carry REAL
    * PNG payloads, audio rows (≡ 1) REAL WAV payloads; video rows keep
    * UTF-8 text bytes as the stand-in binary (no video codec in the JDK).
    * Mime assignment is the same deterministic sniff as before. */
  def mediaTable(docs: DataFrame): DataFrame = {
    val mkPng = udf((docId: Long) => makePng(docId))
    val mkWav = udf((docId: Long) => makeWav(docId))
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, mkPng(col("doc_id")))
        .when(pmod(col("doc_id"), lit(3)) === 1, mkWav(col("doc_id")))
        .otherwise(encode(col("text"), "UTF-8")).as("payload"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))
  }

  /** Batch feature extraction over partition iterators — the mapInPandas-
    * shaped hot path. Images and audio decode FOR REAL (ImageIO /
    * javax.sound.sampled); only video stays a labeled stub. MediaFeatures
    * is a generic per-modality record: for audio, `width` carries the
    * sample rate (Hz), `height` the sample count, and `rgb0` the first
    * decoded sample — dedicated audio columns live in the mm_audio gate
    * (`audioProbe`); this keeps one batched decode pass for mixed media. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch setup would go here (codec/model init)
        batch.iterator.map { r =>
          if (r.mime == "image/png") {
            val (w, h, rgb) = decodePng(r.payload)
            MediaFeatures(r.doc_id, r.mime, None, None, w, h, 1, rgb)
          } else if (r.mime == "audio/wav") {
            // real decode; bytes_len is the true (header + PCM) byte count,
            // sha256 None like images (binary not recomputable in SQL)
            val (rate, frames, first, _) = decodeWav(r.payload)
            MediaFeatures(r.doc_id, r.mime, Some(r.payload.length.toLong),
              None, rate, frames.toInt, 1, first.toLong)
          } else {
            val (w, h, f) = stubDecode(r.payload, r.mime)
            MediaFeatures(r.doc_id, r.mime, Some(r.payload.length.toLong),
              Some(sha256Hex(r.payload)), w, h, f, -1L)
          }
        }
      }
    }
  }

  final case class AudioProbe(doc_id: Long, sample_rate: Int, n_samples: Long,
      duration_us: Long, first_sample: Int, peak_abs: Int)

  /** Audio probe over the WAV rows of a media table: real
    * javax.sound.sampled decode per payload, batched mapPartitions,
    * map-only / zero shuffle — the distributed shape of a corpus-wide
    * audio-stats job (duration for billing, peak for silence filtering). */
  def audioProbe(spark: SparkSession, media: DataFrame): Dataset[AudioProbe] = {
    import spark.implicits._
    media.where(col("mime") === "audio/wav").as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (rate, frames, first, peak) = decodeWav(r.payload)
          val durUs = if (rate > 0) frames * 1000000L / rate else -1L
          AudioProbe(r.doc_id, rate, frames, durUs, first, peak)
        }
      }
    }
  }
}
