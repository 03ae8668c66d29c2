package graft.queries

import graft.{Q, Tables}
import graft.functions.Multimodal
import graft.sources.LineProtocol
import org.apache.spark.sql.functions._

/** Ingest + multimodal operators as oracle-checked queries:
  *
  *   - lp_roundtrip: events → line-protocol text (the reference's wire
  *     format) → distributed parse → rows. Proves serializer ∘ parser =
  *     identity on real data; the oracle reads the same rows straight from
  *     parquet, so any drift in either direction fails the hash.
  *   - mm_features: the multimodal batch pipeline (binary payload +
  *     deterministic stub decode); oracle mirrors the stub's arithmetic in
  *     SQL, checking the mapPartitions plumbing end-to-end.
  */
object IngestSuite {

  def all: Seq[Q] = Seq(

    Q("lp_roundtrip",
      """SELECT epoch_us(ts) * 1000 AS time_ns, event_type, value,
        |       CAST(user_id AS DOUBLE) AS user_id
        |FROM events""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = Tables(s, d, "events")
      // serialize every event to a line-protocol line (distributed)
      val lines = ev.select(col("ts_us"), col("event_type"), col("value"), col("user_id"))
        .as[(Long, String, Double, Long)]
        .map { case (tsUs, et, v, uid) =>
          LineProtocol.serialize(LineProtocol.Point(
            "events", Map("event_type" -> et),
            Map("value" -> LineProtocol.FFloat(v), "user_id" -> LineProtocol.FInt(uid)),
            Some(tsUs * 1000L)))
        }
      // parse back (distributed), dead-letter channel must stay empty
      val (parsed, _) = LineProtocol.parse(s, lines, "events",
        tagKeys = Seq("event_type"), floatFields = Seq("value", "user_id"))
      parsed.select(col("time_ns"), col("event_type"), col("value"), col("user_id"))
    },

    // image rows (doc_id ≡ 0 mod 3) are REAL PNGs decoded with ImageIO,
    // audio rows (≡ 1) REAL WAVs decoded with javax.sound.sampled, video
    // rows (≡ 2) REAL RIFF/AVI MJPEG containers walked chunk-by-chunk and
    // frame-decoded by the JDK JPEG codec: width/height/pixel resp. rate/
    // frames/sample resp. geometry/frame-count/frame-0 pixel can only
    // match by actually parsing the payload. sha256 is NULL for all three
    // (binary not recomputable in SQL); audio bytes_len IS checkable
    // (44-byte canonical header + 2 bytes/sample), image/video byte counts
    // are encoder-dependent → NULL. Video rgb0 = packed RGB of the frame-0
    // even-gray fill g·0x010101 (constant even grays survive baseline JPEG
    // exactly — see Multimodal.aviGray).
    Q("mm_features",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/avi' END AS mime,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(44 + 2 * (50 + doc_id % 200) AS BIGINT)
        |       ELSE NULL END AS bytes_len,
        |  CAST(NULL AS VARCHAR) AS sha256,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 8
        |            WHEN doc_id % 3 = 1 THEN
        |              CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |                              WHEN 2 THEN 32000 ELSE 44100 END
        |            ELSE 8 + doc_id % 41 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 5
        |            WHEN doc_id % 3 = 1 THEN 50 + doc_id % 200
        |            ELSE 8 + (doc_id * 3) % 29 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 2 + doc_id % 5 ELSE 1 END AS INT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |            THEN (doc_id % 256) * 65536 + ((doc_id * 7) % 256) * 256 + (doc_id * 13) % 256
        |            WHEN doc_id % 3 = 1 THEN (doc_id * 37) % 20000 - 10000
        |            ELSE 2 * ((doc_id * 11) % 128) * 65793 END AS BIGINT) AS rgb0
        |FROM documents""".stripMargin) { (s, d) =>
      Multimodal.extractFeatures(s, Multimodal.mediaTable(Tables(s, d, "documents"))).toDF()
        .select("doc_id", "mime", "bytes_len", "sha256", "width", "height", "n_frames", "rgb0")
    },

    // the dedicated audio gate: a REAL javax.sound.sampled decode of every
    // WAV row (rate for resampling plans, duration for billing, peak for
    // silence filtering). The oracle replays the constant-fill fixture
    // arithmetic — rate/frames/amplitude can only match by parsing RIFF.
    Q("mm_audio",
      """SELECT doc_id,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |                       WHEN 2 THEN 32000 ELSE 44100 END AS INT) AS sample_rate,
        |  CAST(50 + doc_id % 200 AS BIGINT) AS n_samples,
        |  CAST((50 + doc_id % 200) * 1000000
        |       // (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |                          WHEN 2 THEN 32000 ELSE 44100 END) AS BIGINT) AS duration_us,
        |  CAST((doc_id * 37) % 20000 - 10000 AS INT) AS first_sample,
        |  CAST(abs((doc_id * 37) % 20000 - 10000) AS INT) AS peak_abs
        |FROM documents WHERE doc_id % 3 = 1""".stripMargin) { (s, d) =>
      Multimodal.audioProbe(s,
        Multimodal.mediaTable(Tables(s, d, "documents"))).toDF()
    },

    // the dedicated video gate: a REAL RIFF/AVI walk + per-frame JPEG
    // decode of every video row. frames_decoded can only equal n_frames if
    // every '00dc' chunk holds a codec-accepted JPEG; gray0 is the decoded
    // (0,0) pixel of frame 0 — exact because constant even-gray frames
    // survive baseline JPEG quantization bit-for-bit.
    Q("mm_video",
      """SELECT doc_id,
        |  CAST(8 + doc_id % 41 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 29 AS INT) AS height,
        |  CAST(2 + doc_id % 5 AS INT) AS n_frames,
        |  CAST(2 + doc_id % 5 AS INT) AS frames_decoded,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 33333 WHEN 1 THEN 40000
        |                       WHEN 2 THEN 66667 ELSE 50000 END AS INT) AS us_per_frame,
        |  CAST((2 + doc_id % 5) * (CASE doc_id % 4 WHEN 0 THEN 33333 WHEN 1 THEN 40000
        |                           WHEN 2 THEN 66667 ELSE 50000 END) // 1000 AS BIGINT) AS duration_ms,
        |  CAST(2 * ((doc_id * 11) % 128) AS INT) AS gray0
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin) { (s, d) =>
      Multimodal.videoProbe(s,
        Multimodal.mediaTable(Tables(s, d, "documents"))).toDF()
    },

    // frame sampling (every 2nd frame): the training-pipeline extraction
    // shape — one container parse per row, JPEG decode only for sampled
    // frames, map-only explode. The oracle unrolls the same stride
    // arithmetic with generate_series.
    Q("mm_video_frames",
      """SELECT doc_id,
        |  CAST(f AS INT) AS frame_idx,
        |  CAST(8 + doc_id % 41 AS INT) AS width,
        |  CAST(8 + (doc_id * 3) % 29 AS INT) AS height,
        |  CAST(2 * ((doc_id * 11 + f * 17) % 128) AS INT) AS gray
        |FROM (SELECT doc_id, UNNEST(generate_series(0, CAST(1 + doc_id % 5 AS BIGINT), 2)) AS f
        |      FROM documents WHERE doc_id % 3 = 2)""".stripMargin) { (s, d) =>
      Multimodal.videoFrameSample(s,
        Multimodal.mediaTable(Tables(s, d, "documents")), stride = 2).toDF()
    },

    // a REAL resize (Graphics2D nearest-neighbor, re-encoded PNG, then
    // re-decoded): output dims prove the scale, and because fixture PNGs
    // are constant-fill, the probed pixel after any resize must still be
    // the doc_id-derived color — which is exactly what the oracle computes
    Q("mm_resize",
      """SELECT doc_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST((doc_id % 256) * 65536 + ((doc_id * 7) % 256) * 256 + (doc_id * 13) % 256 AS BIGINT) AS rgb0
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin) { (s, d) =>
      Multimodal.resizeImages(s,
        Multimodal.mediaTable(Tables(s, d, "documents")), 4, 4).toDF()
    },

    // perceptual-hash image dedup (aHash): REAL ImageIO decode of
    // patterned LOSSLESS PNGs → 8×8 sampled luma grid → ≥-mean bit
    // string → group stats. Images sharing the pattern key are
    // byte-identical, so the hash provably collapses them; the oracle
    // replays the pixel arithmetic (possible only because PNG decode is
    // exact). Map-only hash + one shuffle on the 64-bit-string key.
    Q("mm_phash",
      """WITH b AS (SELECT doc_id, doc_id % 30 AS pk FROM documents),
        |dims AS (SELECT *, 1 + pk % 8 AS w, 1 + pk % 5 AS h FROM b),
        |sv AS (SELECT *, list_transform(generate_series(0, 63), k ->
        |         (pk*7 + (((k % 8) * w) // 8) * 13 + (((k // 8) * h) // 8) * 31) % 256) AS s
        |       FROM dims),
        |ph AS (SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |         array_to_string(list_transform(s, v ->
        |           CASE WHEN v >= list_sum(s) // 64 THEN '1' ELSE '0' END), '') AS phash,
        |         CAST(list_sum(s) // 64 AS BIGINT) AS luma_mean
        |       FROM sv)
        |SELECT doc_id, width, height, phash, luma_mean,
        |       count(*) OVER (PARTITION BY phash) AS n_copies,
        |       min(doc_id) OVER (PARTITION BY phash) AS canonical_id
        |FROM ph""".stripMargin) { (s, d) =>
      val mkPng = udf(Multimodal.makePatternPng _)
      val media = Tables(s, d, "documents").select(col("doc_id"),
        mkPng(col("doc_id")).as("payload"), lit("image/png").as("mime"))
      val wnd = org.apache.spark.sql.expressions.Window.partitionBy("phash")
      Multimodal.phashImages(s, media).toDF()
        .withColumn("n_copies", count(lit(1)).over(wnd))
        .withColumn("canonical_id", min("doc_id").over(wnd))
        .select("doc_id", "width", "height", "phash", "luma_mean",
          "n_copies", "canonical_id")
    },

    // audio fingerprint dedup: REAL javax.sound decode of patterned
    // (lossless PCM16) WAVs → 64 grid samples, shifted unsigned →
    // ≥-mean bit string → group stats. The audio member of the dedup
    // family; the oracle replays the sample arithmetic.
    Q("mm_audio_fp",
      """WITH b AS (SELECT doc_id, doc_id % 24 AS pk FROM documents),
        |d2 AS (SELECT *, CAST(50 + pk % 200 AS BIGINT) AS n FROM b),
        |sv AS (SELECT *, list_transform(generate_series(0, 63), j ->
        |        (pk*37 + ((j * n) // 64) * 17) % 20000) AS u FROM d2),
        |fp AS (SELECT doc_id, n AS n_samples,
        |        array_to_string(list_transform(u, v ->
        |          CASE WHEN v >= list_sum(u) // 64 THEN '1' ELSE '0' END), '') AS afp,
        |        CAST(list_sum(u) // 64 AS BIGINT) AS level_mean FROM sv)
        |SELECT doc_id, n_samples, afp, level_mean,
        |       count(*) OVER (PARTITION BY afp) AS n_copies,
        |       min(doc_id) OVER (PARTITION BY afp) AS canonical_id
        |FROM fp""".stripMargin) { (s, d) =>
      val mkWav = udf(Multimodal.makePatternWav _)
      val media = Tables(s, d, "documents").select(col("doc_id"),
        mkWav(col("doc_id")).as("payload"), lit("audio/wav").as("mime"))
      val wnd = org.apache.spark.sql.expressions.Window.partitionBy("afp")
      Multimodal.audioFingerprint(s, media).toDF()
        .withColumn("n_copies", count(lit(1)).over(wnd))
        .withColumn("canonical_id", min("doc_id").over(wnd))
        .select("doc_id", "n_samples", "afp", "level_mean",
          "n_copies", "canonical_id")
    },

    // scene-change segmentation: every frame of every AVI REALLY decodes
    // (JPEG), a cut opens on a ≥32 luma jump, scene_id is the running cut
    // count — keyframe/segment sampling for video training data. The
    // per-video fold runs inside the map task (map-only, no shuffle);
    // the oracle replays the fixture luma arithmetic with a lag window.
    Q("mm_scenes",
      """WITH f AS (SELECT doc_id, unnest(generate_series(0, CAST(1 + doc_id % 5 AS BIGINT))) AS k
        |           FROM documents WHERE doc_id % 3 = 2),
        |g AS (SELECT doc_id, k, 2 * ((doc_id * 11 + k * 17) % 128) AS gray FROM f),
        |c AS (SELECT *, CASE WHEN k = 0 THEN 1
        |        WHEN abs(gray - lag(gray) OVER (PARTITION BY doc_id ORDER BY k)) >= 32
        |        THEN 1 ELSE 0 END AS cut FROM g)
        |SELECT doc_id, CAST(k AS INT) AS frame_idx, CAST(gray AS INT) AS gray,
        |       CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY k
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scene_id
        |FROM c""".stripMargin) { (s, d) =>
      Multimodal.videoScenes(s,
        Multimodal.mediaTable(Tables(s, d, "documents"))).toDF()
    }
  )
}
