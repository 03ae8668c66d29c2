package graft.functions

import graft.SparkSpec

/** Real media decodes (VERDICT r5 item 8 / r6 item 3): the image path must
  * round-trip genuine PNG bytes through ImageIO and the audio path genuine
  * RIFF/WAVE bytes through javax.sound.sampled — parsed values, not stub
  * arithmetic — while video keeps the labeled stub. */
class MultimodalSpec extends SparkSpec {

  test("makePng → decodePng round-trips dimensions and the probe pixel") {
    Seq(0L, 1L, 7L, 42L, 299L, 123456L).foreach { id =>
      val (w, h, rgb) = Multimodal.decodePng(Multimodal.makePng(id))
      assert(w == Multimodal.pngWidth(id) && h == Multimodal.pngHeight(id))
      assert(rgb == (Multimodal.pngRgb(id) & 0xffffff).toLong)
    }
  }

  test("makeWav → decodeWav round-trips rate, frames, and amplitude") {
    Seq(0L, 1L, 2L, 3L, 7L, 42L, 299L, 123457L).foreach { id =>
      val (rate, frames, first, peak) = Multimodal.decodeWav(Multimodal.makeWav(id))
      assert(rate == Multimodal.wavRate(id), s"id=$id rate")
      assert(frames == Multimodal.wavSamples(id).toLong, s"id=$id frames")
      assert(first == Multimodal.wavAmp(id), s"id=$id first")
      assert(peak == math.abs(Multimodal.wavAmp(id)), s"id=$id peak")
    }
  }

  test("an undecodable payload surfaces the sentinel, not a silent stub") {
    assert(Multimodal.decodePng("not a png".getBytes("UTF-8")) == (-2, -2, -1L))
    assert(Multimodal.decodeWav("not a wav".getBytes("UTF-8")) == (-2, -2L, 0, -1))
  }

  test("extractFeatures really decodes image and audio rows; video stays stubbed") {
    val s = spark
    import s.implicits._
    val docs = Seq((3L, "hello"), (4L, "worldly"), (5L, "!"))
      .toDF("doc_id", "text").withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
    val feats = Multimodal.extractFeatures(s, Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    // doc 3: image — real decode of the generated 4×4 PNG, no hash/len
    assert(feats(3L).mime == "image/png")
    assert(feats(3L).width == 4 && feats(3L).height == 4)
    assert(feats(3L).rgb0 == (Multimodal.pngRgb(3L) & 0xffffff).toLong)
    assert(feats(3L).bytes_len.isEmpty && feats(3L).sha256.isEmpty)
    // doc 4: audio — REAL decode of the generated WAV (rate/samples/first
    // sample in the generic columns; true byte length; no sha)
    assert(feats(4L).mime == "audio/wav")
    assert(feats(4L).width == Multimodal.wavRate(4L))
    assert(feats(4L).height == Multimodal.wavSamples(4L))
    assert(feats(4L).rgb0 == Multimodal.wavAmp(4L).toLong)
    assert(feats(4L).bytes_len.contains(44L + 2 * Multimodal.wavSamples(4L)))
    assert(feats(4L).sha256.isEmpty && feats(4L).n_frames == 1)
    // doc 5: video — stubbed frame count
    assert(feats(5L).mime == "video/mp4" && feats(5L).n_frames == 1 + 1 % 7)
  }

  test("audioProbe computes duration from the decoded rate and frame count") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a"), (4L, "b"), (7L, "c"), (2L, "skip"))
      .toDF("doc_id", "text").withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
    val probes = Multimodal.audioProbe(s, Multimodal.mediaTable(docs))
      .collect().map(p => p.doc_id -> p).toMap
    assert(probes.keySet == Set(1L, 4L, 7L)) // only doc_id ≡ 1 mod 3 rows
    for ((id, p) <- probes) {
      assert(p.sample_rate == Multimodal.wavRate(id))
      assert(p.n_samples == Multimodal.wavSamples(id).toLong)
      assert(p.duration_us == p.n_samples * 1000000L / p.sample_rate)
      assert(p.first_sample == Multimodal.wavAmp(id))
      assert(p.peak_abs == math.abs(Multimodal.wavAmp(id)))
    }
  }
}
