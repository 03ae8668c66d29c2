package graft.functions

import graft.SparkSpec

/** Real PNG decode (VERDICT r5 item 8): the image path must round-trip
  * genuine PNG bytes through ImageIO — dimensions and pixels, not stub
  * arithmetic — while audio/video keep the labeled stub. */
class MultimodalSpec extends SparkSpec {

  test("makePng → decodePng round-trips dimensions and the probe pixel") {
    Seq(0L, 1L, 7L, 42L, 299L, 123456L).foreach { id =>
      val (w, h, rgb) = Multimodal.decodePng(Multimodal.makePng(id))
      assert(w == Multimodal.pngWidth(id) && h == Multimodal.pngHeight(id))
      assert(rgb == (Multimodal.pngRgb(id) & 0xffffff).toLong)
    }
  }

  test("an undecodable payload surfaces the sentinel, not a silent stub") {
    assert(Multimodal.decodePng("not a png".getBytes("UTF-8")) == (-2, -2, -1L))
  }

  test("extractFeatures really decodes image rows and stubs audio/video") {
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
    // doc 4: audio — stub arithmetic over the 7-byte text payload
    assert(feats(4L).mime == "audio/wav")
    assert(feats(4L).width == 64 + 7 % 577 && feats(4L).n_frames == 1)
    assert(feats(4L).bytes_len.contains(7L) && feats(4L).rgb0 == -1L)
    // doc 5: video — stubbed frame count
    assert(feats(5L).mime == "video/mp4" && feats(5L).n_frames == 1 + 1 % 7)
  }
}
