package graft.streaming

import graft.SparkSpec
import graft.queries.DocText
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The streaming-ingest → batch-sweep handoff (VERDICT r10 item 4): the
  * stream suppresses near-dups INSIDE the watermark horizon and
  * deliberately re-admits ones arriving after it — those are the batch
  * sweep's job. This spec runs the full composition over ONE corpus with
  * planted dups straddling the horizon and asserts the final survivor
  * set equals the all-batch baseline (the same banded-MinHash collapse
  * run over everything at once) — i.e. the two halves agree on what
  * "near-duplicate" means and nothing falls through the seam. */
class StreamBatchHandoffSpec extends SparkSpec {

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def words(p: String): String = (1 to 40).map(i => s"$p$i").mkString(" ")
  private def nearOf(p: String): String =
    (1 to 39).map(i => s"$p$i").mkString(" ") + " zz"

  test("stream admit + batch sweep equals the all-batch near-dup baseline") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // the corpus: families a (in-horizon dup), b (POST-horizon dup — the
    // straddle case), plus three singletons
    val corpus: Seq[(Long, Timestamp, String)] = Seq(
      (1L, t("10:00"), words("a")),
      (2L, t("10:01"), words("b")),
      (3L, t("10:02"), words("c")),
      (4L, t("10:05"), nearOf("a")), // within the 10-min horizon of doc 1
      (5L, t("12:00"), words("d")),
      (6L, t("12:01"), nearOf("b"))) // 2h after doc 2: horizon long past

    // ---- streaming half: admit through NearDedupStream, batch by batch
    val admitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDS().map { case (ts, id, tx) => NearDedupStream.Doc(ts, id, tx) }
    val q = NearDedupStream.bandFlags(docs, horizonMs = 600000L)
      .writeStream.outputMode("append")
      .foreachBatch { (flags: org.apache.spark.sql.Dataset[NearDedupStream.Flag], _: Long) =>
        NearDedupStream.admitted(flags.toDF()).collect()
          .foreach(r => admitted.add(r.getAs[Long]("doc_id")))
      }
      .start()
    try {
      // arrival order; docs 5 and 6 in separate triggers so the watermark
      // advanced by doc 5 evicts family b's horizon state before doc 6
      // arrives (in one trigger the stream would still suppress it — and
      // then the sweep has nothing to do, which defeats the straddle test)
      Seq(Seq(0, 1), Seq(2, 3), Seq(4), Seq(5)).foreach { ix =>
        input.addData(ix.map(corpus).map { case (id, ts, tx) => (ts, id, tx) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val streamAdmits = admitted.iterator().asScala.toSet
    // the stream's contract: in-horizon dup suppressed, post-horizon
    // re-admitted (it falls to the sweep)
    assert(streamAdmits == Set(1L, 2L, 3L, 5L, 6L), streamAdmits.toString)

    // ---- batch half: the periodic sweep. Index the settled corpus
    // (admits older than the sweep cutoff), incrementally check the
    // recent admits against it, drop matches.
    val byId = corpus.map(c => c._1 -> c).toMap
    val cutoff = t("11:00").getTime
    val settled = streamAdmits.filter(byId(_)._2.getTime < cutoff)
    val recent = streamAdmits.filter(byId(_)._2.getTime >= cutoff)
    def df(ids: Set[Long]) =
      ids.toSeq.sorted.map(byId).map(c => (c._1, c._3)).toDF("doc_id", "text")
    val idx = graft.TempDirs.scratch("handoff_idx").toString
    DocText.neardupIndexBuild(df(settled), idx)
    val swept = DocText.neardupCheck(df(recent), idx)
      .select("new_doc").collect().map(_.getLong(0)).toSet
    val finalSurvivors = settled ++ (recent -- swept)

    // ---- all-batch baseline: the same collapse over EVERYTHING at once —
    // a doc survives iff no earlier doc (arrival order) near-matches it
    val idxB = graft.TempDirs.scratch("handoff_base").toString
    DocText.neardupIndexBuild(df(corpus.map(_._1).toSet), idxB)
    val pairs = DocText.neardupCheck(df(corpus.map(_._1).toSet), idxB)
      .select("new_doc", "old_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def earlier(o: Long, d: Long) = {
      val (to, td) = (byId(o)._2.getTime, byId(d)._2.getTime)
      to < td || (to == td && o < d)
    }
    val baseline = corpus.map(_._1)
      .filter(d => !pairs.exists { case (n, o) => n == d && o != d && earlier(o, d) })
      .toSet

    assert(finalSurvivors == baseline,
      s"handoff seam leak: stream+sweep=$finalSurvivors, all-batch=$baseline")
    assert(baseline == Set(1L, 2L, 3L, 5L)) // the planted expectation
  }

  /** The takedown↔stream-state seam (VERDICT r11 ask): deleting a doc
    * from the persisted index does NOT purge its in-flight band claims —
    * stream state is horizon-bounded and index-independent by design. The
    * contract this pins: suppression on behalf of removed content is
    * TRANSIENT, ending within one watermark horizon (claims evict, and
    * the sweep checks against the post-takedown index), while takedowns
    * never leak suppression onto surviving content. */
  test("takedown does not purge in-flight claims; suppression ends with the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val corpus: Seq[(Long, Timestamp, String)] = Seq(
      (1L, t("10:00"), words("a")),  // A: indexed, streamed, then taken down
      (2L, t("10:01"), words("b")),  // B: indexed survivor
      (3L, t("10:05"), nearOf("a")), // A-replica INSIDE A's claim horizon
      (4L, t("12:00"), words("d")),  // watermark mover
      (5L, t("12:01"), nearOf("a")), // A-replica after the horizon
      (6L, t("12:02"), nearOf("b"))) // B-replica after the horizon
    val byId = corpus.map(c => c._1 -> c).toMap

    // the settled corpus at rest, then the takedown of A — through the
    // DataFrame-keyed API (the retention-query shape)
    val idx = graft.TempDirs.scratch("takedown_seam").toString
    DocText.neardupIndexBuild(
      Seq(byId(1L), byId(2L)).map(c => (c._1, c._3)).toDF("doc_id", "text"), idx)
    assert(DocText.neardupIndexDelete(s, idx, Seq(1L).toDF("doc_id")) == 1L)

    val admitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDS().map { case (ts, id, tx) => NearDedupStream.Doc(ts, id, tx) }
    val q = NearDedupStream.bandFlags(docs, horizonMs = 600000L)
      .writeStream.outputMode("append")
      .foreachBatch { (flags: org.apache.spark.sql.Dataset[NearDedupStream.Flag], _: Long) =>
        NearDedupStream.admitted(flags.toDF()).collect()
          .foreach(r => admitted.add(r.getAs[Long]("doc_id")))
      }
      .start()
    try {
      Seq(Seq(0, 1), Seq(2), Seq(3), Seq(4, 5)).foreach { ix =>
        input.addData(ix.map(corpus).map { case (id, ts, tx) => (ts, id, tx) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val streamAdmits = admitted.iterator().asScala.toSet
    // doc 3 suppressed by A's still-live claim (bounded staleness: the
    // takedown happened before it arrived, and that is accepted within
    // one horizon); docs 5 and 6 re-admit — horizon passed, sweep's call
    assert(streamAdmits == Set(1L, 2L, 4L, 5L, 6L), streamAdmits.toString)

    // the sweep against the post-takedown index: A's replica SURVIVES
    // (its original is gone), B's replica collapses
    val recent = Seq(byId(5L), byId(6L)).map(c => (c._1, c._3)).toDF("doc_id", "text")
    val swept = DocText.neardupCheck(recent, idx)
      .select("new_doc").collect().map(_.getLong(0)).toSet
    assert(swept == Set(6L),
      s"post-takedown sweep: expected only B's replica to collapse, got $swept")
  }
}
