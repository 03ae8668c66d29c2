package graft.ql

import graft.SparkSpec
import org.apache.spark.sql.DataFrame


/** The chunked series-fold path (round 7): an untagged transform query
  * must NOT funnel the series through a single unpartitioned Window — it
  * cuts the series into time-range chunks with carry rows — and the
  * chunked fold must be BIT-EQUAL to the sequential global window,
  * including across thin/empty chunks where the carry has to cascade
  * beyond the immediately-preceding chunk. */
class ChunkedFoldSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  /** 200 points with a deliberately lumpy time axis: a dense head, a long
    * gap (several EMPTY chunks), then a sparse tail where chunks hold
    * fewer rows than the moving_average lookback — the cascade case. */
  private lazy val lumpy: DataFrame = {
    val s = spark
    import s.implicits._
    val rows =
      (0 until 150).map(i => (1000L + i * 7L, math.sin(i * 0.37) * 100.0)) ++
        (0 until 50).map(i => (900000L + i * 33333L, math.cos(i * 0.53) * 40.0))
    rows.toDF("ts_us", "value")
  }
  private val meta = TableMeta("m", "ts_us",
    tags = Seq(), fields = Seq(FieldMeta("value", None)))

  private def run(q: String, chunks: Int): Array[org.apache.spark.sql.Row] = {
    spark.conf.set("graft.seriesFold.chunks", chunks.toString)
    spark.conf.set("graft.seriesFold.minBytes", "0") // force past the size gate
    try new Translator(lumpy, meta).run(Parser.parse(q).asInstanceOf[SelectStmt])
      .orderBy("time").collect()
    finally {
      spark.conf.unset("graft.seriesFold.chunks")
      spark.conf.unset("graft.seriesFold.minBytes")
    }
  }

  private val queries = Seq(
    "SELECT derivative(value, 1s) FROM m",
    "SELECT difference(value) FROM m",
    "SELECT non_negative_derivative(value, 1s) FROM m",
    "SELECT elapsed(value, 1ms) FROM m",
    "SELECT moving_average(value, 7) FROM m", // lookback 6 > sparse-tail chunk size
    "SELECT derivative(value, 1s), moving_average(value, 3) FROM m")

  test("chunked folds are bit-equal to the sequential global window") {
    for (q <- queries) {
      val seq = run(q, chunks = 1) // 1 disables chunking → global window
      val par = run(q, chunks = 16)
      assert(seq.length == par.length, s"$q: row count ${par.length} vs ${seq.length}")
      seq.zip(par).foreach { case (a, b) => assert(a == b, s"$q: $a != $b") }
    }
  }

  /** Two interleaved series under one low-cardinality tag — the GROUP BY
    * tag case whose parallelism the chunking lifts past the series count. */
  private lazy val tagged: DataFrame = {
    val s = spark
    import s.implicits._
    val rows = (0 until 300).map { i =>
      (1000L + i * 11L, if (i % 2 == 0) "a" else "b", math.sin(i * 0.21) * 50.0)
    }
    rows.toDF("ts_us", "host", "value")
  }
  private val taggedMeta = TableMeta("m", "ts_us",
    tags = Seq("host"), fields = Seq(FieldMeta("value", None)))

  test("tagged chunked folds are bit-equal to the per-series sequential window") {
    def runT(q: String, chunks: Int) = {
      spark.conf.set("graft.seriesFold.chunks", chunks.toString)
      spark.conf.set("graft.seriesFold.minBytes", "0")
      try new Translator(tagged, taggedMeta).run(Parser.parse(q).asInstanceOf[SelectStmt])
        .orderBy("host", "time").collect()
      finally {
        spark.conf.unset("graft.seriesFold.chunks")
        spark.conf.unset("graft.seriesFold.minBytes")
      }
    }
    for (q <- Seq(
        "SELECT moving_average(value, 5) FROM m GROUP BY host",
        "SELECT derivative(value, 1s) FROM m GROUP BY host",
        // transform over aggregate: the fold runs over the BUCKET series,
        // which is just as chunkable (time(1s) over a year ≈ 31M buckets)
        "SELECT derivative(mean(value)) FROM m GROUP BY time(1ms), host",
        "SELECT moving_average(sum(value), 4) FROM m GROUP BY time(1ms), host")) {
      val seq = runT(q, chunks = 1)
      val par = runT(q, chunks = 16)
      assert(seq.length == par.length, s"$q: ${par.length} vs ${seq.length}")
      seq.zip(par).foreach { case (a, b) => assert(a == b, s"$q: $a != $b") }
    }
  }

  /** cumulative_sum over a FIXED-POINT field takes the two-pass BIGINT
    * chunk-prefix path (r8): per-chunk integer prefixes + broadcast
    * offsets must reproduce the sequential window bit-for-bit, including
    * across empty chunks and null field values. */
  private val scaledMeta = TableMeta("m", "ts_us",
    tags = Seq(), fields = Seq(FieldMeta("value", Some(100L))))
  private val scaledTaggedMeta = TableMeta("m", "ts_us",
    tags = Seq("host"), fields = Seq(FieldMeta("value", Some(100L))))

  test("chunked fixed-point cumulative_sum is bit-equal to the sequential window") {
    def runC(df: DataFrame, m: TableMeta, q: String, chunks: Int, sort: Seq[String]) = {
      spark.conf.set("graft.seriesFold.chunks", chunks.toString)
      spark.conf.set("graft.seriesFold.minBytes", "0")
      try new Translator(df, m).run(Parser.parse(q).asInstanceOf[SelectStmt])
        .orderBy(sort.head, sort.tail: _*).collect()
      finally {
        spark.conf.unset("graft.seriesFold.chunks")
        spark.conf.unset("graft.seriesFold.minBytes")
      }
    }
    val q = "SELECT cumulative_sum(value) FROM m"
    for ((df, m, qq, sort) <- Seq(
        (lumpy, scaledMeta, q, Seq("time")),
        (tagged, scaledTaggedMeta, q + " GROUP BY host", Seq("host", "time")))) {
      val seq = runC(df, m, qq, chunks = 1, sort)
      val par = runC(df, m, qq, chunks = 16, sort)
      assert(seq.length == par.length, s"$qq: ${par.length} vs ${seq.length}")
      seq.zip(par).foreach { case (a, b) => assert(a == b, s"$qq: $a != $b") }
    }
    // null fields: result is null (row dropped) until the first non-null
    // value in the SERIES — not the chunk. Leading nulls land in chunk 0
    // while later chunks carry a zero local prefix; only the cross-chunk
    // count offsets distinguish the two cases.
    val s = spark
    import s.implicits._
    val withNulls = (0 until 120).map { i =>
      val v = if (i < 5 || i % 7 == 0) None else Some((i % 40) / 4.0)
      (1000L + i * 13L, v)
    }.toDF("ts_us", "value")
    val seqN = runC(withNulls, scaledMeta, q, chunks = 1, Seq("time"))
    val parN = runC(withNulls, scaledMeta, q, chunks = 16, Seq("time"))
    assert(seqN.length == parN.length, s"nulls: ${parN.length} vs ${seqN.length}")
    seqN.zip(parN).foreach { case (a, b) => assert(a == b, s"nulls: $a != $b") }
  }

  test("fixed-point cumulative_sum plan is chunk-partitioned end to end") {
    spark.conf.set("graft.seriesFold.chunks", "16")
    spark.conf.set("graft.seriesFold.minBytes", "0")
    try {
      val plan = new Translator(lumpy, scaledMeta)
        .run(Parser.parse("SELECT cumulative_sum(value) FROM m").asInstanceOf[SelectStmt])
        .queryExecution.optimizedPlan.toString
      val specs = "windowspecdefinition\\(([^)]*)\\)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(specs.nonEmpty)
      assert(!specs.exists(_.startsWith("ts_us#")),
        s"unpartitioned window survived in fixed-point cumsum plan: $specs")
    } finally {
      spark.conf.unset("graft.seriesFold.chunks")
      spark.conf.unset("graft.seriesFold.minBytes")
    }
  }

  test("the chunked plan has no unpartitioned Window; cumulative_sum keeps one") {
    // AQE wraps the physical plan, so inspect the analyzed window specs:
    // every windowspecdefinition must carry a partition column. A global
    // window prints windowspecdefinition(<order> ASC ...) with no
    // partition spec; the chunked ones lead with __chunk/__tgt.
    def specs(q: String): Seq[String] = {
      val plan = new Translator(lumpy, meta)
        .run(Parser.parse(q).asInstanceOf[SelectStmt])
        .queryExecution.optimizedPlan.toString
      "windowspecdefinition\\(([^)]*)\\)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
    }
    spark.conf.set("graft.seriesFold.chunks", "16")
    spark.conf.set("graft.seriesFold.minBytes", "0")
    try {
      // an UNpartitioned spec leads with the ORDER column (ts_us ASC);
      // partitioned ones lead with a partition key — __chunk for the
      // heavy windows, the optimizer's _wN alias of the derived constant
      // for the miniature boundary-repair window
      def unpartitioned(s: String) = s.startsWith("ts_us#")
      val ma = specs("SELECT moving_average(value, 7) FROM m")
      assert(ma.nonEmpty)
      assert(!ma.exists(unpartitioned), s"unpartitioned window survived: $ma")
      // the documented exception: unbounded-lookback cumsum stays sequential
      val cs = specs("SELECT cumulative_sum(value) FROM m")
      assert(cs.exists(unpartitioned), cs.toString)
    } finally {
      spark.conf.unset("graft.seriesFold.chunks")
      spark.conf.unset("graft.seriesFold.minBytes")
    }
  }
}
