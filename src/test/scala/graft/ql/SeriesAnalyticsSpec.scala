package graft.ql

import graft.SparkSpec

/** Semantics pins for the analytics recurrences. The 8 fold transforms are
  * oracle-checked end-to-end (iql_ema … iql_kama); here we pin the warmup
  * boundaries, hand-computed vectors, and the holt_winters forecast (which
  * has no SQL oracle). */
class SeriesAnalyticsSpec extends SparkSpec {

  private def pts(vs: Double*): Array[(Long, Double)] =
    vs.zipWithIndex.map { case (v, i) => ((i + 1) * 1000L, v) }.toArray

  test("EMA warmup: seed = mean of first N, then recursive; output starts at point N") {
    val out = SeriesAnalytics.series("exponential_moving_average", 3, pts(1, 2, 3, 4))
    assert(out.map(_._1).toSeq == Seq(3000L, 4000L))
    assert(out(0)._2 == 2.0) // (1+2+3)/3
    assert(out(1)._2 == 0.5 * 4 + 0.5 * 2.0) // α=2/4=0.5
  }

  test("DEMA/TEMA warmup boundaries: 2N-1 and 3N-2 points") {
    val p = pts((1 to 10).map(_.toDouble): _*)
    assert(SeriesAnalytics.series("double_exponential_moving_average", 3, p).length == 10 - (2 * 3 - 1) + 1)
    assert(SeriesAnalytics.series("triple_exponential_moving_average", 3, p).length == 10 - (3 * 3 - 2) + 1)
    // a perfectly linear series: EMA lags, DEMA/TEMA correct the lag —
    // both must sit closer to the true line than the plain EMA
    val ema = SeriesAnalytics.series("exponential_moving_average", 3, p).last._2
    val dema = SeriesAnalytics.series("double_exponential_moving_average", 3, p).last._2
    assert(math.abs(dema - 10.0) < math.abs(ema - 10.0))
  }

  test("RSI: all-up series → 100; all-down → 0; flat → 100 (avgLoss = 0)") {
    assert(SeriesAnalytics.series("relative_strength_index", 3,
      pts(1, 2, 3, 4, 5)).forall(_._2 == 100.0))
    assert(SeriesAnalytics.series("relative_strength_index", 3,
      pts(5, 4, 3, 2, 1)).forall(_._2 == 0.0))
    assert(SeriesAnalytics.series("relative_strength_index", 3,
      pts(2, 2, 2, 2, 2)).forall(_._2 == 100.0))
  }

  test("CMO: bounded in [-100, 100]; monotone up → 100; flat → 0") {
    assert(SeriesAnalytics.series("chande_momentum_oscillator", 3,
      pts(1, 2, 3, 4, 5)).forall(_._2 == 100.0))
    assert(SeriesAnalytics.series("chande_momentum_oscillator", 3,
      pts(3, 3, 3, 3, 3)).forall(_._2 == 0.0))
  }

  test("KER: straight line → 1 (perfectly efficient); zigzag → < 1") {
    assert(SeriesAnalytics.series("kaufmans_efficiency_ratio", 3,
      pts(1, 2, 3, 4, 5)).forall(_._2 == 1.0))
    assert(SeriesAnalytics.series("kaufmans_efficiency_ratio", 4,
      pts(1, 2, 1, 2, 1, 2)).forall(_._2 < 1.0))
  }

  test("KAMA stays between the signal's running bounds and tracks trends") {
    val out = SeriesAnalytics.series("kaufmans_adaptive_moving_average", 3,
      pts(1, 2, 3, 4, 5, 6, 7, 8))
    assert(out.nonEmpty)
    out.foreach { case (_, v) => assert(v >= 1.0 && v <= 8.0) }
    assert(out.map(_._2).sliding(2).forall(w => w(0) < w(1))) // monotone on a trend
  }

  test("holt_winters recovers a linear trend (non-seasonal, S=0)") {
    val p = (1 to 12).map(i => (i * 1000L, 10.0 + 3.0 * i)).toArray
    val f = SeriesAnalytics.holtWinters(p, 3, 0, 1000L)
    assert(f.map(_._1).toSeq == Seq(13000L, 14000L, 15000L))
    f.zipWithIndex.foreach { case ((_, v), i) =>
      val expect = 10.0 + 3.0 * (13 + i)
      assert(math.abs(v - expect) < 0.5, s"linear forecast $v vs $expect")
    }
  }

  test("holt_winters recovers a seasonal pattern (S=4)") {
    val season = Array(5.0, -1.0, 2.0, -6.0)
    val p = (0 until 16).map(i => ((i + 1) * 1000L, 50.0 + season(i % 4))).toArray
    val f = SeriesAnalytics.holtWinters(p, 4, 4, 1000L)
    assert(f.length == 4)
    f.zipWithIndex.foreach { case ((_, v), i) =>
      val expect = 50.0 + season((16 + i) % 4)
      assert(math.abs(v - expect) < 1.0, s"seasonal forecast $v vs $expect")
    }
  }

  test("holt_winters_with_fit emits fitted values then the forecast") {
    val p = (1 to 12).map(i => (i * 1000L, 10.0 + 3.0 * i)).toArray
    val f = SeriesAnalytics.holtWintersWithFit(p, 3, 0, 1000L)
    // one fitted value per observed point (from the 2nd) + 3 forecasts
    assert(f.length == 11 + 3)
    assert(f.map(_._1).toSeq == ((2 to 12).map(_ * 1000L) ++ Seq(13000L, 14000L, 15000L)))
    // fitted one-step-ahead predictions on a clean line converge onto it
    val tail = f.slice(8, 11)
    tail.foreach { case (t, v) => assert(math.abs(v - (10.0 + 3.0 * t / 1000)) < 0.5) }
    // the forecast half is identical to plain holt_winters
    assert(f.takeRight(3).toSeq == SeriesAnalytics.holtWinters(p, 3, 0, 1000L).toSeq)
  }

  test("holt_winters is deterministic and too-short series yield no forecast") {
    val p = (1 to 10).map(i => (i * 1000L, math.sin(i) * 10)).toArray
    val a = SeriesAnalytics.holtWinters(p, 3, 0, 1000L)
    val b = SeriesAnalytics.holtWinters(p, 3, 0, 1000L)
    assert(a.toSeq == b.toSeq)
    assert(SeriesAnalytics.holtWinters(p.take(3), 3, 4, 1000L).isEmpty)
  }

  test("raw-series InfluxQL dispatch matches the fold applied to the raw points") {
    // SELECT ema(value, N) FROM events (no GROUP BY time) routes through
    // transformSelect → SeriesAnalytics over raw doubles; cross-check the
    // whole front-end against the fold run on the collected series
    val df = Translator.query(spark, sfDir,
      "SELECT exponential_moving_average(value, 5) FROM events WHERE time < '2024-01-08' GROUP BY event_type")
    val got = df.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("time"),
        r.getAs[Double]("exponential_moving_average")))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    val raw = Translator.query(spark, sfDir,
      "SELECT value FROM events WHERE time < '2024-01-08' GROUP BY event_type")
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("time"), r.getAs[Double]("value")))
      .groupBy(_._1)
    assert(got.nonEmpty)
    raw.foreach { case (tag, rows) =>
      val pts = rows.map(t => (t._2, t._3)).sortBy(identity).toArray
      val want = SeriesAnalytics.series("exponential_moving_average", 5, pts).toSeq
      assert(got(tag) == want, s"raw EMA mismatch for $tag")
    }
  }

  test("DataFrame path groups by tag, sorts by (time, value), emits the fold") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq(
      ("a", 3000L, 3.0), ("a", 1000L, 1.0), ("a", 2000L, 2.0), ("a", 4000L, 4.0),
      ("b", 1000L, 10.0), ("b", 2000L, 20.0), ("b", 3000L, 30.0)
    )).toDF("tag", "time", "__v")
    val out = SeriesAnalytics(df, Seq("tag"), "__v", "exponential_moving_average", 3, "ema")
      .orderBy(col("tag"), col("time")).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("a", 3000L, 2.0), ("a", 4000L, 0.5 * 4 + 0.5 * 2.0), ("b", 3000L, 20.0)))
  }
}
