package graft.ql

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Technical-analysis transforms over a time series — the InfluxQL 1.x
  * analytics surface (EXPONENTIAL_MOVING_AVERAGE, RELATIVE_STRENGTH_INDEX,
  * CHANDE_MOMENTUM_OSCILLATOR, KAUFMANS_*, TRIPLE_EXPONENTIAL_*,
  * HOLT_WINTERS). The reference's merge layer rejects every one of these
  * (`/root/reference/service/merge/query_merge.go:171-184` routes only its
  * whitelisted aggregates), so InfluxQL users run them single-node; here
  * they are first-class over the bucketed series.
  *
  * Execution shape: these recurrences are inherently sequential PER SERIES
  * (EMA_t depends on EMA_{t-1}), so the parallel unit is the series — the
  * same contract Spark's own window functions use. One shuffle on the tag
  * key, then an imperative fold per group via flatMapGroups; series
  * cardinality drives scale-out, and a single series is bucket-count long
  * (bounded by the queried range / interval, not by raw row count), so the
  * per-group materialization matches what a window partition would hold.
  *
  * Determinism contract (DuckDB-oracle checked): every accumulation is a
  * LEFT FOLD in (time, value) order with explicitly ordered double
  * arithmetic, so a recursive CTE stepping the same formulas reproduces
  * results bit-for-bit. Rolling sums are re-folded fresh per row (not
  * ring-buffer updated) to match a windowed list left-fold exactly.
  *
  * Warmup conventions (documented semantics, pinned by specs + oracles):
  *   - EMA(N): seed = arithmetic mean of the first N points (accumulated
  *     sequentially), emitted at point N; then ema = α·x + (1−α)·ema with
  *     α = 2/(N+1).
  *   - DEMA/TEMA chain the same machine over the EMA stream (output starts
  *     at 2N−1 / 3N−2); TRIX emits the percent change of the triple EMA.
  *   - RSI(N): Wilder — seed avgGain/avgLoss = mean of the first N deltas,
  *     then smoothed ((prev·(N−1) + cur)/N); avgLoss = 0 → 100.
  *   - CMO(N)/KER(N): pure rolling folds over the last N deltas.
  *   - KAMA(N): ER·(2/3 − 2/31) + 2/31 squared, seeded at point N with the
  *     point's own value.
  */
object SeriesAnalytics {

  val FOLD_FNS: Set[String] = Set(
    "exponential_moving_average", "double_exponential_moving_average",
    "triple_exponential_moving_average", "triple_exponential_derivative",
    "relative_strength_index", "chande_momentum_oscillator",
    "kaufmans_efficiency_ratio", "kaufmans_adaptive_moving_average")

  /** One EMA stage as a resumable state machine: feed points in order, it
    * yields Some(ema) once warm. Chaining three gives DEMA/TEMA/TRIX. */
  private final class EmaState(n: Int) {
    private val alpha = 2.0 / (n + 1)
    private var seen = 0
    private var acc = 0.0
    private var ema = 0.0
    def push(x: Double): Option[Double] = {
      seen += 1
      if (seen < n) { acc = acc + x; None }
      else if (seen == n) { ema = (acc + x) / n; Some(ema) }
      else { ema = alpha * x + (1 - alpha) * ema; Some(ema) }
    }
  }

  /** Apply `fn` over one ordered series; emits (time, value) pairs. */
  def series(fn: String, n: Int, pts: Array[(Long, Double)]): Array[(Long, Double)] = {
    require(n >= 2, s"$fn period must be >= 2")
    val out = Array.newBuilder[(Long, Double)]
    fn match {
      case "exponential_moving_average" =>
        val e = new EmaState(n)
        pts.foreach { case (t, x) => e.push(x).foreach(v => out += ((t, v))) }
      case "double_exponential_moving_average" =>
        val (e1, e2) = (new EmaState(n), new EmaState(n))
        pts.foreach { case (t, x) =>
          e1.push(x).foreach(v1 => e2.push(v1).foreach(v2 => out += ((t, 2 * v1 - v2)))) }
      case "triple_exponential_moving_average" =>
        val (e1, e2, e3) = (new EmaState(n), new EmaState(n), new EmaState(n))
        pts.foreach { case (t, x) =>
          e1.push(x).foreach(v1 => e2.push(v1).foreach(v2 =>
            e3.push(v2).foreach(v3 => out += ((t, 3 * v1 - 3 * v2 + v3))))) }
      case "triple_exponential_derivative" => // TRIX: % change of the triple EMA
        val (e1, e2, e3) = (new EmaState(n), new EmaState(n), new EmaState(n))
        var prev = Double.NaN
        pts.foreach { case (t, x) =>
          e1.push(x).foreach(v1 => e2.push(v1).foreach(v2 => e3.push(v2).foreach { v3 =>
            if (!prev.isNaN && prev != 0.0) out += ((t, 100.0 * (v3 - prev) / prev))
            prev = v3
          })) }
      case "relative_strength_index" =>
        var i = 0; var avgU = 0.0; var avgD = 0.0
        var prev = 0.0; var diffs = 0
        pts.foreach { case (t, x) =>
          if (i > 0) {
            val d = x - prev
            val (u, dn) = (math.max(d, 0.0), math.max(-d, 0.0))
            diffs += 1
            if (diffs < n) { avgU = avgU + u; avgD = avgD + dn }
            else {
              if (diffs == n) { avgU = (avgU + u) / n; avgD = (avgD + dn) / n }
              else { avgU = (avgU * (n - 1) + u) / n; avgD = (avgD * (n - 1) + dn) / n }
              val rsi = if (avgD == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + avgU / avgD)
              out += ((t, rsi))
            }
          }
          prev = x; i += 1
        }
      case "chande_momentum_oscillator" =>
        // rolling left-folds over the last N deltas, re-folded per row to
        // match the oracle's windowed-list fold exactly
        val d = deltas(pts)
        var k = n - 1
        while (k < d.length) {
          var su = 0.0; var sd = 0.0
          var j = k - (n - 1)
          while (j <= k) {
            val x = d(j)._2
            su = su + math.max(x, 0.0); sd = sd + math.max(-x, 0.0)
            j += 1
          }
          val tot = su + sd
          out += ((d(k)._1, if (tot == 0.0) 0.0 else 100.0 * (su - sd) / tot))
          k += 1
        }
      case "kaufmans_efficiency_ratio" =>
        var k = n
        while (k < pts.length) {
          out += ((pts(k)._1, efficiencyRatio(pts, k, n)))
          k += 1
        }
      case "kaufmans_adaptive_moving_average" =>
        val (fastSc, slowSc) = (2.0 / (2 + 1), 2.0 / (30 + 1))
        var k = n
        var kama = if (pts.length > n) pts(n - 1)._2 else 0.0 // seed: point before first ER
        while (k < pts.length) {
          val er = efficiencyRatio(pts, k, n)
          val sc = { val s = er * (fastSc - slowSc) + slowSc; s * s }
          kama = kama + sc * (pts(k)._2 - kama)
          out += ((pts(k)._1, kama))
          k += 1
        }
      case o => throw ParseException(s"unsupported analytics transform $o")
    }
    out.result()
  }

  private def deltas(pts: Array[(Long, Double)]): Array[(Long, Double)] = {
    val d = new Array[(Long, Double)](math.max(pts.length - 1, 0))
    var i = 1
    while (i < pts.length) { d(i - 1) = (pts(i)._1, pts(i)._2 - pts(i - 1)._2); i += 1 }
    d
  }

  /** ER at index k: |x_k − x_{k−n}| / Σ|Δ| over the last n deltas, folded
    * fresh left-to-right (0/0 → 0). */
  private def efficiencyRatio(pts: Array[(Long, Double)], k: Int, n: Int): Double = {
    var vol = 0.0
    var j = k - n + 1
    while (j <= k) { vol = vol + math.abs(pts(j)._2 - pts(j - 1)._2); j += 1 }
    if (vol == 0.0) 0.0 else math.abs(pts(k)._2 - pts(k - n)._2) / vol
  }

  /** DataFrame-level application: `df` has (time: LONG, tags…, `vCol`);
    * output (time, tags…, `outName`). One shuffle on the tag key, a
    * sequential fold per series — the inherent shape of a recurrence. */
  def apply(df: DataFrame, tags: Seq[String], vCol: String,
      fn: String, n: Int, outName: String): DataFrame =
    applySeries(df, tags, vCol, outName)(series(fn, n, _))

  /** HOLT_WINTERS[_WITH_FIT] over the bucketed series (see below). */
  def applyHoltWinters(df: DataFrame, tags: Seq[String], vCol: String,
      n: Int, season: Int, intervalUs: Long, outName: String,
      withFit: Boolean = false): DataFrame =
    applySeries(df, tags, vCol, outName)(
      holtWintersImpl(_, n, season, intervalUs, withFit))

  private def applySeries(df: DataFrame, tags: Seq[String], vCol: String,
      outName: String)(f: Array[(Long, Double)] => Array[(Long, Double)]): DataFrame = {
    val in = df.select(
      (col("time").cast("long") +: tags.map(t => col(t).cast("string"))) :+
        col(vCol).cast("double"): _*)
    val schema = StructType(
      StructField("time", LongType) +:
      tags.map(StructField(_, StringType)) :+
      StructField(outName, DoubleType))
    val nTags = tags.length
    val grouped = in.groupByKey { r =>
      (1 to nTags).map(i => Option(r.getString(i)).getOrElse("\u0000")).mkString("\u0001")
    }(Encoders.STRING)
    grouped.flatMapGroups { (_, it) =>
      val rows = it.toArray
      // deterministic series order: (time, value) — ties can't depend on
      // partition arrival order or the oracle diverges
      java.util.Arrays.sort(rows, Ordering.by((r: Row) => (r.getLong(0), r.getDouble(nTags + 1))))
      val pts = rows.map(r => (r.getLong(0), r.getDouble(nTags + 1)))
      val tagVals = if (rows.isEmpty) Seq.empty else (1 to nTags).map(rows(0).get)
      f(pts).iterator.map { case (t, v) =>
        Row.fromSeq((t +: tagVals) :+ v)
      }
    }(Encoders.row(schema))
  }

  /** HOLT_WINTERS(agg(f), N, S): predict N points one interval apart past
    * the series end, additive triple exponential smoothing with season
    * length S (S = 0 → non-seasonal double smoothing). InfluxDB fits its
    * smoothing constants with Nelder-Mead on SSE; here the fit is a
    * deterministic coarse grid (α, β, γ ∈ {0.05, 0.15, …, 0.95}, first
    * minimum wins), so repeated runs — and both engines of a compare —
    * agree exactly: the DuckDB oracle (InfluxQLSuite.holtWintersOracle)
    * replays the full grid in one recursive CTE and hash-matches
    * bit-identical doubles, on top of the spec pins here. */
  def holtWinters(pts: Array[(Long, Double)], n: Int, season: Int,
      intervalUs: Long): Array[(Long, Double)] =
    holtWintersImpl(pts, n, season, intervalUs, withFit = false)

  /** HOLT_WINTERS_WITH_FIT: the one-step-ahead fitted value at every
    * observed point (from the second point on) followed by the N
    * forecasts — the InfluxQL twin that exposes the fit quality. */
  def holtWintersWithFit(pts: Array[(Long, Double)], n: Int, season: Int,
      intervalUs: Long): Array[(Long, Double)] =
    holtWintersImpl(pts, n, season, intervalUs, withFit = true)

  private def holtWintersImpl(pts: Array[(Long, Double)], n: Int, season: Int,
      intervalUs: Long, withFit: Boolean): Array[(Long, Double)] = {
    val m = pts.length
    val s = season
    if (m < math.max(2 * math.max(s, 1), 4)) return Array.empty
    val xs = pts.map(_._2)
    val grid = (0 until 10).map(i => 0.05 + 0.1 * i)

    // evaluate one (α,β,γ): returns (sse, level, trend, seasonals) at end;
    // `fit` (when non-null) records the one-step-ahead prediction per step
    def run(a: Double, b: Double, g: Double,
        fit: Array[Double] = null): (Double, Double, Double, Array[Double]) = {
      var level = xs(0)
      var trend = if (s > 0) {
        var d = 0.0
        var i = 0
        while (i < s) { d = d + (xs(s + i) - xs(i)) / s; i += 1 }
        d / s
      } else xs(1) - xs(0)
      val seas = if (s > 0) {
        val init = new Array[Double](s)
        var i = 0
        while (i < s) { init(i) = xs(i) - level; i += 1 }
        init
      } else Array.empty[Double]
      var sse = 0.0
      var t = 1
      while (t < m) {
        // observation t belongs to season slot t % s (slots seeded from
        // observations 0..s-1); the slot was last updated a season ago
        val si = if (s > 0) seas(t % s) else 0.0
        val pred = level + trend + si
        if (fit != null) fit(t - 1) = pred
        val err = xs(t) - pred
        sse = sse + err * err
        val newLevel =
          if (s > 0) a * (xs(t) - si) + (1 - a) * (level + trend)
          else a * xs(t) + (1 - a) * (level + trend)
        val newTrend = b * (newLevel - level) + (1 - b) * trend
        if (s > 0) seas(t % s) = g * (xs(t) - newLevel) + (1 - g) * si
        level = newLevel; trend = newTrend
        t += 1
      }
      (sse, level, trend, seas)
    }

    var bestParams: (Double, Double, Double) = null
    var bestSse = Double.MaxValue
    for (a <- grid; b <- grid; g <- if (s > 0) grid else Seq(0.0)) {
      val sse = run(a, b, g)._1
      if (sse < bestSse) { bestSse = sse; bestParams = (a, b, g) }
    }
    // one recording re-run with the winning constants
    val fit = if (withFit) new Array[Double](m - 1) else null
    val (_, level, trend, seas) = run(bestParams._1, bestParams._2, bestParams._3, fit)
    val lastT = pts(m - 1)._1
    val forecast = (1 to n).map { h =>
      val si = if (s > 0) seas((m - 1 + h) % s) else 0.0 // forecast obs index
      (lastT + h * intervalUs, level + h * trend + si)
    }
    val fitted =
      if (withFit) (1 until m).map(t => (pts(t)._1, fit(t - 1)))
      else Seq.empty
    (fitted ++ forecast).toArray
  }
}
