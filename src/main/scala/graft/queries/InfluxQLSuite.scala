package graft.queries

import graft.Q
import graft.ql.Translator

/** End-to-end InfluxQL queries: each entry is an InfluxQL STRING run through
  * the full front-end (Lexer → Parser → Translator → DataFrame), checked
  * against a DuckDB oracle that encodes the defined semantics (SURVEY §2.4,
  * §7.0). This is the proof that a user of the reference can submit their
  * InfluxQL and get the reference's answers from this engine.
  *
  * The `ev` CTE mirrors the translator's fixed-point discipline: value is a
  * 2-decimal field (scale 100), so sum/mean/stddev run over exact integer
  * cents on both engines. Output `time` is epoch-µs LONG, bucket-aligned via
  * `ts_us - ts_us % interval`.
  */
object InfluxQLSuite {

  private val EV =
    "ev AS (SELECT *, epoch_us(ts) AS ts_us, CAST(round(value*100) AS BIGINT) AS cents FROM events)"
  private val DAY_US = 86400000000L
  // daily-mean bucket series per tag + its row numbering — the shared input
  // of the analytics recurrences (identical doubles to the Spark side, the
  // iql_derivative_of_mean-proven pattern)
  private val BKT =
    s"""b AS (SELECT ts_us - ts_us % $DAY_US AS time, event_type,
       |       CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS v
       |     FROM ev GROUP BY 1, 2)""".stripMargin
  private val RN =
    "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY event_type ORDER BY time) AS BIGINT) AS rn FROM b)"
  private val LASTN =
    "PARTITION BY event_type ORDER BY time ROWS BETWEEN 3 PRECEDING AND CURRENT ROW"

  /** DuckDB replay of SeriesAnalytics.holtWintersImpl for
    * `holt_winters[_with_fit](mean(value), 5, 7) GROUP BY time(1d),
    * event_type`. One recursive CTE advances the additive triple-smoothing
    * state for EVERY (α,β,γ) grid combo at once — per step it carries
    * (level, trend, 7-slot seasonal list, sse, one-step pred); the argmin
    * over end-state sse (ties: first combo in loop order) selects the
    * winner whose recursion rows already hold the fitted values, and the
    * winner's end state extrapolates the N forecasts. CAST(… AS DOUBLE) on
    * the grid constants is load-bearing: DuckDB's DECIMAL 0.35 and Scala's
    * 0.05+0.1*3 double differ in the last ulp. */
  private def holtWintersOracle(withFit: Boolean): String = {
    val S = 7  // season length
    val N = 5  // forecast horizon
    val outCol = if (withFit) "holt_winters_with_fit" else "holt_winters"
    val guard = math.max(2 * S, 4)
    val base =
      s"""WITH RECURSIVE $EV, $BKT, $RN,
         |ser AS (SELECT event_type, list(v ORDER BY rn) AS xs, list(time ORDER BY rn) AS ts,
         |               CAST(count(*) AS BIGINT) AS m
         |        FROM r GROUP BY event_type),
         |init AS (SELECT event_type, m, ts[m] AS last_t, xs[1] AS level0,
         |           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |             list_transform(generate_series(0, ${S - 1}), i -> (xs[$S+i+1] - xs[i+1]) / $S.0)),
         |             (a, x) -> a + x) / $S.0 AS trend0,
         |           list_transform(generate_series(0, ${S - 1}), i -> xs[i+1] - xs[1]) AS seas0
         |         FROM ser WHERE m >= $guard),
         |combos AS (SELECT ai, bi, gi,
         |             CAST(0.05 AS DOUBLE) + CAST(0.1 AS DOUBLE)*ai AS al,
         |             CAST(0.05 AS DOUBLE) + CAST(0.1 AS DOUBLE)*bi AS be,
         |             CAST(0.05 AS DOUBLE) + CAST(0.1 AS DOUBLE)*gi AS ga
         |           FROM range(10) t1(ai), range(10) t2(bi), range(10) t3(gi)),
         |e AS (
         |  SELECT i.event_type, c.ai, c.bi, c.gi, CAST(1 AS BIGINT) AS rn,
         |         i.level0 AS level, i.trend0 AS trend, i.seas0 AS seas,
         |         CAST(0.0 AS DOUBLE) AS sse, CAST(NULL AS DOUBLE) AS pred
         |  FROM init i CROSS JOIN combos c
         |  UNION ALL
         |  SELECT r.event_type, e.ai, e.bi, e.gi, r.rn,
         |         a2*(r.v - si) + (1-a2)*(e.level + e.trend) AS level,
         |         b2*((a2*(r.v - si) + (1-a2)*(e.level + e.trend)) - e.level) + (1-b2)*e.trend AS trend,
         |         list_transform(generate_series(0, ${S - 1}), i ->
         |           CASE WHEN i = (r.rn-1) % $S
         |                THEN g2*(r.v - (a2*(r.v - si) + (1-a2)*(e.level + e.trend))) + (1-g2)*si
         |                ELSE e.seas[i+1] END) AS seas,
         |         e.sse + (r.v - (e.level + e.trend + si)) * (r.v - (e.level + e.trend + si)) AS sse,
         |         e.level + e.trend + si AS pred
         |  FROM e
         |  JOIN r ON r.event_type = e.event_type AND r.rn = e.rn + 1
         |  JOIN combos c ON c.ai = e.ai AND c.bi = e.bi AND c.gi = e.gi
         |  CROSS JOIN LATERAL (SELECT e.seas[((r.rn-1) % $S) + 1] AS si,
         |                             c.al AS a2, c.be AS b2, c.ga AS g2) x
         |),
         |win AS (SELECT event_type, ai, bi, gi FROM (
         |          SELECT e.event_type, e.ai, e.bi, e.gi,
         |                 row_number() OVER (PARTITION BY e.event_type
         |                                    ORDER BY e.sse ASC, e.ai ASC, e.bi ASC, e.gi ASC) AS wrn
         |          FROM e JOIN ser s ON s.event_type = e.event_type AND e.rn = s.m) WHERE wrn = 1),
         |fin AS (SELECT e.*, i.last_t, i.m FROM e
         |        JOIN win w ON (e.event_type, e.ai, e.bi, e.gi) = (w.event_type, w.ai, w.bi, w.gi)
         |        JOIN init i ON i.event_type = e.event_type
         |        JOIN ser s ON s.event_type = e.event_type
         |        WHERE e.rn = s.m),
         |fcast AS (SELECT last_t + h * $DAY_US AS time, event_type,
         |            level + h * trend + seas[((m - 1 + h) % $S) + 1] AS $outCol
         |          FROM fin CROSS JOIN (SELECT unnest(generate_series(1, $N)) AS h) hh)""".stripMargin
    if (withFit)
      s"""$base,
         |fitted AS (SELECT r.time, e.event_type, e.pred AS $outCol
         |           FROM e JOIN win w ON (e.event_type, e.ai, e.bi, e.gi) = (w.event_type, w.ai, w.bi, w.gi)
         |           JOIN r ON r.event_type = e.event_type AND r.rn = e.rn
         |           WHERE e.rn >= 2)
         |SELECT * FROM fitted UNION ALL SELECT * FROM fcast""".stripMargin
    else
      s"""$base
         |SELECT * FROM fcast""".stripMargin
  }

  private def iql(name: String, oracleSql: String)(influxql: String): Q =
    Q(name, oracleSql) { (s, d) => Translator.query(s, d, influxql) }

  def all: Seq[Q] = Seq(

    // ---- raw select: time+tag predicates, sort, limit (coordinator SELECT path)
    iql("iql_raw",
      s"""WITH $EV
         |SELECT ts_us AS time, value FROM ev
         |WHERE ts_us >= epoch_us(TIMESTAMP '2024-01-05') AND ts_us < epoch_us(TIMESTAMP '2024-01-08')
         |  AND event_type = 'click'
         |ORDER BY 1, 2 LIMIT 50""".stripMargin)(
      "SELECT value FROM events WHERE time >= '2024-01-05' AND time < '2024-01-08' AND event_type = 'click' ORDER BY time ASC LIMIT 50"),

    // ---- `::` type selectors (influxql SELECT-list syntax): field/tag
    //      hints validate-and-erase, cast hints (::float) convert — and
    //      they work in WHERE too
    iql("iql_typed_select",
      s"""WITH $EV
         |SELECT ts_us AS time, value, CAST(user_id AS DOUBLE) AS user_id, event_type
         |FROM ev
         |WHERE ts_us >= epoch_us(TIMESTAMP '2024-01-05') AND ts_us < epoch_us(TIMESTAMP '2024-01-06')
         |  AND event_type = 'click'""".stripMargin)(
      "SELECT value::field, user_id::float, event_type::tag FROM events WHERE time >= '2024-01-05' AND time < '2024-01-06' AND event_type::tag = 'click'"),

    // ---- `*::field` — wildcard restricted to fields (tags excluded)
    iql("iql_typed_wildcard",
      s"""WITH $EV
         |SELECT ts_us AS time, value, user_id FROM ev
         |WHERE ts_us >= epoch_us(TIMESTAMP '2024-01-05') AND ts_us < epoch_us(TIMESTAMP '2024-01-06')""".stripMargin)(
      "SELECT *::field FROM events WHERE time >= '2024-01-05' AND time < '2024-01-06'"),

    // ---- GROUP BY time(1d), tag: the reference's core distributed-agg shape
    iql("iql_mean_1d",
      s"""WITH $EV
         |SELECT ts_us - ts_us % $DAY_US AS time, event_type,
         |       CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS mean
         |FROM ev GROUP BY 1, 2""".stripMargin)(
      "SELECT mean(value) FROM events GROUP BY time(1d), event_type"),

    // ---- tz('Zone'): buckets align to LOCAL day boundaries; output time
    //      is the UTC instant of each local boundary. Both engines compute
    //      the identical shift-bucket-unshift (Spark from/to_utc_timestamp
    //      ≡ DuckDB timezone(Z, instant)/timezone(Z, wall), ICU tzdb).
    iql("iql_tz",
      s"""WITH $EV,
         |sh AS (SELECT *, epoch_us(timezone('America/New_York', make_timestamptz(ts_us))) AS wus
         |       FROM ev)
         |SELECT epoch_us(timezone('America/New_York', make_timestamp(wus - wus % $DAY_US))) AS time,
         |       event_type,
         |       CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS mean
         |FROM sh GROUP BY 1, 2""".stripMargin)(
      "SELECT mean(value) FROM events GROUP BY time(1d), event_type tz('America/New_York')"),

    // ---- tz + fill + local time literals: WHERE strings are wall-clock
    //      in the zone, the fill spine steps over LOCAL days, empty days
    //      coalesce to 0, and output times are UTC instants of local
    //      midnights. The oracle builds the identical wall-space spine.
    iql("iql_tz_fill",
      s"""WITH $EV,
         |f AS (SELECT * FROM ev
         |      WHERE ts_us >= epoch_us(timezone('America/New_York', TIMESTAMP '2024-01-02'))
         |        AND ts_us <  epoch_us(timezone('America/New_York', TIMESTAMP '2024-01-20'))),
         |sh2 AS (SELECT *, epoch_us(timezone('America/New_York', make_timestamptz(ts_us))) AS wus
         |        FROM f),
         |agg AS (SELECT wus - wus % $DAY_US AS wb,
         |          CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS mean
         |        FROM sh2 GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(epoch_us(TIMESTAMP '2024-01-02'),
         |                                        epoch_us(TIMESTAMP '2024-01-19'), $DAY_US)) AS wb)
         |SELECT epoch_us(timezone('America/New_York', make_timestamp(s.wb))) AS time,
         |       coalesce(a.mean, 0.0) AS mean
         |FROM spine s LEFT JOIN agg a ON a.wb = s.wb""".stripMargin)(
      "SELECT mean(value) FROM events WHERE time >= '2024-01-02' AND time < '2024-01-20' " +
        "GROUP BY time(1d) fill(0) tz('America/New_York')"),

    iql("iql_count_sum_1d",
      s"""WITH $EV
         |SELECT ts_us - ts_us % $DAY_US AS time,
         |       count(value) AS count, CAST(sum(cents) AS DOUBLE) / 100.0 AS sum
         |FROM ev WHERE event_type != 'purchase' GROUP BY 1""".stripMargin)(
      "SELECT count(value), sum(value) FROM events WHERE event_type != 'purchase' GROUP BY time(1d)"),

    iql("iql_minmax_spread",
      """SELECT event_type, min(value) AS min, max(value) AS max,
        |       max(value) - min(value) AS spread
        |FROM events GROUP BY 1""".stripMargin)(
      "SELECT min(value), max(value), spread(value) FROM events GROUP BY event_type"),

    // ---- bare selector + tag keys: the selected ROW's tag values come
    //      along (influxql selector semantics); deterministic under ties
    //      via the full lexicographic struct extremum
    iql("iql_selector_tag",
      s"""WITH $EV
         |SELECT value AS max, event_type FROM ev
         |ORDER BY value DESC, ts_us DESC, event_type DESC LIMIT 1""".stripMargin)(
      "SELECT max(value), event_type FROM events"),
    iql("iql_selector_tag_bucket",
      s"""WITH $EV, w AS (
         |  SELECT ts_us - ts_us % $DAY_US AS time, value, event_type,
         |    row_number() OVER (PARTITION BY ts_us - ts_us % $DAY_US
         |      ORDER BY ts_us ASC, value ASC, event_type ASC) AS rn
         |  FROM ev)
         |SELECT time, value AS first, event_type FROM w WHERE rn = 1""".stripMargin)(
      "SELECT first(value), event_type FROM events GROUP BY time(1d)"),

    iql("iql_first_last",
      s"""WITH $EV, w AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ts_us ASC,  value ASC)  AS rf,
         |    row_number() OVER (PARTITION BY event_type ORDER BY ts_us DESC, value DESC) AS rl
         |  FROM ev)
         |SELECT f.event_type, f.value AS first, l.value AS last
         |FROM (SELECT event_type, value FROM w WHERE rf = 1) f
         |JOIN (SELECT event_type, value FROM w WHERE rl = 1) l USING (event_type)""".stripMargin)(
      "SELECT first(value), last(value) FROM events GROUP BY event_type"),

    // ---- scalar math over aggregates (query_merge.go:211-267 chain)
    iql("iql_scalar_chain",
      s"""WITH $EV
         |SELECT event_type,
         |       abs(CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) * -3) AS abs
         |FROM ev GROUP BY 1""".stripMargin)(
      "SELECT abs(mean(value) * -3) FROM events GROUP BY event_type"),

    // ---- two-argument scalar math over aggregates (influxql 1.x:
    //      pow(x, y), atan2(y, x), log(x, b)). Transcendentals are NOT
    //      correctly-rounded: Spark evaluates via fdlibm (StrictMath.log)
    //      while DuckDB uses the platform libm, and the two can differ in
    //      the last ulp on unlucky inputs (hit at sf1: StrictMath.log of
    //      mean 49.18222342626342 is 1 ulp above libm's). Same
    //      quantization discipline as e_scalar_math, at 1e-6.
    {
      import org.apache.spark.sql.functions.{col, round}
      Q("iql_scalar_binary",
        s"""WITH $EV, m AS (
           |  SELECT event_type, CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS mv
           |  FROM ev GROUP BY 1)
           |SELECT event_type, round(pow(mv, 2), 6) AS pow,
           |       round(atan2(mv, 2), 6) AS atan2,
           |       round(ln(mv) / ln(10), 6) AS log
           |FROM m""".stripMargin) { (s, d) =>
        Translator.query(s, d,
          "SELECT pow(mean(value), 2), atan2(mean(value), 2), log(mean(value), 10) FROM events GROUP BY event_type")
          .select(col("event_type"), round(col("pow"), 6).as("pow"),
            round(col("atan2"), 6).as("atan2"), round(col("log"), 6).as("log"))
      }
    },

    // ---- the division-by-zero→0 compat shim (query_merge.go:326-330)
    iql("iql_div_zero",
      """SELECT event_type,
        |  CASE WHEN max(value) - max(value) = 0 THEN 0.0
        |       ELSE min(value) / (max(value) - max(value)) END AS min
        |FROM events GROUP BY 1""".stripMargin)(
      "SELECT min(value) / (max(value) - max(value)) FROM events GROUP BY event_type"),

    // ---- top/bottom N rows with timestamps (calls.go:153-217)
    iql("iql_top3",
      s"""WITH $EV, r AS (
         |  SELECT ts_us AS time, event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, ts_us ASC) AS rn
         |  FROM ev)
         |SELECT time, event_type, value AS top FROM r WHERE rn <= 3""".stripMargin)(
      "SELECT top(value, 3) FROM events GROUP BY event_type"),

    iql("iql_bottom2",
      s"""WITH $EV, r AS (
         |  SELECT ts_us AS time, event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value ASC, ts_us ASC) AS rn
         |  FROM ev)
         |SELECT time, event_type, value AS bottom FROM r WHERE rn <= 2""".stripMargin)(
      "SELECT bottom(value, 2) FROM events GROUP BY event_type"),

    // ---- top-N per TIME BUCKET (InfluxQL: GROUP BY time + top selects per
    //      bucket; the un-bucketed path returned a global top-N — regression)
    iql("iql_top_per_bucket",
      s"""WITH $EV, r AS (
         |  SELECT ts_us AS time, value,
         |    row_number() OVER (PARTITION BY ts_us - ts_us % $DAY_US
         |                       ORDER BY value DESC, ts_us ASC) AS rn
         |  FROM ev)
         |SELECT time, value AS top FROM r WHERE rn <= 2""".stripMargin)(
      "SELECT top(value, 2) FROM events GROUP BY time(1d)"),

    // ---- nearest-rank percentile: an actual point value (InfluxQL spec)
    iql("iql_percentile90",
      s"""WITH $EV, r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value ASC, ts_us ASC) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM ev)
         |SELECT event_type, value AS percentile FROM r
         |WHERE rn = CAST(ceil(90.0 / 100.0 * n) AS BIGINT)""".stripMargin)(
      "SELECT percentile(value, 90) FROM events GROUP BY event_type"),

    // ---- multi-row selectors UNDER GROUP BY time: the reference merges
    //      percentile/mode/distinct within each time step
    //      (service/coordinator.go:128-161; merge/calls.go:46-73,252-333) —
    //      the window partition must include the offset-aware bucket
    iql("iql_percentile_per_bucket",
      s"""WITH $EV, r AS (
         |  SELECT ts_us - ts_us % $DAY_US AS time, event_type, value,
         |    row_number() OVER (PARTITION BY ts_us - ts_us % $DAY_US, event_type
         |                       ORDER BY value ASC, ts_us ASC) AS rn,
         |    count(*) OVER (PARTITION BY ts_us - ts_us % $DAY_US, event_type) AS n
         |  FROM ev)
         |SELECT time, event_type, value AS percentile FROM r
         |WHERE rn = CAST(ceil(90.0 / 100.0 * n) AS BIGINT)""".stripMargin)(
      "SELECT percentile(value, 90) FROM events GROUP BY time(1d), event_type"),

    // per-bucket percentile + fill over the WHERE-range spine: buckets past
    // the last data point (Jan 30) emit filled zeros through Feb 4
    iql("iql_percentile_bucket_fill",
      s"""WITH $EV,
         |r AS (SELECT ts_us - ts_us % $DAY_US AS time, value,
         |        row_number() OVER (PARTITION BY ts_us - ts_us % $DAY_US
         |                           ORDER BY value ASC, ts_us ASC) AS rn,
         |        count(*) OVER (PARTITION BY ts_us - ts_us % $DAY_US) AS n
         |      FROM ev
         |      WHERE ts_us >= epoch_us(TIMESTAMP '2024-01-25')
         |        AND ts_us < epoch_us(TIMESTAMP '2024-02-05')
         |        AND event_type = 'purchase'),
         |b AS (SELECT time, value FROM r WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
         |spine AS (SELECT unnest(generate_series(
         |            epoch_us(TIMESTAMP '2024-01-25'),
         |            epoch_us(TIMESTAMP '2024-02-04'), $DAY_US)) AS time)
         |SELECT s.time, coalesce(b.value, 0.0) AS percentile
         |FROM spine s LEFT JOIN b ON b.time = s.time""".stripMargin)(
      "SELECT percentile(value, 50) FROM events WHERE time >= '2024-01-25' AND time < '2024-02-05' AND event_type = 'purchase' GROUP BY time(1d) fill(0)"),

    iql("iql_mode_per_bucket",
      s"""WITH $EV,
         |c AS (SELECT ts_us - ts_us % $DAY_US AS time, event_type, value, count(*) AS cnt
         |      FROM ev GROUP BY 1, 2, 3),
         |r AS (SELECT time, event_type, value,
         |        row_number() OVER (PARTITION BY time, event_type
         |                           ORDER BY cnt DESC, value ASC) AS rn
         |      FROM c)
         |SELECT time, event_type, value AS mode FROM r WHERE rn = 1""".stripMargin)(
      "SELECT mode(value) FROM events GROUP BY time(1d), event_type"),

    iql("iql_distinct_per_bucket",
      s"""WITH $EV
         |SELECT DISTINCT ts_us - ts_us % $DAY_US AS time, value AS "distinct"
         |FROM ev WHERE event_type = 'purchase'""".stripMargin)(
      "SELECT distinct(value) FROM events WHERE event_type = 'purchase' GROUP BY time(1d)"),

    iql("iql_integral_per_bucket",
      s"""WITH $EV, l AS (
         |  SELECT ts_us - ts_us % $DAY_US AS time, cents, ts_us,
         |    lag(cents) OVER (PARTITION BY ts_us - ts_us % $DAY_US ORDER BY ts_us) AS pc,
         |    lag(ts_us) OVER (PARTITION BY ts_us - ts_us % $DAY_US ORDER BY ts_us) AS pt
         |  FROM ev)
         |SELECT time,
         |  CAST(sum(CAST(cents + pc AS HUGEINT) * (ts_us - pt)) AS DOUBLE) / 200000000.0 AS integral
         |FROM l WHERE pt IS NOT NULL GROUP BY 1""".stripMargin)(
      "SELECT integral(value, 1s) FROM events GROUP BY time(1d)"),

    // sample per bucket: the reference's sample() is non-deterministic by
    // spec (calls.go:136-151), so any fixed uniform draw is valid — r12
    // pins the Lehmer integer draw (Translator.sampleKey), which DuckDB
    // computes identically → fully oracle-checkable
    iql("iql_sample_per_bucket",
      s"""WITH $EV, h AS (
         |  SELECT ts_us, ts_us - ts_us % $DAY_US AS bkt, value,
         |    ts_us % 2147483647 * 48271 % 2147483647 AS hk
         |  FROM ev)
         |SELECT ts_us AS time, value AS sample FROM (
         |  SELECT ts_us, value,
         |    row_number() OVER (PARTITION BY bkt ORDER BY hk ASC, ts_us ASC, value ASC) AS rn
         |  FROM h) WHERE rn <= 2""".stripMargin)(
      "SELECT sample(value, 2) FROM events GROUP BY time(1d)"),

    // ---- count(distinct f): nested-call form through the full front-end
    iql("iql_count_distinct",
      "SELECT event_type, count(DISTINCT user_id) AS count FROM events GROUP BY 1")(
      "SELECT count(distinct(user_id)) FROM events GROUP BY event_type"),

    iql("iql_median",
      s"""WITH $EV
         |SELECT event_type, quantile_cont(cents, 0.5) / 100.0 AS median
         |FROM ev GROUP BY 1""".stripMargin)(
      "SELECT median(value) FROM events GROUP BY event_type"),

    iql("iql_mode",
      """WITH c AS (SELECT event_type, value, count(*) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, value ASC) AS rn
        |      FROM c)
        |SELECT event_type, value AS mode FROM r WHERE rn = 1""".stripMargin)(
      "SELECT mode(value) FROM events GROUP BY event_type"),

    iql("iql_distinct",
      """SELECT DISTINCT value AS "distinct" FROM events WHERE event_type = 'click'""")(
      "SELECT distinct(value) FROM events WHERE event_type = 'click'"),

    iql("iql_stddev",
      s"""WITH $EV
         |SELECT event_type,
         |  sqrt((CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE)/10000.0
         |        - (CAST(sum(cents) AS DOUBLE)/100.0) * (CAST(sum(cents) AS DOUBLE)/100.0)
         |          / CAST(count(value) AS DOUBLE))
         |       / CAST(count(value) - 1 AS DOUBLE)) AS stddev
         |FROM ev GROUP BY 1""".stripMargin)(
      "SELECT stddev(value) FROM events GROUP BY event_type"),

    // ---- transforms over raw series (rejected by the reference's merge
    //      layer, first-class here — SURVEY §2.4 last row)
    iql("iql_derivative",
      s"""WITH $EV, l AS (
         |  SELECT ts_us, event_type, cents,
         |    lag(cents) OVER (PARTITION BY event_type ORDER BY ts_us) AS pc,
         |    lag(ts_us) OVER (PARTITION BY event_type ORDER BY ts_us) AS pt
         |  FROM ev)
         |SELECT ts_us AS time, event_type,
         |  (CAST(cents - pc AS DOUBLE) / 100.0) / (CAST(ts_us - pt AS DOUBLE) / 1000000.0) AS derivative
         |FROM l WHERE pt IS NOT NULL AND ts_us > pt""".stripMargin)(
      "SELECT derivative(value, 1s) FROM events GROUP BY event_type"),

    iql("iql_nonneg_derivative",
      s"""WITH $EV, l AS (
         |  SELECT ts_us, event_type, cents,
         |    lag(cents) OVER (PARTITION BY event_type ORDER BY ts_us) AS pc,
         |    lag(ts_us) OVER (PARTITION BY event_type ORDER BY ts_us) AS pt
         |  FROM ev),
         |d AS (SELECT ts_us AS time, event_type,
         |        (CAST(cents - pc AS DOUBLE) / 100.0) / (CAST(ts_us - pt AS DOUBLE) / 1000000.0) AS nnd
         |      FROM l WHERE pt IS NOT NULL AND ts_us > pt)
         |SELECT time, event_type, nnd AS non_negative_derivative FROM d WHERE nnd >= 0""".stripMargin)(
      "SELECT non_negative_derivative(value, 1s) FROM events GROUP BY event_type"),

    iql("iql_cumsum",
      s"""WITH $EV
         |SELECT ts_us AS time, event_type,
         |  CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY ts_us
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    / 100.0 AS cumulative_sum
         |FROM ev""".stripMargin)(
      "SELECT cumulative_sum(value) FROM events GROUP BY event_type"),

    iql("iql_moving_avg",
      s"""WITH $EV
         |SELECT ts_us AS time, event_type,
         |  CAST(sum(cents) OVER w AS DOUBLE) / (100.0 * count(cents) OVER w) AS moving_average
         |FROM ev
         |WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
         |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin)(
      "SELECT moving_average(value, 3) FROM events GROUP BY event_type"),

    iql("iql_elapsed",
      s"""WITH $EV, l AS (
         |  SELECT ts_us, event_type,
         |    lag(ts_us) OVER (PARTITION BY event_type ORDER BY ts_us) AS pt
         |  FROM ev)
         |SELECT ts_us AS time, event_type, (ts_us - pt) // 60000000 AS elapsed
         |FROM l WHERE pt IS NOT NULL""".stripMargin)(
      "SELECT elapsed(value, 1m) FROM events GROUP BY event_type"),

    iql("iql_integral",
      s"""WITH $EV, l AS (
         |  SELECT event_type, cents, ts_us,
         |    lag(cents) OVER (PARTITION BY event_type ORDER BY ts_us) AS pc,
         |    lag(ts_us) OVER (PARTITION BY event_type ORDER BY ts_us) AS pt
         |  FROM ev)
         |SELECT event_type,
         |  CAST(sum(CAST(cents + pc AS HUGEINT) * (ts_us - pt)) AS DOUBLE) / 200000000.0 AS integral
         |FROM l WHERE pt IS NOT NULL GROUP BY 1""".stripMargin)(
      "SELECT integral(value, 1s) FROM events GROUP BY event_type"),

    // ---- transform OVER aggregate (the Grafana idiom: rate of a bucketed
    //      mean) — aggregate per (bucket, tags), then window over the
    //      bucket series; unit defaults to the GROUP BY interval
    iql("iql_derivative_of_mean",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time, event_type,
         |             CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS v
         |      FROM ev GROUP BY 1, 2),
         |l AS (SELECT time, event_type, v,
         |        lag(v)    OVER w AS pv,
         |        lag(time) OVER w AS pt
         |      FROM b WINDOW w AS (PARTITION BY event_type ORDER BY time))
         |SELECT time, event_type,
         |  (v - pv) / (CAST(time - pt AS DOUBLE) / $DAY_US) AS derivative
         |FROM l WHERE pt IS NOT NULL AND time > pt""".stripMargin)(
      "SELECT derivative(mean(value), 1d) FROM events GROUP BY time(1d), event_type"),

    // cumsum in exact integer CENTS, one divide at the end (r16: the
    // chunked distributed prefix sum is bit-identical only over
    // order-free integer addition, so the oracle states the integer
    // form — also the numerically better semantics, matching iql_cumsum)
    iql("iql_cumsum_of_sum",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time,
         |             CAST(sum(cents) AS BIGINT) AS vc
         |      FROM ev GROUP BY 1)
         |SELECT time,
         |  CAST(sum(vc) OVER (ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |       AS DOUBLE) / 100.0 AS cumulative_sum
         |FROM b""".stripMargin)(
      "SELECT cumulative_sum(sum(value)) FROM events GROUP BY time(1d)"),

    // ---- field-wildcard aggregate: mean(*) expands per declared field,
    //      named <fn>_<field> (InfluxQL). user_id sums stay far below
    //      2^53, so double accumulation is exact on both engines.
    iql("iql_mean_wildcard",
      s"""WITH $EV
         |SELECT ts_us - ts_us % $DAY_US AS time, event_type,
         |  CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS mean_value,
         |  avg(user_id) AS mean_user_id
         |FROM ev GROUP BY 1, 2""".stripMargin)(
      "SELECT mean(*) FROM events GROUP BY time(1d), event_type"),

    // ---- tag-qualified top/bottom: the extreme value PER DISTINCT TAG
    //      first, then top/bottom N of those; tag joins the output
    //      (InfluxQL top(field, tag_key, N) semantics, deterministic
    //      (value, time, tag) total order on both engines)
    iql("iql_top_tag",
      s"""WITH $EV,
         |m AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value DESC, ts_us ASC) AS rn1 FROM ev),
         |t AS (SELECT *, row_number() OVER (ORDER BY value DESC, ts_us ASC, event_type ASC) AS rn2 FROM m WHERE rn1 = 1)
         |SELECT ts_us AS time, value AS top, event_type FROM t WHERE rn2 <= 3""".stripMargin)(
      "SELECT top(value, event_type, 3) FROM events"),

    iql("iql_bottom_tag_bucket",
      s"""WITH $EV,
         |eb AS (SELECT *, ts_us - ts_us % $DAY_US AS bkt FROM ev),
         |m AS (SELECT *, row_number() OVER (PARTITION BY bkt, event_type ORDER BY value ASC, ts_us ASC) AS rn1 FROM eb),
         |t AS (SELECT *, row_number() OVER (PARTITION BY bkt ORDER BY value ASC, ts_us ASC, event_type ASC) AS rn2 FROM m WHERE rn1 = 1)
         |SELECT ts_us AS time, value AS bottom, event_type FROM t WHERE rn2 <= 2""".stripMargin)(
      "SELECT bottom(value, event_type, 2) FROM events GROUP BY time(1d)"),

    // ---- analytics recurrences over the bucketed series (InfluxQL 1.x
    //      technical-analysis surface: EMA family, RSI, CMO, Kaufman — all
    //      rejected by the reference's merge layer, first-class here via
    //      SeriesAnalytics). Oracles step the IDENTICAL double arithmetic
    //      as a recursive CTE / windowed-list left fold, so the compare is
    //      bit-exact. `r` numbers each tag's bucket series; warmup
    //      boundaries are closed-form in rn (see SeriesAnalytics scaladoc).
    iql("iql_ema",
      s"""WITH RECURSIVE $EV, $BKT, $RN,
         |e AS (
         |  SELECT event_type, time, v, rn, v AS acc, CAST(NULL AS DOUBLE) AS ema FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, r.time, r.v, r.rn,
         |         CASE WHEN r.rn < 4 THEN e.acc + r.v ELSE 0.0 END,
         |         CASE WHEN r.rn < 4 THEN NULL
         |              WHEN r.rn = 4 THEN (e.acc + r.v) / 4
         |              ELSE (2.0/5.0) * r.v + (1 - 2.0/5.0) * e.ema END
         |  FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1)
         |SELECT time, event_type, ema AS exponential_moving_average
         |FROM e WHERE ema IS NOT NULL""".stripMargin)(
      "SELECT exponential_moving_average(mean(value), 4) FROM events GROUP BY time(1d), event_type"),

    iql("iql_dema",
      s"""WITH RECURSIVE $EV, $BKT, $RN,
         |e AS (
         |  SELECT event_type, time, v, rn, v AS acc1, CAST(NULL AS DOUBLE) AS ema1,
         |         CAST(0.0 AS DOUBLE) AS acc2, CAST(NULL AS DOUBLE) AS ema2 FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, r.time, r.v, r.rn,
         |         CASE WHEN r.rn < 4 THEN e.acc1 + r.v ELSE 0.0 END,
         |         CASE WHEN r.rn < 4 THEN NULL
         |              WHEN r.rn = 4 THEN (e.acc1 + r.v) / 4
         |              ELSE (2.0/5.0) * r.v + (1 - 2.0/5.0) * e.ema1 END AS ema1n,
         |         CASE WHEN r.rn >= 4 AND r.rn < 7 THEN e.acc2 + ema1n ELSE e.acc2 END,
         |         CASE WHEN r.rn < 7 THEN NULL
         |              WHEN r.rn = 7 THEN (e.acc2 + ema1n) / 4
         |              ELSE (2.0/5.0) * ema1n + (1 - 2.0/5.0) * e.ema2 END
         |  FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1)
         |SELECT time, event_type, 2 * ema1 - ema2 AS double_exponential_moving_average
         |FROM e WHERE ema2 IS NOT NULL""".stripMargin)(
      "SELECT double_exponential_moving_average(mean(value), 4) FROM events GROUP BY time(1d), event_type"),

    iql("iql_tema",
      s"""WITH RECURSIVE $EV, $BKT, $RN,
         |e AS (
         |  SELECT event_type, time, v, rn, v AS acc1, CAST(NULL AS DOUBLE) AS ema1,
         |         CAST(0.0 AS DOUBLE) AS acc2, CAST(NULL AS DOUBLE) AS ema2,
         |         CAST(0.0 AS DOUBLE) AS acc3, CAST(NULL AS DOUBLE) AS ema3 FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, r.time, r.v, r.rn,
         |         CASE WHEN r.rn < 3 THEN e.acc1 + r.v ELSE 0.0 END,
         |         CASE WHEN r.rn < 3 THEN NULL
         |              WHEN r.rn = 3 THEN (e.acc1 + r.v) / 3
         |              ELSE (2.0/4.0) * r.v + (1 - 2.0/4.0) * e.ema1 END AS ema1n,
         |         CASE WHEN r.rn >= 3 AND r.rn < 5 THEN e.acc2 + ema1n ELSE e.acc2 END,
         |         CASE WHEN r.rn < 5 THEN NULL
         |              WHEN r.rn = 5 THEN (e.acc2 + ema1n) / 3
         |              ELSE (2.0/4.0) * ema1n + (1 - 2.0/4.0) * e.ema2 END AS ema2n,
         |         CASE WHEN r.rn >= 5 AND r.rn < 7 THEN e.acc3 + ema2n ELSE e.acc3 END,
         |         CASE WHEN r.rn < 7 THEN NULL
         |              WHEN r.rn = 7 THEN (e.acc3 + ema2n) / 3
         |              ELSE (2.0/4.0) * ema2n + (1 - 2.0/4.0) * e.ema3 END
         |  FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1)
         |SELECT time, event_type, 3 * ema1 - 3 * ema2 + ema3 AS triple_exponential_moving_average
         |FROM e WHERE ema3 IS NOT NULL""".stripMargin)(
      "SELECT triple_exponential_moving_average(mean(value), 3) FROM events GROUP BY time(1d), event_type"),

    iql("iql_trix",
      s"""WITH RECURSIVE $EV, $BKT, $RN,
         |e AS (
         |  SELECT event_type, time, v, rn, v AS acc1, CAST(NULL AS DOUBLE) AS ema1,
         |         CAST(0.0 AS DOUBLE) AS acc2, CAST(NULL AS DOUBLE) AS ema2,
         |         CAST(0.0 AS DOUBLE) AS acc3, CAST(NULL AS DOUBLE) AS ema3,
         |         CAST(NULL AS DOUBLE) AS prev3 FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, r.time, r.v, r.rn,
         |         CASE WHEN r.rn < 3 THEN e.acc1 + r.v ELSE 0.0 END,
         |         CASE WHEN r.rn < 3 THEN NULL
         |              WHEN r.rn = 3 THEN (e.acc1 + r.v) / 3
         |              ELSE (2.0/4.0) * r.v + (1 - 2.0/4.0) * e.ema1 END AS ema1n,
         |         CASE WHEN r.rn >= 3 AND r.rn < 5 THEN e.acc2 + ema1n ELSE e.acc2 END,
         |         CASE WHEN r.rn < 5 THEN NULL
         |              WHEN r.rn = 5 THEN (e.acc2 + ema1n) / 3
         |              ELSE (2.0/4.0) * ema1n + (1 - 2.0/4.0) * e.ema2 END AS ema2n,
         |         CASE WHEN r.rn >= 5 AND r.rn < 7 THEN e.acc3 + ema2n ELSE e.acc3 END,
         |         CASE WHEN r.rn < 7 THEN NULL
         |              WHEN r.rn = 7 THEN (e.acc3 + ema2n) / 3
         |              ELSE (2.0/4.0) * ema2n + (1 - 2.0/4.0) * e.ema3 END AS ema3n,
         |         e.ema3
         |  FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1)
         |SELECT time, event_type, 100.0 * (ema3 - prev3) / prev3 AS triple_exponential_derivative
         |FROM e WHERE ema3 IS NOT NULL AND prev3 IS NOT NULL AND prev3 <> 0""".stripMargin)(
      "SELECT triple_exponential_derivative(mean(value), 3) FROM events GROUP BY time(1d), event_type"),

    iql("iql_rsi",
      s"""WITH RECURSIVE $EV, $BKT, $RN,
         |e AS (
         |  SELECT event_type, time, v, rn, CAST(0.0 AS DOUBLE) AS au, CAST(0.0 AS DOUBLE) AS ad
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.event_type, r.time, r.v, r.rn,
         |         CASE WHEN r.rn - 1 < 4 THEN e.au + greatest(r.v - e.v, 0.0)
         |              WHEN r.rn - 1 = 4 THEN (e.au + greatest(r.v - e.v, 0.0)) / 4
         |              ELSE (e.au * 3 + greatest(r.v - e.v, 0.0)) / 4 END,
         |         CASE WHEN r.rn - 1 < 4 THEN e.ad + greatest(e.v - r.v, 0.0)
         |              WHEN r.rn - 1 = 4 THEN (e.ad + greatest(e.v - r.v, 0.0)) / 4
         |              ELSE (e.ad * 3 + greatest(e.v - r.v, 0.0)) / 4 END
         |  FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1)
         |SELECT time, event_type,
         |       CASE WHEN ad = 0.0 THEN 100.0 ELSE 100.0 - 100.0 / (1.0 + au / ad) END
         |         AS relative_strength_index
         |FROM e WHERE rn - 1 >= 4""".stripMargin)(
      "SELECT relative_strength_index(mean(value), 4) FROM events GROUP BY time(1d), event_type"),

    iql("iql_cmo",
      s"""WITH $EV, $BKT, $RN,
         |d AS (SELECT event_type, time, rn, v - lag(v) OVER w AS dv
         |      FROM r WINDOW w AS (PARTITION BY event_type ORDER BY time)),
         |f AS (SELECT event_type, time, rn,
         |        list_reduce(list_prepend(0.0, list_transform(
         |          list(dv) OVER ($LASTN), x -> greatest(x, 0.0))), (a, b) -> a + b) AS su,
         |        list_reduce(list_prepend(0.0, list_transform(
         |          list(dv) OVER ($LASTN), x -> greatest(-x, 0.0))), (a, b) -> a + b) AS sd
         |      FROM d WHERE dv IS NOT NULL)
         |SELECT time, event_type,
         |       CASE WHEN su + sd = 0.0 THEN 0.0 ELSE 100.0 * (su - sd) / (su + sd) END
         |         AS chande_momentum_oscillator
         |FROM f WHERE rn > 4""".stripMargin)(
      "SELECT chande_momentum_oscillator(mean(value), 4) FROM events GROUP BY time(1d), event_type"),

    iql("iql_kaufman_er",
      s"""WITH $EV, $BKT, $RN,
         |d AS (SELECT event_type, time, rn, v, v - lag(v) OVER w AS dv, lag(v, 4) OVER w AS vn
         |      FROM r WINDOW w AS (PARTITION BY event_type ORDER BY time)),
         |f AS (SELECT event_type, time, rn, v, vn,
         |        list_reduce(list_prepend(0.0, list_transform(
         |          list(dv) OVER ($LASTN), x -> abs(x))), (a, b) -> a + b) AS vol
         |      FROM d WHERE dv IS NOT NULL)
         |SELECT time, event_type,
         |       CASE WHEN vol = 0.0 THEN 0.0 ELSE abs(v - vn) / vol END
         |         AS kaufmans_efficiency_ratio
         |FROM f WHERE rn > 4""".stripMargin)(
      "SELECT kaufmans_efficiency_ratio(mean(value), 4) FROM events GROUP BY time(1d), event_type"),

    iql("iql_kama",
      s"""WITH RECURSIVE $EV, $BKT, $RN,
         |d AS (SELECT event_type, time, rn, v, v - lag(v) OVER w AS dv, lag(v, 4) OVER w AS vn
         |      FROM r WINDOW w AS (PARTITION BY event_type ORDER BY time)),
         |f AS (SELECT event_type, time, rn, v,
         |        CASE WHEN rn <= 4 THEN NULL
         |             WHEN vol = 0.0 THEN 0.0 ELSE abs(v - vn) / vol END AS er
         |      FROM (SELECT *, list_reduce(list_prepend(0.0, list_transform(
         |              list(dv) OVER ($LASTN), x -> abs(x))), (a, b) -> a + b) AS vol
         |            FROM d)),
         |e AS (
         |  SELECT event_type, time, rn, er, v AS kama FROM f WHERE rn = 4
         |  UNION ALL
         |  SELECT f.event_type, f.time, f.rn, f.er,
         |         e.kama + ((f.er * (2.0/3 - 2.0/31) + 2.0/31) * (f.er * (2.0/3 - 2.0/31) + 2.0/31))
         |                * (f.v - e.kama)
         |  FROM f JOIN e ON f.event_type = e.event_type AND f.rn = e.rn + 1)
         |SELECT time, event_type, kama AS kaufmans_adaptive_moving_average
         |FROM e WHERE rn > 4""".stripMargin)(
      "SELECT kaufmans_adaptive_moving_average(mean(value), 4) FROM events GROUP BY time(1d), event_type"),

    // holt_winters: deterministic grid-fit forecast. The whole fit IS
    // SQL-expressible after all (VERDICT r6 item 2): one recursive CTE
    // carries (level, trend, seasonal list, sse, one-step pred) for ALL
    // 1000 grid combos simultaneously, an argmin picks the winner per
    // series (ORDER BY sse, ai, bi, gi = the Scala loop's first-minimum
    // rule), and the winner's own recursion rows are the fitted values.
    // Grid constants are CAST(… AS DOUBLE): DuckDB parses 0.05/0.1 as
    // DECIMAL, whose exact 0.35 differs from Scala's 0.35000000000000003
    // double by 1 ulp — enough to flip seasonal slots. Hash-exact (170/170
    // bit-identical doubles at sf0.01).
    iql("iql_holt_winters", holtWintersOracle(withFit = false))(
      "SELECT holt_winters(mean(value), 5, 7) FROM events GROUP BY time(1d), event_type"),
    iql("iql_holt_winters_with_fit", holtWintersOracle(withFit = true))(
      "SELECT holt_winters_with_fit(mean(value), 5, 7) FROM events GROUP BY time(1d), event_type"),

    // ---- fill() family over time buckets (SURVEY §2.4 grouping surface)
    iql("iql_fill_zero",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time, event_type,
         |             CAST(sum(cents) AS DOUBLE) / 100.0 AS sum
         |      FROM ev GROUP BY 1, 2),
         |span AS (SELECT min(time) AS lo, max(time) AS hi FROM b),
         |spine AS (SELECT unnest(generate_series(lo, hi, $DAY_US)) AS time FROM span),
         |types AS (SELECT DISTINCT event_type FROM ev)
         |SELECT s.time, t.event_type, coalesce(b.sum, 0.0) AS sum
         |FROM spine s CROSS JOIN types t
         |LEFT JOIN b ON b.time = s.time AND b.event_type = t.event_type""".stripMargin)(
      "SELECT sum(value) FROM events GROUP BY time(1d), event_type fill(0)"),

    iql("iql_fill_previous",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time, event_type,
         |             CAST(sum(cents) AS DOUBLE) / 100.0 AS sum
         |      FROM ev WHERE event_type IN ('click', 'error') GROUP BY 1, 2),
         |span AS (SELECT min(time) AS lo, max(time) AS hi FROM b),
         |spine AS (SELECT unnest(generate_series(lo, hi, $DAY_US)) AS time FROM span),
         |types AS (SELECT DISTINCT event_type FROM b),
         |g AS (SELECT s.time, t.event_type, b.sum
         |      FROM spine s CROSS JOIN types t
         |      LEFT JOIN b ON b.time = s.time AND b.event_type = t.event_type)
         |SELECT time, event_type,
         |  last_value(sum IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY time
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum
         |FROM g""".stripMargin)(
      "SELECT sum(value) FROM events WHERE event_type = 'click' OR event_type = 'error' GROUP BY time(1d), event_type fill(previous)"),

    iql("iql_fill_linear",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time, event_type,
         |             CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS mean
         |      FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2),
         |span AS (SELECT min(time) AS lo, max(time) AS hi FROM b),
         |spine AS (SELECT unnest(generate_series(lo, hi, $DAY_US)) AS time FROM span),
         |types AS (SELECT DISTINCT event_type FROM b),
         |g AS (SELECT s.time, t.event_type, b.mean
         |      FROM spine s CROSS JOIN types t
         |      LEFT JOIN b ON b.time = s.time AND b.event_type = t.event_type),
         |w AS (SELECT time, event_type, mean,
         |        last_value(mean IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY time
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |        last_value(CASE WHEN mean IS NOT NULL THEN time END IGNORE NULLS)
         |          OVER (PARTITION BY event_type ORDER BY time
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         |        first_value(mean IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY time
         |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         |        first_value(CASE WHEN mean IS NOT NULL THEN time END IGNORE NULLS)
         |          OVER (PARTITION BY event_type ORDER BY time
         |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
         |      FROM g)
         |SELECT time, event_type,
         |  CASE WHEN mean IS NOT NULL THEN mean
         |       ELSE pv + (nv - pv) * (time - pt) / (nt - pt) END AS mean
         |FROM w""".stripMargin)(
      "SELECT mean(value) FROM events WHERE event_type = 'purchase' GROUP BY time(1d), event_type fill(linear)"),

    // ---- fill() spine from the WHERE time range: an explicit queried
    //      range fills end-to-end (here through 2024-02-09, past the last
    //      data point on 2024-01-30), not just the observed data span
    iql("iql_fill_zero_range",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time,
         |             CAST(sum(cents) AS DOUBLE) / 100.0 AS sum
         |      FROM ev
         |      WHERE ts_us >= epoch_us(TIMESTAMP '2024-01-10')
         |        AND ts_us < epoch_us(TIMESTAMP '2024-02-10')
         |      GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(
         |            epoch_us(TIMESTAMP '2024-01-10'),
         |            epoch_us(TIMESTAMP '2024-02-09'), $DAY_US)) AS time)
         |SELECT s.time, coalesce(b.sum, 0.0) AS sum
         |FROM spine s LEFT JOIN b ON b.time = s.time""".stripMargin)(
      "SELECT sum(value) FROM events WHERE time >= '2024-01-10' AND time < '2024-02-10' GROUP BY time(1d) fill(0)"),

    // lower bound only: the upper spine edge still comes from the data
    iql("iql_fill_zero_lo",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time,
         |             CAST(sum(cents) AS DOUBLE) / 100.0 AS sum
         |      FROM ev
         |      WHERE ts_us >= epoch_us(TIMESTAMP '2024-01-25') AND event_type = 'purchase'
         |      GROUP BY 1),
         |span AS (SELECT max(time) AS hi FROM b),
         |spine AS (SELECT unnest(generate_series(
         |            epoch_us(TIMESTAMP '2024-01-25'), hi, $DAY_US)) AS time FROM span)
         |SELECT s.time, coalesce(b.sum, 0.0) AS sum
         |FROM spine s LEFT JOIN b ON b.time = s.time""".stripMargin)(
      "SELECT sum(value) FROM events WHERE time >= '2024-01-25' AND event_type = 'purchase' GROUP BY time(1d) fill(0)"),

    // ---- regex tag predicates (=~ /re/, !~ /re/) — passthrough-supported
    //      by the reference's nodes, unsupported in its merge layer
    //      (query_merge.go:128 TODO); first-class here. Java and RE2 agree
    //      on this anchored-alternation subset.
    iql("iql_regex_tag",
      """SELECT event_type, count(value) AS count FROM events
        |WHERE regexp_matches(event_type, '^(click|view)$') GROUP BY 1""".stripMargin)(
      "SELECT count(value) FROM events WHERE event_type =~ /^(click|view)$/ GROUP BY event_type"),

    // ---- regex FIELD selection (SELECT /re/) and regex MEASUREMENT in
    //      FROM — the reference's declared TODO (query_merge.go:128),
    //      parser sugar here (SURVEY §2.2)
    iql("iql_regex_field",
      s"""WITH $EV
         |SELECT ts_us AS time, value FROM ev
         |WHERE ts_us >= epoch_us(TIMESTAMP '2024-01-05') AND ts_us < epoch_us(TIMESTAMP '2024-01-06')
         |  AND event_type = 'click'
         |ORDER BY 1, 2 LIMIT 40""".stripMargin)(
      "SELECT /^val/ FROM events WHERE time >= '2024-01-05' AND time < '2024-01-06' AND event_type = 'click' ORDER BY time ASC LIMIT 40"),

    iql("iql_regex_measurement",
      """SELECT event_type, count(value) AS count FROM events GROUP BY 1""")(
      "SELECT count(value) FROM /^ev/ GROUP BY event_type"),

    // ---- FROM m1, m2: union scan over the named measurements (the
    //      reference's merge layer reads only the FIRST, query_merge.go:44-47)
    iql("iql_from_multi",
      """SELECT event_type, count(value) AS count
        |FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
        |GROUP BY 1""".stripMargin)(
      "SELECT count(value) FROM events, events GROUP BY event_type"),

    // ---- heterogeneous FROM m1, m2: measurements with DIFFERING field sets
    //      union with null-padding (InfluxQL nulls missing fields; the
    //      reference's merge layer can't express this at all). Two derived
    //      measurements over the events parquet — one carries only `value`,
    //      the other only `user_id` — so the union exercises the
    //      allowMissingColumns path end-to-end.
    Q("iql_from_multi_hetero",
      """WITH u AS (
        |  SELECT event_type, value, CAST(NULL AS BIGINT) AS user_id FROM events
        |  UNION ALL
        |  SELECT event_type, CAST(NULL AS DOUBLE) AS value, user_id FROM events)
        |SELECT event_type, count(value) AS count, max(user_id) AS max
        |FROM u GROUP BY 1""".stripMargin) { (s, d) =>
      import graft.ql.{FieldMeta, Parser, SelectStmt, TableMeta}
      val sel = Parser.parse(
        "SELECT count(value), max(user_id) FROM ev_val, ev_uid GROUP BY event_type")
        .asInstanceOf[SelectStmt]
      val base = graft.Tables(s, d, "events")
      val load: String => (org.apache.spark.sql.DataFrame, TableMeta) = {
        case "ev_val" => (base.select("ts_us", "ts_ns", "event_type", "value"),
          TableMeta("ev_val", "ts_us", Seq("event_type"),
            Seq(FieldMeta("value", Some(100L))), Some("ts_ns")))
        case "ev_uid" => (base.select("ts_us", "ts_ns", "event_type", "user_id"),
          TableMeta("ev_uid", "ts_us", Seq("event_type"),
            Seq(FieldMeta("user_id", None)), Some("ts_ns")))
        case m => throw graft.ql.ParseException(s"unknown measurement '$m'")
      }
      val (df, meta) = Translator.resolve(sel.from, load)
      new Translator(df, meta).run(sel)
    },

    iql("iql_regex_neg",
      """SELECT event_type, count(value) AS count FROM events
        |WHERE NOT regexp_matches(event_type, '^p') GROUP BY 1""".stripMargin)(
      "SELECT count(value) FROM events WHERE event_type !~ /^p/ GROUP BY event_type"),

    // ---- subquery: nested SELECT as FROM source — the reference's
    //      declared-unimplemented path (README.md:188-191), first-class here
    iql("iql_subquery",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time, event_type, count(value) AS cnt
         |      FROM ev GROUP BY 1, 2)
         |SELECT event_type, CAST(sum(cnt) AS DOUBLE) / count(*) AS mean
         |FROM b GROUP BY 1""".stripMargin)(
      "SELECT mean(cnt) FROM (SELECT count(value) AS cnt FROM events GROUP BY time(1d), event_type) GROUP BY event_type"),

    // ---- HAVING-equivalent: outer WHERE over a subquery's aggregate
    //      output (InfluxQL has no HAVING; this is its idiom)
    iql("iql_subquery_having",
      s"""WITH $EV,
         |b AS (SELECT ts_us - ts_us % $DAY_US AS time, event_type, count(value) AS cnt
         |      FROM ev GROUP BY 1, 2)
         |SELECT time, event_type, cnt FROM b WHERE cnt > 70""".stripMargin)(
      "SELECT cnt FROM (SELECT count(value) AS cnt FROM events GROUP BY time(1d), event_type) WHERE cnt > 70 GROUP BY event_type"),

    // ---- time(interval, offset): shifted bucket boundaries
    iql("iql_bucket_offset",
      s"""WITH $EV
         |SELECT ts_us - ((ts_us - 21600000000) % $DAY_US) AS time,
         |       count(value) AS count
         |FROM ev GROUP BY 1""".stripMargin)(
      "SELECT count(value) FROM events GROUP BY time(1d, 6h)"),

    // ---- SLIMIT/SOFFSET series windowing (query_merge.go:93-98)
    iql("iql_slimit",
      s"""WITH $EV,
         |m AS (SELECT event_type, CAST(sum(cents) AS DOUBLE) / (100.0 * count(value)) AS mean
         |      FROM ev GROUP BY 1),
         |r AS (SELECT *, dense_rank() OVER (ORDER BY event_type) AS sr FROM m)
         |SELECT event_type, mean FROM r WHERE sr > 1 AND sr <= 3""".stripMargin)(
      "SELECT mean(value) FROM events GROUP BY event_type SLIMIT 2 SOFFSET 1"),

    // ---- SHOW metadata surface (routing.go:43-58)
    iql("iql_show_measurements", "SELECT 'events' AS name")("SHOW MEASUREMENTS"),
    iql("iql_show_tag_keys",
      "SELECT 'events' AS measurement, 'event_type' AS tagKey")("SHOW TAG KEYS"),
    iql("iql_show_field_keys",
      """SELECT * FROM (VALUES ('events', 'value', 'float'), ('events', 'user_id', 'integer'))
        |AS t(measurement, fieldKey, fieldType)""".stripMargin)("SHOW FIELD KEYS"),
    iql("iql_show_series",
      "SELECT DISTINCT 'events,event_type=' || event_type AS key FROM events")("SHOW SERIES"),
    iql("iql_show_tag_values",
      "SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events")("SHOW TAG VALUES"),
    iql("iql_show_tag_keys_from",
      "SELECT 'events' AS measurement, 'event_type' AS tagKey")("SHOW TAG KEYS FROM events"),
    iql("iql_show_tag_values_with_key",
      "SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events")(
      "SHOW TAG VALUES WITH KEY = event_type"),
    // SHOW … LIMIT/OFFSET pages the sorted meta result (the reference
    // pages SHOW SERIES the same way during imports, series.go:69-70)
    iql("iql_show_tag_values_limit",
      """SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events
        |ORDER BY key, value LIMIT 2 OFFSET 1""".stripMargin)(
      "SHOW TAG VALUES WITH KEY = event_type LIMIT 2 OFFSET 1"),
    // SHOW MEASUREMENTS WITH MEASUREMENT =~ /re/ (Grafana's dashboard form)
    iql("iql_show_measurements_with",
      "SELECT 'events' AS name")(
      "SHOW MEASUREMENTS WITH MEASUREMENT =~ /ev/"),
    // SHOW … WHERE <tag predicate> — the Grafana meta-filter form
    iql("iql_show_series_where",
      """SELECT DISTINCT 'events,event_type=' || event_type AS key FROM events
        |WHERE regexp_matches(event_type, 'c')""".stripMargin)(
      "SHOW SERIES WHERE event_type =~ /c/"),
    iql("iql_show_tag_values_where",
      """SELECT DISTINCT 'event_type' AS key, event_type AS value FROM events
        |WHERE event_type != 'click'""".stripMargin)(
      "SHOW TAG VALUES WITH KEY = event_type WHERE event_type != 'click'"),
    iql("iql_show_series_cardinality",
      "SELECT CAST(count(*) AS BIGINT) AS count FROM (SELECT DISTINCT event_type FROM events)")(
      "SHOW SERIES CARDINALITY"),
    iql("iql_show_tag_values_cardinality",
      "SELECT 'events' AS measurement, CAST(count(DISTINCT event_type) AS BIGINT) AS count FROM events")(
      "SHOW TAG VALUES EXACT CARDINALITY WITH KEY = event_type"),
    iql("iql_show_measurement_cardinality",
      "SELECT CAST(1 AS BIGINT) AS count")("SHOW MEASUREMENT CARDINALITY"),

    // ungrouped sample(): the TakeOrdered branch of sampleSelect
    // (per-partition top-N + driver merge of N-row heads — no global
    // window task), same Lehmer draw, same oracle discipline
    iql("iql_sample_global",
      s"""WITH $EV, h AS (
         |  SELECT ts_us, value,
         |    ts_us % 2147483647 * 48271 % 2147483647 AS hk
         |  FROM ev)
         |SELECT ts_us AS time, value AS sample FROM h
         |ORDER BY hk ASC, ts_us ASC, value ASC LIMIT 5""".stripMargin)(
      "SELECT sample(value, 5) FROM events"),

    // sample(): non-deterministic by spec → r12 pins the Lehmer integer
    // draw (Translator.sampleKey) so the gate is oracle-checkable
    iql("iql_sample",
      s"""WITH $EV, h AS (
         |  SELECT ts_us, event_type, value,
         |    ts_us % 2147483647 * 48271 % 2147483647 AS hk
         |  FROM ev)
         |SELECT ts_us AS time, event_type, value AS sample FROM (
         |  SELECT ts_us, event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY hk ASC, ts_us ASC, value ASC) AS rn
         |  FROM h) WHERE rn <= 5""".stripMargin)(
      "SELECT sample(value, 5) FROM events GROUP BY event_type")
  )
}
