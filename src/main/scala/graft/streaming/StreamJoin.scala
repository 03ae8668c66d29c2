package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time join — the attribution shape (every click
  * joined to the purchases the same user makes within the following
  * window). The reference has no streaming joins at all; this is the
  * Structured Streaming capability that makes the CQ subsystem composable
  * with event correlation (SURVEY §2.11 breadth).
  *
  * Mechanics: BOTH sides carry watermarks, and the join condition bounds
  * purchase time to [click_ts, click_ts + window] — exactly what Spark
  * needs to compute each side's state retention: a click can be dropped
  * once the purchase watermark passes click_ts + window; a purchase once
  * the click watermark passes its ts. State is bounded by (event rate ×
  * window), never by stream length — the property that lets this run
  * forever at any volume.
  */
object StreamJoin {

  /** clicks(ts, user_id, click_id) ⋈ purchases(ts, user_id, amount) within
    * `window` after the click. Inner append-mode join; late rows beyond
    * either watermark are dropped by the engine. */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes", watermark: String = "1 hour"): DataFrame = {
    val c = clicks
      .withWatermark("ts", watermark)
      .select(col("ts").as("click_ts"), col("user_id"), col("click_id"))
    val p = purchases
      .withWatermark("ts", watermark)
      .select(col("ts").as("buy_ts"), col("user_id").as("buyer"), col("amount"))
    c.join(p,
      col("user_id") === col("buyer") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr(s"interval $window"))
      .select(col("user_id"), col("click_id"), col("click_ts"), col("buy_ts"), col("amount"))
  }
}
