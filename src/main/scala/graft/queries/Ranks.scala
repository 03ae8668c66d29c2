package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed total-order ranking. `row_number().over(Window.orderBy(k))`
  * is a single-task global sort — fine for a handful of rows, a scale
  * ceiling for a corpus. `globalRank` produces the IDENTICAL 0-based rank
  * for a unique key at any scale: range-repartition on the key (the
  * sampled split points decide only where partitions cut, never the
  * result), sort within partitions, then `zipWithIndex` — which computes
  * the per-partition offsets and the ranks from ONE materialization of
  * the sorted data (the offset-count job pins the range-partition shuffle
  * output; the rank job reuses it), so no two-evaluation divergence under
  * speculative execution or nondeterministic upstream ordering is
  * possible. */
object Ranks {

  /** 0-based rank of each row in ascending `keys` order. The key tuple
    * must be unique per row (callers rank distinct sets or unique ids).
    *
    * Size-gated: below `graft.globalRank.minBytes` (Catalyst estimate,
    * errs large) the single-task `row_number` window is used directly —
    * for a small key set it beats the distributed path's extra shuffle +
    * offset job (measured ~0.14 s fixed overhead at sf0.1). */
  def globalRank(df: DataFrame, keys: Seq[Column], out: String = "rank"): DataFrame = {
    val sess = df.sparkSession
    val minBytes = sess.conf
      .get("graft.globalRank.minBytes", (16L * 1024 * 1024).toString).toLong
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes < minBytes)
      return df.withColumn(out,
        row_number().over(Window.orderBy(keys: _*)).cast("long") - 1L)
    val p = sess.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(p, keys: _*).sortWithinPartitions(keys: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sess.createDataFrame(ranked, schema)
  }
}
