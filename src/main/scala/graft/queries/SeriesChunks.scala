package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Chunk-parallel series folds — the shared form of the Translator's
  * `chunkedFold`/`chunkedCumSum` (ql/Translator.scala:1001,1086) for
  * gates that order by a composite (time, tiebreak) key.
  *
  * The problem both solve: a per-series window parallelizes only as far
  * as the SERIES COUNT — `PARTITION BY event_type` over 5 types is 5
  * tasks at any cluster width, and no partition at all is ONE task (the
  * ×100-events decade measured the lag gates at ~50× for 100× data on
  * exactly this). For bounded-lookback folds (lag-k family, n-row moving
  * frames) a row depends on at most k predecessors, so each series cuts
  * into P time-range chunks folded in parallel, with only the first-k
  * rows of each chunk repaired against the per-chunk k-tails in a
  * miniature second window. Bit-exact vs the sequential window: the
  * composite (time, tiebreak) order is total, chunk ids derive from time
  * alone (ties never straddle a boundary), and no arithmetic is
  * re-associated. Integer prefix sums (unbounded lookback) ARE
  * associative, so they chunk via per-chunk totals + broadcast
  * exclusive-prefix offsets instead.
  */
object SeriesChunks {

  /** Size-gated chunk count (VERDICT r18 #6). An explicitly-set
    * `graft.seriesFold.chunks` pins the count exactly (ChunkedFoldSpec's
    * bit-exactness sweeps; results are chunking-invariant by
    * construction, so this is a performance knob only). Otherwise the
    * count starts at the session shuffle width — the historical
    * behavior, so small inputs keep their measured plans — and WIDENS
    * with the estimated input bytes: the r18 A/B arms showed the
    * spill-bound sort family improving 0.60–0.85× under wider shuffles
    * at sf10 while a blanket session-wide unpin regressed everything
    * else; widening only here, only when `bytes/targetChunkBytes`
    * exceeds the base width, takes the win without the tax. Capped at
    * `graft.seriesFold.maxChunks` (offset sets stay broadcastable —
    * chunkedCumSum's series×chunks guard also scales with this). */
  private[graft] def chunkCount(sess: org.apache.spark.sql.SparkSession,
      bytes: BigInt): Int =
    sess.conf.getOption("graft.seriesFold.chunks") match {
      case Some(c) => c.toInt
      case None =>
        val base = sess.conf.get("spark.sql.shuffle.partitions", "32").toInt
        val target = sess.conf.get("graft.seriesFold.targetChunkBytes",
          (64L * 1024 * 1024).toString).toLong
        val maxC = sess.conf.get("graft.seriesFold.maxChunks", "1024").toInt
        val bySize = ((bytes + (target - 1)) / target).min(BigInt(maxC)).toInt
        math.max(base, bySize)
    }

  private def sized(input: DataFrame): Option[(Int, Long)] = {
    val sess = input.sparkSession
    val minBytes = sess.conf
      .get("graft.seriesFold.minBytes", (64L * 1024 * 1024).toString).toLong
    val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val chunks = chunkCount(sess, bytes)
    if (chunks <= 1 || bytes < minBytes) None
    else Some((chunks, minBytes))
  }

  private def withChunk(input: DataFrame, timeCol: String,
      chunks: Int): Option[DataFrame] = {
    val tc = col(timeCol)
    val b = input.agg(min(tc), max(tc)).head()
    if (b.isNullAt(0) || b.getLong(1) <= b.getLong(0)) return None
    val minT = b.getLong(0)
    val span = math.max(1L, (b.getLong(1) - minT) / chunks + 1L)
    // SQL `div`, not Column `/` (always double) — chunk ids must be exact
    Some(input.withColumn("__chunk",
      expr(s"(`$timeCol` - ${minT}L) div ${span}L")))
  }

  /** Bounded-lookback fold: `mk` builds the output columns for a given
    * WindowSpec; `keep` are passthrough columns; `k` is the lookback.
    * Returns None below the size gate or on a degenerate time range —
    * callers fall back to the sequential per-series window. */
  def fold(input: DataFrame, partNames: Seq[String], timeCol: String,
      order: Seq[Column], k: Int, keep: Seq[Column])(
      mk: WindowSpec => Seq[(Column, String)]): Option[DataFrame] = {
    val parts = partNames.map(col)
    val (chunks, _) = sized(input).getOrElse(return None)
    val d0 = withChunk(input, timeCol, chunks).getOrElse(return None)
    val d = d0.repartition(chunks, parts :+ col("__chunk"): _*)
    val cparts = parts :+ col("__chunk")
    val w = Window.partitionBy(cparts: _*).orderBy(order: _*)
    val marked = d
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(cparts: _*)))
    val outs = mk(w)
    val folded = marked.select(keep ++ Seq(col("__rn")) ++
      outs.map { case (c, n) => c.as(n) }: _*)
    val inner = folded.where(col("__rn") > k).drop("__rn")
    // boundary repair on the miniature first-k ∪ last-k set; the untagged
    // window key must be column-DERIVED (a literal constant-folds out of
    // the partition spec and the window degrades to unpartitioned)
    val smallParts =
      if (parts.nonEmpty) parts else Seq(pmod(col("__chunk"), lit(1L)))
    val sw = Window.partitionBy(smallParts: _*).orderBy(order: _*)
    val outsSmall = mk(sw)
    val boundary = marked
      .where(col("__rn") <= k || col("__rn") > col("__cnt") - k)
      .select(keep ++ Seq(col("__rn")) ++
        outsSmall.map { case (c, n) => c.as(n) }: _*)
      .where(col("__rn") <= k).drop("__rn")
    Some(inner.unionByName(boundary))
  }

  /** Chunk-parallel BIGINT running sum of `valueCol` in (parts, order)
    * series order: in-chunk prefix + broadcast per-chunk exclusive
    * offsets — associative integer addition, bit-equal to the sequential
    * fold. `finish(prefixSum, prefixCount)` builds the output column
    * (prefixSum is null-coalesced to 0; prefixCount counts non-null
    * values so callers can reproduce window-sum null semantics). */
  def prefixSum(input: DataFrame, partNames: Seq[String], timeCol: String,
      order: Seq[Column], valueCol: Column, keep: Seq[Column],
      outName: String)(finish: (Column, Column) => Column): Option[DataFrame] = {
    val parts = partNames.map(col)
    val (chunks, _) = sized(input).getOrElse(return None)
    val d0 = withChunk(input, timeCol, chunks).getOrElse(return None)
    val d = d0.withColumn("__fx", valueCol)
      .repartition(chunks, parts :+ col("__chunk"): _*)
    val cparts = parts :+ col("__chunk")
    val w = Window.partitionBy(cparts: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = d
      .withColumn("__ps", sum(col("__fx")).over(w))
      .withColumn("__pc", count(col("__fx")).over(w))
    val offParts =
      if (parts.nonEmpty) parts else Seq(pmod(col("__chunk"), lit(1L)))
    val offW = Window.partitionBy(offParts: _*).orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = d.groupBy(cparts: _*)
      .agg(sum(col("__fx")).as("__tot"), count(col("__fx")).as("__tc"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(offW), lit(0L)))
      .withColumn("__offc", coalesce(sum(col("__tc")).over(offW), lit(0L)))
      .select(cparts :+ col("__off") :+ col("__offc"): _*)
    val joined = local.join(broadcast(offs), partNames :+ "__chunk")
    Some(joined.select(keep :+
      finish(coalesce(col("__ps"), lit(0L)) + col("__off"),
        col("__pc") + col("__offc")).as(outName): _*))
  }
}
