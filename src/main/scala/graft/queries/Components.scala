package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components by alternating large-star / small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", ACM SoCC 2014 — public algorithm).
  *
  * Why it exists alongside the min-label propagation in `d_dup_clusters`:
  * propagation needs O(diameter) rounds and pushes every label across the
  * whole frontier each round — fine for near-dup clusters (tiny diameters)
  * at moderate scale, but at extreme edge counts a long-chain or
  * high-degree component dominates rounds. Star contraction converges in
  * O(log n) rounds on ANY topology and each round only attaches nodes to
  * their neighborhood minimum — per-round work stays proportional to the
  * current edge set, which SHRINKS as components contract (VERDICT r8
  * scale caveat on the CC fixpoint).
  *
  * Implementation notes for the 100 TB bar: both star steps compute the
  * per-node neighborhood minimum with a WINDOW min over the grouping key,
  * never `collect_list` — the component-minimum node of a huge component
  * sees the whole component as neighbors, and an array materialization
  * there is an OOM; the window spills. Two shuffles per star step, lineage
  * cut per round with localCheckpoint (same discipline as the propagation
  * loop it complements).
  */
object Components {

  /** Connected components of the undirected graph `edges` (two LONG
    * columns: `a`, `b`). Returns `(id, comp)` where `comp` is the minimum
    * id of the component, for every id that APPEARS IN AN EDGE — callers
    * union isolated vertices back in (their component is themselves).
    * Deterministic: the result is the unique min-id labeling, identical to
    * what min-label propagation converges to. */
  def starContract(edges: DataFrame): DataFrame = {
    // canonical undirected edge set (lo, hi), self-loops dropped
    var e = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(true)

    // fixpoint signature: contraction only ever lowers parents, so
    // (edge count, Σa, Σb) is stationary exactly at the star fixpoint
    def sig(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("a"), lit(0L)),
        coalesce(sum("b"), lit(0L))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    var prev = (-1L, -1L, -1L)
    var cur = sig(e)
    var rounds = 0
    while (cur != prev) {
      rounds += 1
      require(rounds <= 100, // O(log n) expected: 100 rounds ⇒ something is wrong
        "Components.starContract did not converge in 100 rounds")
      val w = Window.partitionBy("u")
      // LARGE-STAR over the symmetric adjacency: every strictly-larger
      // neighbor of u attaches to m = min(N(u) ∪ {u})
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val ls = sym.withColumn("m", least(min("v").over(w), col("u")))
        .where(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b")) // m ≤ u < v: canonical
        .distinct()
      // SMALL-STAR on the oriented (hi → lo) edges: hi and all its smaller
      // neighbors attach to the group minimum
      val sm = ls.select(col("b").as("u"), col("a").as("v"))
        .withColumn("m", min("v").over(w))
      val ss = sm.where(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .union(sm.select(col("m").as("a"), col("u").as("b")).distinct()) // m < u
        .distinct()
        .localCheckpoint(true) // cut lineage: O(1) plan depth per round
      e = ss
      prev = cur
      cur = sig(e)
    }
    // observability for the scale gates: O(log n) is the design claim —
    // the round count at 10×/100× corpora is how it gets CHECKED
    System.err.println(s"[components] starContract rounds=$rounds")
    // star fixpoint: every edge is (component-min, member)
    e.select(col("b").as("id"), col("a").as("comp"))
      .union(e.select(col("a").as("id"), col("a").as("comp")).distinct())
      .distinct()
  }
}
