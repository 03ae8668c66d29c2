package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: SeriesChunks folds equal the sequential window EXACTLY on
  * arbitrary series — including duplicate timestamps (ties must never
  * straddle a chunk boundary: chunk ids derive from time alone, order
  * adds the tiebreak), empty/thin chunks (the k-tail cascade), null
  * values (window-sum semantics), and any chunk count. The fixed spec
  * pins the real gates; this walks the shapes between them. */
class SeriesChunksPropSpec extends SparkSpec {

  private def check(name: String, prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val rowsGen = for {
    n <- Gen.choose(6, 120)
    tsSpan <- Gen.oneOf(5L, 37L, 1000L) // small span → many duplicate ts
    parts <- Gen.choose(1, 3)
    vals <- Gen.listOfN(n, Gen.frequency(
      9 -> Gen.choose(-500L, 500L).map(Option(_)), 1 -> Gen.const(Option.empty[Long])))
    tss <- Gen.listOfN(n, Gen.choose(0L, tsSpan))
  } yield (vals.zip(tss).zipWithIndex.map { case ((v, ts), i) =>
    (i.toLong, s"p${i % parts}", ts, v.map(java.lang.Long.valueOf).orNull)
  }, parts)

  test("chunked fold and prefix sum equal the sequential window on arbitrary series") {
    val s = spark
    import s.implicits._
    spark.conf.set("graft.seriesFold.minBytes", "0")
    try {
      check("series-chunks-exact", Prop.forAll(rowsGen, Gen.oneOf(2, 3, 8)) {
        case ((rows, _), chunks) =>
          spark.conf.set("graft.seriesFold.chunks", chunks.toString)
          val df = rows.toDF("id", "p", "ts", "v")
          val order = Seq(col("ts"), col("id"))
          val keep = Seq(col("id"), col("p"))
          def mk(w: WindowSpec) = {
            val f = w.rowsBetween(-2, 0)
            Seq((lag("v", 1).over(w), "lag1"),
              (sum("v").over(f), "mv3"))
          }
          val chunked = SeriesChunks.fold(df, Seq("p"), "ts", order, 2, keep)(mk)
            .map(_.collect().map(_.toSeq.mkString("|")).sorted.toSeq)
          val sw = Window.partitionBy("p").orderBy(order: _*)
          val seq1 = df.select(keep ++ mk(sw).map { case (c, n) => c.as(n) }: _*)
            .collect().map(_.toSeq.mkString("|")).sorted.toSeq
          val foldOk = chunked.forall(_ == seq1)

          val chunkedPs = SeriesChunks.prefixSum(df, Seq("p"), "ts", order,
            col("v"), keep, "cs") { (ps, pc) => when(pc > 0, ps) }
            .map(_.collect().map(_.toSeq.mkString("|")).sorted.toSeq)
          val seqPs = df.select(keep :+
            sum("v").over(sw.rowsBetween(Window.unboundedPreceding, 0)).as("cs"): _*)
            .collect().map(_.toSeq.mkString("|")).sorted.toSeq
          val psOk = chunkedPs.forall(_ == seqPs)
          // degenerate time ranges legitimately return None (fallback);
          // when the chunked path engages it must be exact
          foldOk && psOk
      })
    } finally {
      spark.conf.unset("graft.seriesFold.minBytes")
      spark.conf.unset("graft.seriesFold.chunks")
    }
  }
}
