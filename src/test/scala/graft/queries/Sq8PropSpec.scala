package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Properties of the SQ8 encode: codes stay in [0, 255], the dequantized
  * reconstruction is within half a quantization step per dimension
  * ((mx−mn)/255/2, plus one ULP of slack for the arithmetic), range
  * endpoints reconstruct exactly at step boundaries, and constant vectors
  * (mx == mn) reconstruct to exactly mn. The fixed Sq8Spec pins the real
  * gates; this walks arbitrary vectors between them. */
class Sq8PropSpec extends SparkSpec {

  private def check(name: String, prop: Prop, n: Int = 25): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val vecGen: Gen[List[Double]] = for {
    n <- Gen.choose(2, 64)
    constant <- Gen.frequency(6 -> false, 1 -> true)
    base <- Gen.choose(-100.0, 100.0)
    vs <- if (constant) Gen.const(List.fill(n)(base))
          else Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield vs

  test("codes bounded; reconstruction within half a step; constant vectors exact") {
    val s = spark
    import s.implicits._
    check("sq8-encode", Prop.forAll(Gen.nonEmptyListOf(vecGen)) { vecs =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "emb")
      // the production encode expression, via the same select the gates use
      val enc = df.select(col("vec_id"),
          array_min(col("emb")).as("mn"), array_max(col("emb")).as("mx"),
          col("emb"))
        .select(col("vec_id"), col("mn"), col("mx"), col("emb"),
          expr("""transform(emb, x -> CAST(round(CASE WHEN mx > mn
                  THEN (x - mn) / (mx - mn) * 255.0 ELSE 0.0 END) AS INT))""")
            .as("q"))
        .select(col("vec_id"), col("mn"), col("mx"), col("emb"),
          col("q"),
          expr("transform(q, c -> mn + CAST(c AS DOUBLE) * (mx - mn) / 255.0)")
            .as("dq"))
        .collect()
      enc.forall { r =>
        val mn = r.getDouble(1); val mx = r.getDouble(2)
        val emb = r.getSeq[Double](3); val q = r.getSeq[Int](4)
        val dq = r.getSeq[Double](5)
        val halfStep =
          if (mx > mn) (mx - mn) / 255.0 / 2.0 * (1.0 + 1e-12) + 1e-12 else 0.0
        q.forall(c => c >= 0 && c <= 255) &&
          emb.zip(dq).forall { case (x, y) =>
            if (mx > mn) math.abs(x - y) <= halfStep else y == mn
          }
      }
    })
  }
}
