package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import LineProtocol._
import SchemaInfer._

/** Dynamic schema inference + widening vectors (SURVEY §1.2). */
class SchemaInferSpec extends AnyFunSuite {

  private def pts(lines: String*): Seq[Point] =
    lines.map(l => parseLine(l).toOption.get)

  test("single-batch inference: tags sorted, field types per value") {
    val inf = infer("m", pts(
      "m,b=1,a=2 x=1i,y=2.5,z=\"s\",w=true 1"))
    assert(inf.tags == Seq("a", "b"))
    assert(inf.fields == Seq("w" -> TBool, "x" -> TInt, "y" -> TFloat, "z" -> TString))
  }

  test("conflict widening: int+float → float; numeric+string → string; bool+int → string") {
    val inf = infer("m", pts(
      "m x=1i,y=2i,z=true 1",
      "m x=1.5,y=\"oops\",z=3i 2"))
    assert(inf.fields.toMap == Map("x" -> TFloat, "y" -> TString, "z" -> TString))
  }

  test("new tags and fields accumulate across points; other measurements ignored") {
    val inf = infer("m", pts(
      "m,a=1 x=1i 1",
      "m,b=2 y=2i 2",
      "other,c=3 q=1i 3"))
    assert(inf.tags == Seq("a", "b"))
    assert(inf.fields.map(_._1) == Seq("x", "y"))
  }

  test("merge is the widening combiner (treeAggregate / mergeSchema shape)") {
    val a = infer("m", pts("m,a=1 x=1i 1"))
    val b = infer("m", pts("m,b=2 x=2.5,y=true 2"))
    val m = merge(a, b)
    assert(m.tags == Seq("a", "b"))
    assert(m.fields.toMap == Map("x" -> TFloat, "y" -> TBool))
    // associative both ways
    assert(merge(b, a).fields.toMap == m.fields.toMap)
  }

  test("StructType carries time + ts first, tags as strings, fields typed") {
    val st = infer("m", pts("m,t=v i=1i,f=1.5,s=\"x\",b=false 1")).toStructType
    assert(st.fieldNames.take(3).toSeq == Seq("time_ns", "ts", "t"))
    assert(st("i").dataType == LongType)
    assert(st("f").dataType == DoubleType)
    assert(st("s").dataType == StringType)
    assert(st("b").dataType == BooleanType)
    assert(st("t").dataType == StringType)
  }
}
