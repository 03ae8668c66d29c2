package graft.sources

import graft.ql.{FieldMeta, TableMeta}
import org.apache.spark.sql.types._

/** Dynamic schema inference + conflict widening for line-protocol ingest
  * (SURVEY §1.2: the reference discovers schema at runtime via SHOW
  * queries and coerces conflicting field types; InfluxDB itself rejects
  * type conflicts per shard — we widen instead, the lakehouse-friendly
  * choice, and record it).
  *
  * Widening lattice: Int < Float < String; Bool and any numeric conflict
  * → String (no sane numeric meaning). Tags are always STRING.
  */
object SchemaInfer {
  import LineProtocol._

  sealed trait FType { def rank: Int }
  case object TInt extends FType { val rank = 0 }
  case object TFloat extends FType { val rank = 1 }
  case object TBool extends FType { val rank = 0 }
  case object TString extends FType { val rank = 2 }

  def typeOf(v: FieldValue): FType = v match {
    case _: FInt   => TInt
    case _: FFloat => TFloat
    case _: FBool  => TBool
    case _: FStr   => TString
  }

  /** Widen two observed types to their least common representation. */
  def widen(a: FType, b: FType): FType = (a, b) match {
    case (x, y) if x == y             => x
    case (TInt, TFloat) | (TFloat, TInt) => TFloat
    case _                            => TString // bool vs numeric, anything vs string
  }

  final case class Inferred(
      measurement: String,
      tags: Seq[String],                 // sorted
      fields: Seq[(String, FType)]) {    // sorted by name
    def toStructType: StructType = StructType(
      StructField("time_ns", LongType, nullable = true) +:
      StructField("ts", TimestampType, nullable = true) +:
      tags.map(t => StructField(t, StringType, nullable = true)) ++:
      fields.map { case (f, t) =>
        StructField(f, t match {
          case TInt    => LongType
          case TFloat  => DoubleType
          case TBool   => BooleanType
          case TString => StringType
        }, nullable = true)
      })
    def toTableMeta: TableMeta = TableMeta(measurement, "ts_us", tags,
      fields.map { case (f, t) => FieldMeta(f, None, t match {
        case TInt    => "integer"
        case TBool   => "boolean"
        case TString => "string"
        case TFloat  => "float"
      }) })
  }

  /** Fold schema over a batch of parsed points of one measurement.
    * Associative + commutative, so at scale this runs as a distributed
    * treeAggregate over the point stream — no driver-side scan. */
  def infer(measurement: String, points: IterableOnce[Point]): Inferred = {
    var tags = Set.empty[String]
    var fields = Map.empty[String, FType]
    points.iterator.filter(_.measurement == measurement).foreach { p =>
      tags ++= p.tags.keys
      p.fields.foreach { case (k, v) =>
        val t = typeOf(v)
        fields = fields.updated(k, fields.get(k).map(widen(_, t)).getOrElse(t))
      }
    }
    Inferred(measurement, tags.toSeq.sorted, fields.toSeq.sortBy(_._1))
  }

  /** Merge two inferred schemas (the combiner side of treeAggregate /
    * cross-batch schema evolution à la parquet mergeSchema). */
  def merge(a: Inferred, b: Inferred): Inferred = {
    require(a.measurement == b.measurement, "cannot merge schemas of different measurements")
    val fields = (a.fields.toMap.keySet ++ b.fields.toMap.keySet).toSeq.sorted.map { k =>
      (a.fields.toMap.get(k), b.fields.toMap.get(k)) match {
        case (Some(x), Some(y)) => k -> widen(x, y)
        case (Some(x), None)    => k -> x
        case (None, Some(y))    => k -> y
        case _                  => throw new IllegalStateException
      }
    }
    Inferred(a.measurement, (a.tags ++ b.tags).distinct.sorted, fields)
  }
}
