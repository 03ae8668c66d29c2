package graft.ql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SHOW-statement surface (reference `RouteToFirstAvailable` dispatch,
  * `service/routing.go:43-58`; meta scans `syncing/importer.go:406-456`).
  * Catalog-backed, except SHOW SERIES / TAG VALUES which scan distinct tag
  * combinations — at scale those are aggregations over the tag columns
  * (dictionary-encoded parquet scan, no full-row materialization).
  */
object Meta {
  private def all = Seq(Catalog.events)

  /** SHOW … WHERE support: the kinds whose result is a measurement SCAN
    * and can therefore be row-filtered (the Grafana meta-query set). */
  val Whereable = Set("SERIES", "TAG VALUES", "SERIES CARDINALITY",
    "TAG VALUES CARDINALITY")

  private def tagName(e: Expr): Option[String] = e match {
    case Ident(n)           => Some(n)
    case TypedIdent(n, "tag") => Some(n)
    case Paren(x)           => tagName(x)
    case _                  => None
  }

  /** SHOW … WHERE <tag predicate> → Column over a measurement scan.
    * A tag the measurement lacks evaluates as the EMPTY STRING (influxdb
    * models absent tags as "" — `host != 'a'` matches series without a
    * host tag). Only tag comparisons are allowed; anything else is the
    * reference data node's 400. */
  def tagPredicate(e: Expr, cols: Seq[String]): Column = {
    def tc(x: Expr): Column = tagName(x) match {
      case Some(t) if cols.contains(t) => col(t)
      case Some(_)                     => lit("")
      case None => throw ParseException(s"SHOW WHERE expects a tag key, got $x")
    }
    e match {
      case Bin("AND", l, r) => tagPredicate(l, cols) && tagPredicate(r, cols)
      case Bin("OR", l, r)  => tagPredicate(l, cols) || tagPredicate(r, cols)
      case Paren(x)         => tagPredicate(x, cols)
      case Bin("=", l, StrLit(v))        => tc(l) === v
      case Bin("!=" | "<>", l, StrLit(v)) => tc(l) =!= v
      case Bin("=~", l, RegexLit(p))     => tc(l).rlike(p)
      case Bin("!~", l, RegexLit(p))     => !tc(l).rlike(p)
      case x => throw ParseException(s"unsupported SHOW WHERE predicate $x")
    }
  }

  def show(spark: SparkSession, sfDir: String, what: String,
      withKey: Option[String] = None, from: Option[String] = None,
      where: Option[Expr] = None): DataFrame = {
    import spark.implicits._
    // FROM m restricts the scan to one measurement (influxql)
    val measurements = all.filter(m => from.forall(_ == m.measurement))
    if (measurements.isEmpty)
      throw ParseException(s"unknown measurement '${from.getOrElse("")}'")
    if (where.isDefined && !Whereable(what))
      throw ParseException(s"SHOW $what does not support WHERE")
    what match {
      case "DATABASES" => Seq("default").toDF("name")
      case "MEASUREMENTS" =>
        graft.Engine.filterMeasurements(measurements.map(_.measurement), withKey)
          .toDF("name")
      case "TAG KEYS" =>
        measurements.flatMap(m => m.tags.map(t => (m.measurement, t)))
          .toDF("measurement", "tagKey")
      case "FIELD KEYS" =>
        measurements.flatMap(m => m.fields.map(f =>
          (m.measurement, f.name, f.ftype)))
          .toDF("measurement", "fieldKey", "fieldType")
      case "SERIES" =>
        // series key = measurement,tag=value (syncing/series.go:14-29)
        measurements.map { m =>
          val (df0, _) = Catalog.load(spark, sfDir, m.measurement)
          val df = where.map(w => df0.where(tagPredicate(w, df0.columns))).getOrElse(df0)
          df.select(m.tags.map(col): _*).distinct()
            .select(concat(lit(m.measurement),
              concat_ws("", m.tags.map(t => concat(lit(s",$t="), col(t))): _*)).as("key"))
        }.reduce(_ union _)
      case "TAG VALUES" =>
        // WITH KEY = k restricts the scanned tag columns (influxql surface)
        val picked = measurements.map(m =>
          m -> m.tags.filter(t => withKey.forall(_ == t))).filter(_._2.nonEmpty)
        if (picked.isEmpty)
          throw ParseException(s"no tag key ${withKey.getOrElse("")} on any measurement")
        picked.map { case (m, keys) =>
          val (df0, _) = Catalog.load(spark, sfDir, m.measurement)
          val df = where.map(w => df0.where(tagPredicate(w, df0.columns))).getOrElse(df0)
          keys.map(t => df.select(lit(t).as("key"), col(t).as("value")).distinct())
            .reduce(_ union _)
        }.reduce(_ union _)
      case "RETENTION POLICIES" =>
        Seq(("autogen", "0s", "168h0m0s", 1, true))
          .toDF("name", "duration", "shardGroupDuration", "replicaN", "default")
      case "CONTINUOUS QUERIES" => Seq.empty[(String, String)].toDF("name", "query")
      // [EXACT] CARDINALITY family — answered exactly (the estimate
      // variants are a strict upgrade, like exact mode/stddev). The series
      // count is a distinct-aggregation over dictionary-encoded tag
      // columns; everything else is catalog arithmetic.
      case "SERIES CARDINALITY" =>
        show(spark, sfDir, "SERIES", withKey, from, where)
          .agg(count(lit(1)).cast("long").as("count"))
      case "MEASUREMENT CARDINALITY" =>
        Seq(measurements.length.toLong).toDF("count")
      case "TAG KEY CARDINALITY" =>
        measurements.map(m => (m.measurement, m.tags.length.toLong))
          .toDF("measurement", "count")
      case "FIELD KEY CARDINALITY" =>
        measurements.map(m => (m.measurement, m.fields.length.toLong))
          .toDF("measurement", "count")
      case "TAG VALUES CARDINALITY" =>
        val picked = measurements.map(m =>
          m -> m.tags.filter(t => withKey.forall(_ == t))).filter(_._2.nonEmpty)
        if (picked.isEmpty)
          throw ParseException(s"no tag key ${withKey.getOrElse("")} on any measurement")
        picked.map { case (m, keys) =>
          val (df, _) = Catalog.load(spark, sfDir, m.measurement)
          df.agg(keys.map(t => countDistinct(col(t))).reduce(_ + _).cast("long").as("count"))
            .select(lit(m.measurement).as("measurement"), col("count"))
        }.reduce(_ unionByName _)
      case w => throw ParseException(s"unsupported SHOW $w")
    }
  }
}
