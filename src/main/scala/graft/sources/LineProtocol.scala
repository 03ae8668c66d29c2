package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol parser — the reference's ingest format
  * (`models.ParsePoints` at `/root/reference/service/write_handler.go:74`;
  * escaping rules are public InfluxDB docs).
  *
  *   measurement[,tag=value...] field=value[,field=value...] [timestamp-ns]
  *
  * Escapes: `\,` `\ ` `\=` in identifiers/tag values; field strings are
  * double-quoted with `\"` escapes; integer fields end in `i`; booleans are
  * t/T/true/True/f/F/false/False.
  *
  * Scale notes: parsing is a pure per-line function — `Dataset[String] →
  * flatMap` distributes it with zero shuffle; the same function serves
  * batch files (`spark.read.text`) and Structured Streaming sources
  * verbatim. Malformed lines go to a dead-letter side channel rather than
  * failing the batch (the reference 400s the whole request —
  * `write_handler.go:78`; at 100 TB we quarantine instead).
  */
object LineProtocol {

  sealed trait FieldValue
  final case class FFloat(v: Double) extends FieldValue
  final case class FInt(v: Long) extends FieldValue
  final case class FBool(v: Boolean) extends FieldValue
  final case class FStr(v: String) extends FieldValue

  final case class Point(
      measurement: String,
      tags: Map[String, String],
      fields: Map[String, FieldValue],
      timeNs: Option[Long])

  final case class ParseError(line: String, reason: String)

  /** Split on `sep` honoring backslash escapes (no regex — hot path). */
  private def splitEscaped(s: String, sep: Char): List[String] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < s.length) {
      val c = s(i)
      if (c == '\\' && i + 1 < s.length) { // escapes apply inside quotes too (\")
        cur += c += s(i + 1); i += 2
      } else if (c == '"') { inQuote = !inQuote; cur += c; i += 1 }
      else if (c == sep && !inQuote) { out += cur.result(); cur.clear(); i += 1 }
      else { cur += c; i += 1 }
    }
    out += cur.result()
    out.result()
  }

  private def unescapeIdent(s: String): String =
    s.replace("\\,", ",").replace("\\ ", " ").replace("\\=", "=")

  def parseLine(line: String): Either[ParseError, Point] = {
    val trimmed = line.trim
    if (trimmed.isEmpty || trimmed.startsWith("#"))
      return Left(ParseError(line, "empty or comment"))
    try {
      val parts = splitEscaped(trimmed, ' ').filter(_.nonEmpty)
      if (parts.size < 2 || parts.size > 3)
        return Left(ParseError(line, s"expected 2-3 space-separated sections, got ${parts.size}"))

      val keyPart :: fieldPart :: rest = parts
      val keySegs = splitEscaped(keyPart, ',')
      val measurement = unescapeIdent(keySegs.head)
      if (measurement.isEmpty) return Left(ParseError(line, "empty measurement"))
      val tags = keySegs.tail.map { seg =>
        splitEscaped(seg, '=') match {
          case k :: v :: Nil => unescapeIdent(k) -> unescapeIdent(v)
          case _             => return Left(ParseError(line, s"bad tag segment '$seg'"))
        }
      }.toMap

      val fields = splitEscaped(fieldPart, ',').map { seg =>
        splitEscaped(seg, '=') match {
          case k :: v :: Nil => unescapeIdent(k) -> parseFieldValue(v)
          case _             => return Left(ParseError(line, s"bad field segment '$seg'"))
        }
      }.toMap
      if (fields.isEmpty) return Left(ParseError(line, "no fields"))

      val ts = rest.headOption.map(_.toLong)
      Right(Point(measurement, tags, fields, ts))
    } catch {
      case e: Exception => Left(ParseError(line, e.getMessage))
    }
  }

  private def parseFieldValue(v: String): FieldValue = v match {
    case s if s.startsWith("\"") && s.endsWith("\"") && s.length >= 2 =>
      FStr(s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\\\", "\\"))
    case s if s.endsWith("i") => FInt(s.dropRight(1).toLong)
    case "t" | "T" | "true" | "True" | "TRUE"    => FBool(true)
    case "f" | "F" | "false" | "False" | "FALSE" => FBool(false)
    case s => FFloat(s.toDouble)
  }

  /** Serialize a point back to line protocol (the reference's export path,
    * `syncing/importer.go:369-404`). */
  def serialize(p: Point): String = {
    def esc(s: String) = s.replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=")
    val key = (esc(p.measurement) +: p.tags.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${esc(k)}=${esc(v)}" }).mkString(",")
    val fields = p.fields.toSeq.sortBy(_._1).map { case (k, v) =>
      val vs = v match {
        case FFloat(x) => if (x == x.toLong.toDouble) s"${x.toLong}" else x.toString
        case FInt(x)   => s"${x}i"
        case FBool(x)  => x.toString
        case FStr(x)   => "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }
      s"${esc(k)}=$vs"
    }.mkString(",")
    s"$key $fields${p.timeNs.map(t => s" $t").getOrElse("")}"
  }

  /** Decompress a gzip write body (reference write_handler.go:55-63: the
    * /write endpoint accepts Content-Encoding: gzip). */
  def gunzip(body: Array[Byte]): String = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Split a write body into non-empty lines (the wire format is one point
    * per LF-separated line; blank lines and a trailing newline are legal). */
  def splitLines(body: String): Seq[String] =
    body.split("\n", -1).toSeq.map(_.stripSuffix("\r")).filter(_.trim.nonEmpty)

  /** The measurement name a line writes to, WITHOUT fully parsing it — the
    * light scan the HTTP fan-in uses to group a mixed-measurement body
    * (write_handler.go:103 partitions points the same way). Unescapes
    * `\,` `\ ` `\=` like parseLine so the group key matches the parsed
    * point; malformed lines yield whatever prefix they have and are then
    * dead-lettered by the real parse. */
  def measurementOf(line: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < line.length && { val c = line.charAt(i); c != ',' && c != ' ' }) {
      if (line.charAt(i) == '\\' && i + 1 < line.length) {
        sb.append(line.charAt(i + 1)); i += 2
      } else { sb.append(line.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Distributed parse: lines → (points flattened to a dynamic-schema
    * DataFrame for one measurement, dead-letter errors). Schema: time_ns
    * LONG, ts TIMESTAMP(µs), tags STRING..., fields typed by inference on
    * the first batch (conflicts widen to double/string — SURVEY §1.2). */
  /** One-pass parse keeping the dead-letter reason as an `err` column —
    * callers that need point AND error counts get both from a single
    * aggregation over this frame instead of re-parsing the batch per
    * count (Engine.writeLineProtocol ingest hygiene). */
  /** Timestamp multiplier for the reference's `/write?precision=` URL param
    * (write_handler.go precision scaling; public InfluxDB API): incoming
    * timestamps arrive in the given unit and are scaled to nanoseconds. */
  def precisionToNs(precision: String): Long = precision match {
    case "ns" | "n" => 1L
    case "u" | "us" | "µ" => 1000L
    case "ms"       => 1000000L
    case "s"        => 1000000000L
    // the reference's /write accepts minute/hour precision too
    // (models.Point precision param on the write handler)
    case "m"        => 60000000000L
    case "h"        => 3600000000000L
    case o => throw new IllegalArgumentException(s"bad precision '$o' (want ns|u|ms|s|m|h)")
  }

  /** Fields travel the tuple as canonical STRING tokens and land typed by
    * the declared `fieldTypes` — InfluxDB's four field types end to end.
    * Type agreement is enforced IN THE PARSE LAMBDA (a value whose parsed
    * type conflicts with the declared column nulls out; numerics written
    * into a widened string column keep their literal form), so the final
    * cast only ever sees canonical tokens — it cannot throw under ANSI
    * mode. `fieldTypes` empty = all float (legacy callers). */
  def parseRaw(spark: SparkSession, lines: Dataset[String], measurement: String,
      tagKeys: Seq[String], floatFields: Seq[String],
      precision: String = "ns", fieldTypes: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val mult = precisionToNs(precision) // resolved driver-side, once
    val types = floatFields.indices.map(i => fieldTypes.lift(i).getOrElse("float"))
    val parsed = lines.map { l =>
      parseLine(l) match {
        case Right(p) if p.measurement == measurement =>
          val tagVals = tagKeys.map(p.tags.getOrElse(_, null))
          val fieldVals = floatFields.zip(types).map { case (f, want) =>
            (want, p.fields.get(f).orNull) match {
              case (_, null)                 => null
              case ("float", FFloat(x))      => x.toString
              case ("float", FInt(x))        => x.toString
              case ("integer", FInt(x))      => x.toString
              case ("boolean", FBool(x))     => if (x) "true" else "false"
              case ("string", FStr(x))       => x
              case ("string", FFloat(x))     => x.toString // widened column:
              case ("string", FInt(x))       => x.toString // numerics keep
              case ("string", FBool(x))      => x.toString // their literal form
              case _                         => null // declared-type conflict
            }
          }
          (p.timeNs.map(_ * mult).getOrElse(-1L), tagVals, fieldVals.map(Option(_)), null.asInstanceOf[String])
        case Right(p)  => (-1L, Seq.empty[String], Seq.empty[Option[String]], s"wrong measurement ${p.measurement}: $l")
        case Left(err) => (-1L, Seq.empty[String], Seq.empty[Option[String]], s"${err.reason}: ${err.line}")
      }
    }
    def cast(c: org.apache.spark.sql.Column, i: Int) =
      types(i) match {
        case "integer" => c.cast("long")
        case "boolean" => c.cast("boolean")
        case "string"  => c
        case _         => c.cast("double")
      }
    val cols = // get() (not getItem): dead-letter rows carry EMPTY arrays
      (col("_1").as("time_ns") +:
        timestamp_micros(expr("_1 div 1000")).as("ts") +:
        tagKeys.zipWithIndex.map { case (t, i) => get(col("_2"), lit(i)).as(t) } ++:
        floatFields.zipWithIndex.map { case (f, i) => cast(get(col("_3"), lit(i)), i).as(f) }) :+
        col("_4").as("err")
    parsed.toDF().select(cols: _*)
  }

  def parse(spark: SparkSession, lines: Dataset[String], measurement: String,
      tagKeys: Seq[String], floatFields: Seq[String],
      precision: String = "ns", fieldTypes: Seq[String] = Nil): (DataFrame, Dataset[String]) = {
    import spark.implicits._
    val raw = parseRaw(spark, lines, measurement, tagKeys, floatFields, precision, fieldTypes)
    val ok = raw.where(col("err").isNull).drop("err")
    val errs = raw.where(col("err").isNotNull).select(col("err")).as[String]
    (ok, errs)
  }
}
