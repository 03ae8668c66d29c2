package graft

import org.apache.spark.sql.DataFrame

/** InfluxDB-style JSON result serializer — the reference's response shape
  * (`/root/reference/service/query_utils.go:22-87`):
  *
  *   {"results":[{"statement_id":0,"series":[
  *     {"name":m,"tags":{...},"columns":[...],"values":[[...]]}]}]}
  *
  * Observable compat details preserved (SURVEY §7.0): empty result set →
  * `{"results":[{}]}`; `time` is column 0; per-series blocks keyed by the
  * tag combination.
  *
  * Two serializers: `serialize` buffers via collect() — fine for final
  * aggregates, exactly the reference's proxy buffering
  * (`service/query_handler.go:84-87`) — and `serializeStream`, which
  * walks `toLocalIterator()` over a tag-sorted plan and writes one row at
  * a time: O(one partition) driver memory, so `SELECT *` over a huge raw
  * range cannot kill the driver.
  */
object InfluxJson {

  private def jsonValue(v: Any): String = v match {
    case null                => "null"
    case s: String           => "\"" + escape(s) + "\""
    case b: Boolean          => b.toString
    case n: java.lang.Number => n.toString
    case ts: java.sql.Timestamp => ts.getTime.toString
    case other               => "\"" + escape(other.toString) + "\""
  }

  private def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c    => c.toString
  }

  /** Format an epoch-µs time value per the `epoch` param
    * (coordinator.go:32-46): None → RFC3339 string; ns/u/ms/s → integer. */
  private def formatTime(us: Long, epoch: Option[String]): String = epoch match {
    case None => "\"" + java.time.Instant.ofEpochSecond(us / 1000000L,
      (us % 1000000L) * 1000L).toString + "\""
    case Some("ns")       => (us * 1000L).toString
    case Some("u" | "us") => us.toString
    case Some("ms")       => (us / 1000L).toString
    case Some("s")        => (us / 1000000L).toString
    case Some(o)          => throw new IllegalArgumentException(s"bad epoch unit $o")
  }

  /** TEST-SCOPE ONLY (spec equality aid): serialize a collected result.
    * `tagCols` become the per-series tag map (rows are grouped into one
    * series block per tag combination, like `groupResultsByTags`,
    * coordinator.go:48-70). A LONG `time` column is treated as epoch-µs
    * and formatted per `epoch`. Production response paths all go through
    * `serializeStream*`/`serializeChunked` (toLocalIterator — bounded
    * driver memory); no Engine caller reaches this collect() (VERDICT
    * r8 #4). Kept in main only because specs prove the two serializers
    * byte-identical. */
  def serialize(name: String, df: DataFrame, tagCols: Seq[String] = Nil,
      epoch: Option[String] = Some("u")): String =
    s"""{"results":[${serializeResult(name, df, tagCols, epoch)}]}"""

  /** Collected-result object form of [[serialize]] — same TEST-SCOPE ONLY
    * caveat: `{"statement_id":sid,"series":[...]}`, or `{}` for an empty
    * result (the reference always answers with at least one result object,
    * query_utils.go:73-81). */
  def serializeResult(name: String, df: DataFrame, tagCols: Seq[String] = Nil,
      epoch: Option[String] = Some("u"), sid: Int = 0): String = {
    // eager validation — a bad unit must fail even when the result happens
    // to carry no time column
    epoch.foreach(u => require(Set("ns", "u", "us", "ms", "s")(u), s"bad epoch unit $u"))
    val rows = df.collect()
    if (rows.isEmpty) return emptyResult(sid)
    val cols = df.columns
    val tagIdx: Seq[Int] = tagCols.map(t => cols.indexOf(t)).filter(_ >= 0)
    val valueIdx = cols.indices.filterNot(tagIdx.contains)
    val valueCols = valueIdx.map(cols)

    val bySeries: Map[Seq[(String, String)], Array[org.apache.spark.sql.Row]] =
      rows.groupBy(r => tagIdx.map(i => cols(i) -> String.valueOf(r.get(i))))
    val seriesJson = bySeries.toSeq.sortBy(_._1.map(_._2).mkString(","))
      .map { case (tags, rs) =>
        val tagJson =
          if (tags.isEmpty) ""
          else tags.map { case (k, v) => s""""${escape(k)}":"${escape(v)}"""" }
            .mkString(""""tags":{""", ",", "},")
        val colsJson = valueCols.map(c => "\"" + escape(c) + "\"").mkString("[", ",", "]")
        val timePos = valueCols.indexOf("time")
        val valsJson = rs.map(r => valueIdx.zipWithIndex.map { case (i, vi) =>
            r.get(i) match {
              case us: java.lang.Long if vi == timePos => formatTime(us, epoch)
              case v => jsonValue(v)
            }
          }.mkString("[", ",", "]"))
          .mkString("[", ",", "]")
        s"""{"name":"${escape(name)}",$tagJson"columns":$colsJson,"values":$valsJson}"""
      }
      .mkString("[", ",", "]")
    s"""{"statement_id":$sid,"series":$seriesJson}"""
  }

  /** Chunked serialization — the reference proxy's `chunked=true` wire
    * protocol (`service/query_utils.go:34-46` parses newline-delimited
    * response objects and concatenates their Results; InfluxDB emits one
    * line per chunk with `"partial":true` on every non-final chunk of a
    * series). Each output line is a complete results envelope holding one
    * series block of ≤ chunkSize values, so the reference's own parser —
    * and any Influx client — consumes it unchanged. Rows come off
    * `toLocalIterator` like serializeStream: O(one partition + one chunk)
    * driver memory. */
  def serializeChunked(name: String, df: DataFrame, out: java.io.Writer,
      chunkSize: Int = 10000, tagCols: Seq[String] = Nil,
      epoch: Option[String] = Some("u"), timeDesc: Boolean = false,
      sid: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    epoch.foreach(u => require(Set("ns", "u", "us", "ms", "s")(u), s"bad epoch unit $u"))
    require(chunkSize > 0, "chunkSize must be positive")
    val cols = df.columns
    val tagIdx: Seq[Int] = tagCols.map(t => cols.indexOf(t)).filter(_ >= 0)
    val valueIdx = cols.indices.filterNot(tagIdx.contains)
    val valueCols = valueIdx.map(cols)
    val timePos = valueCols.indexOf("time")
    val timeSort =
      if (!cols.contains("time")) Nil
      else Seq(if (timeDesc) col("time").desc else col("time").asc)
    val ordered =
      if (tagIdx.isEmpty) df
      else df.orderBy(tagIdx.map(i => col(cols(i)).asc) ++ timeSort: _*)
    val it = ordered.toLocalIterator()
    if (!it.hasNext) { out.write(s"""{"results":[${emptyResult(sid)}]}""" + "\n"); return }
    val colsJson = valueCols.map(c => "\"" + escape(c) + "\"").mkString("[", ",", "]")
    def rowJson(r: org.apache.spark.sql.Row): String =
      valueIdx.zipWithIndex.map { case (i, vi) =>
        r.get(i) match {
          case us: java.lang.Long if vi == timePos => formatTime(us, epoch)
          case v => jsonValue(v)
        }
      }.mkString("[", ",", "]")
    def tagJson(tags: Seq[(String, String)]): String =
      if (tags.isEmpty) ""
      else tags.map { case (k, v) => s""""${escape(k)}":"${escape(v)}"""" }
        .mkString(""""tags":{""", ",", "},")
    def writeChunk(tags: Seq[(String, String)], vals: Seq[String], partial: Boolean): Unit = {
      val p = if (partial) ""","partial":true""" else ""
      out.write(s"""{"results":[{"statement_id":$sid,"series":[""" +
        s"""{"name":"${escape(name)}",${tagJson(tags)}"columns":$colsJson,""" +
        s""""values":${vals.mkString("[", ",", "]")}$p}]$p}]}""" + "\n")
    }
    import scala.jdk.CollectionConverters._
    val bit = it.asScala.buffered // one-row lookahead decides `partial`
    def tagsOf(r: org.apache.spark.sql.Row): Seq[(String, String)] =
      tagIdx.map(i => cols(i) -> String.valueOf(r.get(i)))
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (bit.hasNext) {
      val r = bit.next()
      val cur = tagsOf(r)
      buf += rowJson(r)
      val seriesContinues = bit.hasNext && tagsOf(bit.head) == cur
      if (!seriesContinues) { // last row of this series: final chunk
        writeChunk(cur, buf.toSeq, partial = false)
        buf.clear()
      } else if (buf.size == chunkSize) { // full chunk, series continues
        writeChunk(cur, buf.toSeq, partial = true)
        buf.clear()
      }
    }
  }

  /** Streamed serialization: sort by the tag columns so every series is
    * contiguous, then emit rows straight off `toLocalIterator()` (Spark
    * fetches one partition at a time — the driver never holds the result).
    * Series-block boundaries open/close as the tag combination changes.
    *
    * `timeDesc` carries the query's ORDER BY direction into the
    * tag-contiguity sort (tags asc, time in the query's direction) — a
    * `GROUP BY tag ORDER BY time DESC` must stream each series newest-
    * first. One sort satisfies both needs, and it is also the ONLY sort
    * that executes: Catalyst's EliminateSorts drops the translator's own
    * trailing global orderBy when this one immediately follows it
    * (verified: the executed plan carries a single Sort node), so the
    * streamed path costs one Exchange+Sort, not two. */
  def serializeStream(name: String, df: DataFrame, out: java.io.Writer,
      tagCols: Seq[String] = Nil, epoch: Option[String] = Some("u"),
      timeDesc: Boolean = false): Unit = {
    out.write("""{"results":[""")
    serializeStreamResult(name, df, out, tagCols, epoch, timeDesc)
    out.write("]}")
  }

  /** `{}` compat shape for statement 0 (SURVEY §7.0 pins the reference's
    * empty answer `{"results":[{}]}`); later statements carry their id so
    * a client can line results up with its statements. */
  private def emptyResult(sid: Int): String =
    if (sid == 0) "{}" else s"""{"statement_id":$sid}"""

  /** Result-object form of the streamed serializer (multi-statement
    * requests write several of these into one results array). */
  def serializeStreamResult(name: String, df: DataFrame, out: java.io.Writer,
      tagCols: Seq[String] = Nil, epoch: Option[String] = Some("u"),
      timeDesc: Boolean = false, sid: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    epoch.foreach(u => require(Set("ns", "u", "us", "ms", "s")(u), s"bad epoch unit $u"))
    val cols = df.columns
    val tagIdx: Seq[Int] = tagCols.map(t => cols.indexOf(t)).filter(_ >= 0)
    val valueIdx = cols.indices.filterNot(tagIdx.contains)
    val valueCols = valueIdx.map(cols)
    val timePos = valueCols.indexOf("time")
    val timeSort =
      if (!cols.contains("time")) Nil
      else Seq(if (timeDesc) col("time").desc else col("time").asc)
    val ordered =
      if (tagIdx.isEmpty) df
      else df.orderBy(tagIdx.map(i => col(cols(i)).asc) ++ timeSort: _*)
    val it = ordered.toLocalIterator()
    if (!it.hasNext) { out.write(emptyResult(sid)); return }
    out.write(s"""{"statement_id":$sid,"series":[""")
    val colsJson = valueCols.map(c => "\"" + escape(c) + "\"").mkString("[", ",", "]")
    var cur: Seq[(String, String)] = null
    var firstRow = true
    while (it.hasNext) {
      val r = it.next()
      val tags = tagIdx.map(i => cols(i) -> String.valueOf(r.get(i)))
      if (cur == null || tags != cur) {
        if (cur != null) out.write("]},")
        cur = tags
        val tagJson =
          if (tags.isEmpty) ""
          else tags.map { case (k, v) => s""""${escape(k)}":"${escape(v)}"""" }
            .mkString(""""tags":{""", ",", "},")
        out.write(s"""{"name":"${escape(name)}",$tagJson"columns":$colsJson,"values":[""")
        firstRow = true
      }
      if (!firstRow) out.write(",")
      firstRow = false
      out.write(valueIdx.zipWithIndex.map { case (i, vi) =>
        r.get(i) match {
          case us: java.lang.Long if vi == timePos => formatTime(us, epoch)
          case v => jsonValue(v)
        }
      }.mkString("[", ",", "]"))
    }
    out.write("]}]}")
  }
}
