package graft

import org.apache.spark.sql.DataFrame

/** CSV result serializer — the `/query` response when a client sends
  * `Accept: application/csv` (public InfluxDB 1.x HTTP API; the reference
  * proxies the header through untouched, `service/query_utils.go:107-116`
  * passBack copies response headers). Shape:
  *
  *   name,tags,time,<value columns...>
  *   cpu,host=a,1435781430000000,0.55
  *
  * One header per statement, rows follow; the `tags` cell is the series'
  * comma-joined key=value list (quoted when it holds a comma). Values
  * quote per RFC 4180 (embedded quotes double). Rows stream off
  * `toLocalIterator` exactly like the JSON path — the driver never holds
  * the result.
  */
object InfluxCsv {

  private def cell(v: Any): String = v match {
    case null => ""
    case s: String
      if s.contains(",") || s.contains("\"") || s.contains("\n") =>
      "\"" + s.replace("\"", "\"\"") + "\""
    case other => String.valueOf(other)
  }

  private def formatTime(us: Long, epoch: Option[String]): String = epoch match {
    case None => java.time.Instant.ofEpochSecond(us / 1000000L,
      (us % 1000000L) * 1000L).toString
    case Some("ns")       => (us * 1000L).toString
    case Some("u" | "us") => us.toString
    case Some("ms")       => (us / 1000L).toString
    case Some("s")        => (us / 1000000L).toString
    case Some(o)          => throw new IllegalArgumentException(s"bad epoch unit $o")
  }

  /** Stream one statement's result as CSV rows (header + data). Tag-sorted
    * like InfluxJson.serializeStreamResult so series stay contiguous. */
  def serializeStream(name: String, df: DataFrame, out: java.io.Writer,
      tagCols: Seq[String] = Nil, epoch: Option[String] = Some("u"),
      timeDesc: Boolean = false): Unit = {
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
    out.write(("name" +: "tags" +: valueCols).mkString(",") + "\n")
    val it = ordered.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val tags = tagIdx.map(i => s"${cols(i)}=${String.valueOf(r.get(i))}").mkString(",")
      val vals = valueIdx.zipWithIndex.map { case (i, vi) =>
        r.get(i) match {
          case us: java.lang.Long if vi == timePos => formatTime(us, epoch)
          case v => cell(v)
        }
      }
      out.write((cell(name) +: cell(tags) +: vals).mkString(",") + "\n")
    }
  }
}
