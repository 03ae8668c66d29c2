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
  * Driver-side by design: serialization happens after collect() on final
  * (small) results, exactly like the reference's proxy buffering — NOT in
  * the distributed data path.
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

  /** Serialize a collected result. `tagCols` become the per-series tag map
    * (rows are grouped into one series block per tag combination, like
    * `groupResultsByTags`, coordinator.go:48-70). */
  def serialize(name: String, df: DataFrame, tagCols: Seq[String] = Nil): String = {
    val rows = df.collect()
    if (rows.isEmpty) return """{"results":[{}]}"""
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
        val valsJson = rs.map(r => valueIdx.map(i => jsonValue(r.get(i))).mkString("[", ",", "]"))
          .mkString("[", ",", "]")
        s"""{"name":"${escape(name)}",$tagJson"columns":$colsJson,"values":$valsJson}"""
      }
      .mkString("[", ",", "]")
    s"""{"results":[{"statement_id":0,"series":$seriesJson}]}"""
  }
}
