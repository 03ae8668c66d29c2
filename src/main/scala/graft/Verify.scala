package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always passes two args = full run)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val spark = Sessions.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    // Manifest of every registered query, written BEFORE any query runs:
    // the compare side diffs output dirs against it, so a query that
    // crashes (or a wholesale Verify abort) surfaces as an explicit err
    // row instead of silently vanishing from the round's correctness
    // (VERDICT r8 #5: 110 queries disappeared from CORRECTNESS_r08).
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      SparkEntry.queries.keys.toSeq.filter(n => only.forall(_(n))).sorted
        .mkString("[\"", "\",\"", "\"]"))
    SparkEntry.queries.filter(q => only.forall(_(q._1))).foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce narrows the query's own
      // final stage to one task — a shuffle join or heavy projection then
      // executes inside the single write task (observed: d_shingle_jaccard's
      // quadratic probe ran 32× slower at sf1, single-core, in full Verify
      // runs while benching fine standalone). repartition adds one tiny
      // exchange of the RESULT rows and keeps the query at full parallelism.
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        TempDirs.keepForForensics() // keep the failed gate's scratch dirs
        // durable failure marker: a dir with _error and no parquet reads
        // as a loud per-query failure in tools/check.py and for the judge
        try {
          new java.io.File(s"$outDir/$name").mkdirs()
          Files.writeString(Paths.get(s"$outDir/$name/_error"),
            s"${e.getClass.getName}: ${e.getMessage}\n")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
