package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (small core count — specs run tiny
  * data; Sessions.build reads SPARK_GRAFT_CPUS which defaults to 4). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  /** Temp hygiene (VERDICT r18 #4): scratch dirs registered through
    * `TempDirs.scratch` are deleted by the JVM-exit hook on a green run;
    * any test failure marks the process so everything stays on disk for
    * forensics. Per-suite deletion would race parallel suites sharing
    * the JVM — the exit hook is the safe point. */
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    val outcome = super.withFixture(test)
    if (!outcome.isSucceeded) TempDirs.keepForForensics()
    outcome
  }
}

object SparkSpec {
  lazy val session: SparkSession = Sessions.build("graft-test")
}
