package graft

import org.apache.spark.sql.functions._

import graft.router.RouterState
import graft.telemetry.JdbcTelemetryStore

/** Round-trips the JDBC telemetry backend (reference telemetry.py:128-186
  * twin) through embedded Derby — runs append + inspection scan, keyed
  * state upsert with default on missing table. */
class JdbcTelemetrySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").resolve("tdb")
  private lazy val store =
    new JdbcTelemetryStore(spark, s"jdbc:derby:$dbDir;create=true")

  private def runsDf(ts: Double, q: String) =
    Seq((ts, q, "hybrid", 1.0, """{"k":5}"""))
      .toDF("ts_unix", "query", "strategy", "score", "meta_json")

  test("state: default before first save, round-trips after") {
    assert(store.loadRouterState() == RouterState())
    val s = RouterState(0.25, -0.125, -0.125, 0.25)
    store.saveRouterState(s)
    assert(store.loadRouterState() == s)
    // upsert: a second save replaces, not duplicates
    val s2 = RouterState(0.5, -0.25, -0.25, 0.25)
    store.saveRouterState(s2)
    assert(store.loadRouterState() == s2)
  }

  test("runs: appends accumulate; recentRuns returns newest first") {
    store.logRuns(runsDf(1.0, "first"))
    store.logRuns(runsDf(2.0, "second"))
    val recent = store.recentRuns(10).collect()
    assert(recent.length == 2)
    assert(recent.head.getAs[String]("query") == "second")
    assert(recent.last.getAs[Double]("ts_unix") == 1.0)
    // string predicates work against the JDBC table (VARCHAR, not CLOB)
    val n = store.recentRuns(10)
      .filter(col("strategy") === "hybrid").count()
    assert(n == 2)
  }
}
