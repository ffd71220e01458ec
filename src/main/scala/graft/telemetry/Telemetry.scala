package graft.telemetry

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.router.RouterState

/** Telemetry store: append-only run log + single-key router-state upsert
  * (/root/reference/src/beyond_vector_search/telemetry.py:37-92). The
  * reference backs this with SQLite or Postgres; here the default backend is
  * parquet (append-mode for runs, overwrite for the 1-row state table),
  * selected by a config-driven factory like the reference's env dispatch
  * (telemetry.py:189-209). A JDBC twin would implement the same trait with
  * `df.write.jdbc` / `spark.read.jdbc` — omitted in this zero-egress build.
  */
trait TelemetryStore {
  /** Append rows (ts_unix, query, strategy, score, meta_json). */
  def logRuns(runs: DataFrame): Unit
  def loadRouterState(): RouterState
  def saveRouterState(state: RouterState): Unit
}

object TelemetryStore {

  /** Env-driven backend dispatch, mirroring the reference's
    * `telemetry_from_env` (telemetry.py:189-209): GRAFT_TELEMETRY selects
    * the backend ("parquet" default | "memory"), GRAFT_TELEMETRY_DIR the
    * parquet root. A JDBC backend would be the third arm behind the same
    * trait (reference's "lakebase" Postgres twin) — not constructible in
    * this zero-egress environment.
    */
  def fromEnv(spark: SparkSession, defaultDir: String = "target/telemetry"): TelemetryStore =
    sys.env.getOrElse("GRAFT_TELEMETRY", "parquet") match {
      case "memory" => new InMemoryTelemetryStore
      case _ =>
        new ParquetTelemetryStore(spark,
          sys.env.getOrElse("GRAFT_TELEMETRY_DIR", defaultDir))
    }
}

/** Parquet-backed store rooted at `dir` (local path or any Hadoop FS URI).
  * Scale note: `runs` is an append-only event log — at production scale it
  * would be date-partitioned (`.partitionBy("ds")`) and compacted; the state
  * table is one row and its overwrite is the parquet analogue of the
  * reference's `ON CONFLICT DO UPDATE` upsert.
  */
final class ParquetTelemetryStore(spark: SparkSession, dir: String) extends TelemetryStore {
  private val runsPath = s"$dir/runs"
  private val statePath = s"$dir/router_state"

  private def exists(p: String): Boolean = {
    val path = new Path(p)
    val fs = FileSystem.get(new URI(p), spark.sparkContext.hadoopConfiguration)
    fs.exists(path)
  }

  override def logRuns(runs: DataFrame): Unit =
    runs.write.mode("append").parquet(runsPath)

  /** Inspection scan (reference notebooks/demo.py:285,315):
    * most recent n runs, newest first. */
  def recentRuns(n: Int = 10): DataFrame =
    spark.read.parquet(runsPath)
      .orderBy(org.apache.spark.sql.functions.desc("ts_unix"))
      .limit(n)

  override def loadRouterState(): RouterState =
    if (!exists(statePath)) RouterState()
    else {
      val r = spark.read.parquet(statePath)
        .select("weight_vector", "weight_keyword", "weight_hybrid", "lr")
        .collect()(0)
      RouterState(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }

  override def saveRouterState(state: RouterState): Unit = {
    import spark.implicits._
    Seq((state.weightVector, state.weightKeyword, state.weightHybrid, state.lr))
      .toDF("weight_vector", "weight_keyword", "weight_hybrid", "lr")
      .withColumn("key", lit("router_state:v1"))
      .coalesce(1).write.mode("overwrite").parquet(statePath)
  }
}

/** In-memory store for tests / ephemeral sessions. */
final class InMemoryTelemetryStore extends TelemetryStore {
  private var state = RouterState()
  private val logged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  override def logRuns(runs: DataFrame): Unit = { logged += runs; runs.count(); () }
  override def loadRouterState(): RouterState = state
  override def saveRouterState(s: RouterState): Unit = { state = s }
  def runFrames: Seq[DataFrame] = logged.toSeq
}
