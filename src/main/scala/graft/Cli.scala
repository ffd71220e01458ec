package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline
import graft.telemetry.ParquetTelemetryStore

/** CLI entry points mirroring the reference's two commands
  * (/root/reference/src/beyond_vector_search/run.py:76-84,
  *  /root/reference/src/beyond_vector_search/evaluate.py:119-125).
  */
object Cli {
  /** Silence WindowExec's `No Partition Defined ... may cause serious
    * performance degradation` warning. Every global window in this repo
    * runs over a provably bounded frame (SCALE.md "Global windows are
    * bounded-frame only"): rank-over-top-k after `limit(TopK)` (≤ 50
    * rows), the KmeansK-row seed window, the quality-histogram prefix
    * window (≤ 10⁶ bucket rows, by design per the q78 scaladoc), and the
    * 3-row funnel-stage window. The warning fires 52× per bench run and
    * buries real signals; the proof lives in SCALE.md, so the log noise
    * carries no information. */
  def quietBoundedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see EventsOps.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // Order matters: setLogLevel → Configurator.setAllLevels, which wipes
    // per-logger overrides — quiet the WindowExec logger AFTER it.
    s.sparkContext.setLogLevel("WARN")
    quietBoundedWindowWarnings()
    s
  }
}

/** `sbt "runMain graft.RunQuery <query> [k] [telemetryDir]"` — route one
  * query through the adaptive router and print the answer JSON. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunQuery <query> [k] [telemetryDir]")
    val query = args(0)
    val k = if (args.length > 1) args(1).toInt else 5
    val dir = if (args.length > 2) args(2) else "target/telemetry"
    val spark = Cli.session()

    val docs = Pipeline.loadCorpusJsonl(spark, "data/corpus.jsonl")
    val labels = Pipeline.loadLabelsJsonl(spark, "data/labels.jsonl")
    val idx = Pipeline.buildIndexes(docs)
    val store = new ParquetTelemetryStore(spark, dir)

    val out = Pipeline.runOnce(spark, idx, labels, store, query, k)
    out.select(to_json(struct(out.columns.map(col): _*)).as("j"))
      .collect().foreach(r => println(r.getString(0)))
    spark.stop()
  }
}

/** `sbt "runMain graft.Evaluate [k] [telemetryDir]"` — evaluate all labeled
  * queries, update router weights, print per-query results + state. */
object Evaluate {
  def main(args: Array[String]): Unit = {
    val k = if (args.length > 0) args(0).toInt else 5
    val dir = if (args.length > 1) args(1) else "target/telemetry"
    val spark = Cli.session()

    val docs = Pipeline.loadCorpusJsonl(spark, "data/corpus.jsonl")
    val labels = Pipeline.loadLabelsJsonl(spark, "data/labels.jsonl")
    val idx = Pipeline.buildIndexes(docs)
    val store = new ParquetTelemetryStore(spark, dir)

    val out = Pipeline.evaluateAll(spark, idx, labels, store, k)
    out.perQuery
      .select(col("query_id"), col("strategy"), round(col("chosen_total"), 6).as("score"),
        round(col("vector_total"), 6).as("vector"),
        round(col("keyword_total"), 6).as("keyword"),
        round(col("hybrid_total"), 6).as("hybrid"))
      .orderBy("query_id").show(50, truncate = false)
    println(s"""{"mean_score":${out.meanScore},"n":${out.perQuery.count()},""" +
      s""""router_state":{"weight_vector":${out.state.weightVector},""" +
      s""""weight_keyword":${out.state.weightKeyword},""" +
      s""""weight_hybrid":${out.state.weightHybrid},"lr":${out.state.lr}}}""")

    // Telemetry inspection (reference notebooks/demo.py:279-327): the most
    // recent run rows, newest first.
    store match {
      case p: ParquetTelemetryStore =>
        println("[telemetry] recent runs:")
        p.recentRuns(5)
          .select(col("ts_unix"), col("query"), col("strategy"), col("score"))
          .show(5, truncate = 40)
      case _ => ()
    }
    spark.stop()
  }
}
