package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** `sbt "runMain graft.StreamEvents <sfDir> [hourly|sessions|running]"` —
  * run the Structured Streaming operators over the events table as a
  * bounded file stream (micro-batch to completion), print the resulting
  * table. `running` exercises the custom flatMapGroupsWithState state.
  */
object StreamEvents {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val mode = if (args.length > 1) args(1) else "hourly"
    val spark = Cli.session() // sets nanosAsLong for the nanos events table

    // Schema must be declared for a streaming file source; ts arrives as
    // raw nanos (see EventsOps) and is floor-converted to micros.
    val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    // The streaming file source requires a directory; glob-filter down to
    // the events table.
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

    import spark.implicits._
    val out = mode match {
      case "sessions" => StreamingOps.userSessions(events)
      case "running" => StreamingOps.runningUserTotals(
        events.select("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.EventRow]).toDF()
      case _ => StreamingOps.hourlyCounts(events)
    }
    val outputMode = if (mode == "running") "update" else "complete"
    val q = out.writeStream.outputMode(outputMode)
      .format("memory").queryName("stream_out").start()
    q.processAllAvailable()
    val table = spark.table("stream_out")
    println(s"[stream] $mode rows=${table.count()}")
    table.orderBy(table.columns.map(col): _*).show(10, truncate = false)
    q.stop()
    spark.stop()
  }
}
