package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** The streaming operators must reproduce their batch twins when fed the
  * bounded sf0.001 events table through a memory stream.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def loadEvents(): Seq[Ev] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
  }

  test("streaming hourly counts equal the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Ev]
    stream.addData(events)

    val q = StreamingOps.hourlyCounts(stream.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hourly_out")
      .select("hour_epoch", "event_type", "n", "sum_value")

    val batch = events.toDF()
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming session_window yields plausible sessions with bounded counts") {
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Ev]
    stream.addData(events)

    val q = StreamingOps.userSessions(stream.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out").start()
    try q.processAllAvailable() finally q.stop()

    val sessions = spark.table("sessions_out")
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == events.size) // every event lands in exactly one session
    assert(sessions.count() > 0 &&
      sessions.count() <= events.map(_.user_id).distinct.size * 200L)
  }
}
