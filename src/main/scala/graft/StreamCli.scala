package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** `sbt "runMain graft.StreamEvents <sfDir> [hourly|sessions|running|dedup|quality|interval|ingest|forget]"`
  * — run the Structured Streaming operators over the events table as a
  * bounded file stream (micro-batch to completion), print the resulting
  * table. `running` exercises the custom flatMapGroupsWithState state;
  * `dedup` streams the DOCUMENTS table through the per-document LSH
  * keep/drop verdict (ingest order = doc_id order, one doc per second of
  * synthetic event time); `quality` streams documents through the frozen
  * quality-model gate (stateless scoring — the other half of the ingest
  * pipeline); `ingest` (3rd arg = indexDir, default
  * target/graft_ivf_index from BuildVectorIndex) streams id-shifted
  * embeddings through the sign-LSH near-dup gate into the persisted IVF
  * index via foreachBatch + appendArtifacts — the full dedup-then-index
  * ingest path; prints per-cluster growth and the gate's pass count;
  * `serve` (3rd arg = indexDir) streams the first 8 embeddings as query
  * requests through the batch-of-queries ANN serving tier
  * (annIvfServeMany per micro-batch) and prints each query's top
  * answers — the online half of the index lifecycle; `drift` (3rd arg =
  * indexDir) streams embeddings through the cluster-occupancy drift
  * monitor against the index's frozen centroids and its own occupancy
  * as baseline — replaying the training corpus prints TVD ≈ 0, the
  * null result that proves the inlined-literal assignment reproduces
  * the persisted index's partition sizes exactly.
  */
object StreamEvents {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val mode = if (args.length > 1) args(1) else "hourly"
    val spark = Cli.session() // sets nanosAsLong for the nanos events table

    if (mode == "quality") {
      val docSchema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
      // Train (memoized) on the batch table, freeze, then score the stream
      // with the literal-inlined model — no state, no shuffle.
      val model = graft.operators.TextAnalysisOps
        .qualityModelArtifact(spark, dir).collect()(0)
      val docs = spark.readStream.schema(docSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val q = StreamingOps.qualityGate(docs, model)
        .writeStream.outputMode("append")
        .format("memory").queryName("quality_out").start()
      q.processAllAvailable()
      val t = spark.table("quality_out")
      println(s"[stream] quality scored=${t.count()} " +
        s"kept=${t.filter(col("pred_label") === 1L).count()} " +
        s"dropped=${t.filter(col("pred_label") === 0L).count()}")
      t.orderBy("doc_id").show(5, truncate = false)
      q.stop(); spark.stop(); return
    }

    if (mode == "dedup") {
      val docSchema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
      // Watermark sentinel: in append mode a window's verdicts emit only
      // once the watermark passes its END, and a bounded stream's final
      // watermark stops AT the max event time — so the last tumbling
      // window would otherwise never close and its documents would get no
      // verdict. One far-future doc (doc_id = −1, excluded from the
      // report) unioned in as a second file source pushes the watermark
      // past every real window.
      val sentDir = java.nio.file.Files.createTempDirectory("graft_dedup_sentinel").toString
      spark.range(1).selectExpr("CAST(-1 AS BIGINT) AS doc_id",
        "'watermark sentinel' AS text", "'en' AS lang",
        "'sentinel' AS source", "CAST(18 AS BIGINT) AS n_chars")
        .write.mode("overwrite").parquet(sentDir)
      val real = spark.readStream.schema(docSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val sentinel = spark.readStream.schema(docSchema).parquet(sentDir)
      val docs = real.union(sentinel)
        .withColumn("ts", timestamp_seconds(
          when(col("doc_id") < 0, lit(2000000000L))
            .otherwise(lit(1700000000L) + col("doc_id"))))
      val q = StreamingOps.lshDedupVerdicts(docs, "ts", "0 seconds")
        .writeStream.outputMode("append")
        .format("memory").queryName("dedup_out").start()
      q.processAllAvailable()
      val t = spark.table("dedup_out").filter(col("doc_id") >= 0)
      println(s"[stream] dedup verdicts=${t.count()} " +
        s"kept=${t.filter(col("keep")).count()} dropped=${t.filter(!col("keep")).count()}")
      t.orderBy("doc_id").show(10, truncate = false)
      q.stop(); spark.stop(); return
    }

    if (mode == "ingest") {
      val idx = if (args.length > 2) args(2) else "target/graft_ivf_index"
      import graft.operators.SimilarityOps
      val anchors = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id").between(1, SimilarityOps.LshAnchors))
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
        .sortBy(_._1).toSeq
      val vdir = SimilarityOps.vectorsPath(spark, idx)
      val before = spark.read.parquet(vdir).count()
      // Id-shifted embeddings standing in for new arrivals, one per
      // second of synthetic event time.
      val vecs = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
        .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
        .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
        .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("vec_id")))
      val q = StreamingOps.indexIngest(vecs, "ts", "0 seconds", anchors, idx)
        .start()
      q.processAllAvailable(); q.stop()
      val after = spark.read.parquet(vdir)
      val appended = after.filter(col("vec_id") >= 3000000L)
      val sizes = after.groupBy("cluster").count().orderBy("cluster").collect()
        .map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(",")
      println(s"[stream] ingest before=$before after=${after.count()} " +
        s"gate_passed=${appended.count()} sizes=$sizes")
      spark.stop(); return
    }

    if (mode == "forget") {
      // Streaming takedown twin (r18): the first 8 corpus vec_ids arrive
      // as a bounded stream of delete requests; each micro-batch runs the
      // deleteVectors mechanics and commits the forget ack marker.
      val idx = if (args.length > 2) args(2) else "target/graft_ivf_index"
      import graft.operators.SimilarityOps
      val vdir = SimilarityOps.vectorsPath(spark, idx)
      val before = spark.read.parquet(vdir).count()
      val reqDir = java.nio.file.Files.createTempDirectory("graft_forget_req").toString
      spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 8).select("vec_id")
        .write.mode("overwrite").parquet(reqDir)
      val reqs = spark.readStream.schema("vec_id BIGINT").parquet(reqDir)
      val q = StreamingOps.indexForget(reqs, idx).start()
      q.processAllAvailable(); q.stop()
      val after = spark.read.parquet(vdir)
      val gone = after.filter(col("vec_id") < 8).count()
      println(s"[stream] forget before=$before after=${after.count()} " +
        s"remaining_of_deleted=$gone " +
        s"acked_batch=${StreamingOps.readForgetMarker(spark, idx).getOrElse(-1L)}")
      spark.stop(); return
    }

    if (mode == "drift") {
      // Live occupancy drift against the persisted index's frozen
      // quantizer: baseline = the index's own per-cluster occupancy (the
      // release artifact), stream = id-shifted embeddings as the "what
      // arrived since" feed, one per second of synthetic event time, a
      // far-future sentinel closing the last hour window.
      val idx = if (args.length > 2) args(2) else "target/graft_ivf_index"
      val cent = graft.operators.SimilarityOps.artifactDf(spark, idx, "centroids")
      val occ = spark.read
        .parquet(graft.operators.SimilarityOps.vectorsPath(spark, idx))
        .groupBy("cluster").count()
      val tot = occ.agg(sum("count")).collect()(0).getLong(0).toDouble
      val baseline = occ.select(col("cluster"),
        (col("count").cast("double") / tot).as("base_share"))
      val outDir = java.nio.file.Files.createTempDirectory("graft_drift_out").toString
      val sentDir = java.nio.file.Files.createTempDirectory("graft_drift_sentinel").toString
      // The sentinel carries a zero vector (its far-future window never
      // closes, so it never reaches the output) purely to advance the
      // watermark past every real hour window.
      spark.range(1).selectExpr("CAST(-1 AS BIGINT) AS vec_id",
        "transform(sequence(1, 64), x -> CAST(0.0 AS FLOAT)) AS embedding",
        "CAST(0 AS INT) AS label")
        .write.mode("overwrite").parquet(sentDir)
      val real = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
        .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
      val sentinel = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT").parquet(sentDir)
      val vecs = real.union(sentinel)
        .withColumn("ts", timestamp_seconds(
          when(col("vec_id") < 0, lit(2000000000L))
            .otherwise(lit(1700000000L) + col("vec_id"))))
      val q = StreamingOps.clusterDriftMonitor(
        vecs, "ts", "0 seconds", cent, baseline, outDir).start()
      q.processAllAvailable(); q.stop()
      val res = spark.read.parquet(outDir)
      println(s"[stream] drift windows=${res.select("win_start").distinct().count()} " +
        s"rows=${res.count()}")
      res.orderBy("win_start", "cluster").show(24, truncate = false)
      spark.stop(); return
    }

    if (mode == "serve") {
      // serve [indexDir] [tier] [stateDir]: tier is any of the five
      // batched serving tiers or "auto" (route each request through the
      // learned weights in stateDir — the run.py choose-then-run arc).
      val idx = if (args.length > 2) args(2) else "target/graft_ivf_index"
      val tier = if (args.length > 3) args(3) else "float"
      val stateDir = if (args.length > 4) Some(args(4)) else None
      val resDir = java.nio.file.Files.createTempDirectory("graft_serve_out").toString
      val queries = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
        .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
        .filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val q = StreamingOps.annServe(queries, idx, resDir,
        tier = tier, stateDir = stateDir).start()
      q.processAllAvailable(); q.stop()
      val res = spark.read.parquet(resDir)
      println(s"[stream] serve tier=$tier " +
        s"queries=${res.select("query_id").distinct().count()} " +
        s"answers=${res.count()}")
      res.filter(col("rank") <= 3).orderBy("query_id", "rank").show(24, truncate = false)
      spark.stop(); return
    }

    // Schema must be declared for a streaming file source; peek at the
    // batch footer to match the file's ts encoding (raw nanos LONG vs
    // TIMESTAMP_NTZ micros — see EventsOps.events), then normalize the
    // stream the same way the batch reader does.
    val tsIsLong = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val schema = s"event_id BIGINT, ts ${if (tsIsLong) "BIGINT" else "TIMESTAMP_NTZ"}, " +
      "user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    // The streaming file source requires a directory; glob-filter down to
    // the events table.
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts",
        if (tsIsLong) timestamp_micros(expr("ts DIV 1000"))
        else col("ts").cast("timestamp"))

    import spark.implicits._
    val out = mode match {
      case "interval" => StreamingOps.intervalMatches(events, "1 hour")
      case "sessions" => StreamingOps.userSessions(events)
      case "running" => StreamingOps.runningUserTotals(
        events.select("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.EventRow]).toDF()
      case _ => StreamingOps.hourlyCounts(events)
    }
    val outputMode = mode match {
      case "running" => "update"
      case "interval" => "append" // stream-stream inner join emits matches eagerly
      case _ => "complete"
    }
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
