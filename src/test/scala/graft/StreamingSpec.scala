package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

case class DocIngest(doc_id: Long, ts: Timestamp, text: String)

case class VecIngest(vec_id: Long, ts: Timestamp, embedding: Array[Float])

/** The streaming operators must reproduce their batch twins when fed the
  * bounded sf0.001 events table through a memory stream.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def loadEvents(): Seq[Ev] = {
    graft.operators.EventsOps.events(spark, "/root/testdata/sf0.001")
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
      .agg(count(lit(1)).as("n"),
        graft.operators.r6(graft.operators.dsum(col("value"))).as("sum_value"))

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("flatMapGroupsWithState: running totals survive micro-batch boundaries") {
    import graft.streaming.{EventRow, StreamingOps}
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents().map(e =>
      EventRow(e.event_id, e.ts, e.user_id, e.event_type, e.value))
    val (first, second) = events.splitAt(events.size / 2)

    val stream = MemoryStream[EventRow]
    val q = StreamingOps.runningUserTotals(stream.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("running_out").start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
    } finally q.stop()

    // Update-mode sink: last emission per user is the final state.
    val got = spark.table("running_out")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("n_events").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "n_events", "total_value", "n_errors")

    val expected = events.toDF()
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))

    val joined = got.as("g").join(expected.as("e"), "user_id")
    assert(joined.count() == expected.count())
    assert(joined.filter(col("g.n_events") =!= col("e.n_events") ||
      col("g.n_errors") =!= col("e.n_errors") ||
      abs(col("g.total_value") - col("e.total_value")) > 1e-6).isEmpty)
  }

  test("streaming transition edges reproduce the batch transition matrix") {
    import graft.streaming.{EventRow, StreamingOps}
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents().map(e =>
      EventRow(e.event_id, e.ts, e.user_id, e.event_type, e.value))
    // split mid-stream so edges span the micro-batch boundary
    val (first, second) = events.splitAt(events.size / 2)

    val stream = MemoryStream[EventRow]
    val q = StreamingOps.transitionEdges(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("edges_out").start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("edges_out")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))

    val batch = graft.operators.EventsOps
      .eventTransitions(spark, "/root/testdata/sf0.001")
      .select("from_type", "to_type", "n")

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup keeps exactly one document per content fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, text: String)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (first, second) = docs.splitAt(docs.size / 2)

    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.dedupedDocuments(
        stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable() // dups across batches drop
    } finally q.stop()

    val streamed = spark.table("dedup_out")
    val batchFps = docs.toDF("doc_id", "text")
      .select(graft.operators.DedupOps.fingerprint(col("text")).as("fp"))
      .distinct()
    // one survivor per distinct fingerprint, no fingerprint twice
    assert(streamed.count() == batchFps.count())
    assert(streamed.select("fp").distinct().count() == streamed.count())
    assert(streamed.select("fp").exceptAll(batchFps).isEmpty)
  }

  test("streaming LSH band gate: bands match batch; every q42 pair is flagged") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.operators.DedupOps

    // Map-side band computation must be bit-identical to the batch tier.
    val docsDf = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val rowLocal = docsDf.select(col("doc_id"),
      posexplode(StreamingOps.bandHashes(col("text"))).as(Seq("band_id", "band_hash")))
      .select(col("doc_id"), col("band_id").cast("long").as("band_id"), col("band_hash"))
    val batchBands = DedupOps.minhashBands(spark, dir)
    assert(rowLocal.exceptAll(batchBands).isEmpty &&
      batchBands.exceptAll(rowLocal).isEmpty)

    // Feed the corpus in doc_id order across two micro-batches.
    val docs = docsDf.orderBy("doc_id").collect().zipWithIndex.map { case (r, i) =>
      DocIngest(r.getLong(0), new Timestamp(1700000000000L + i * 1000L), r.getString(1))
    }.toSeq
    val (first, second) = docs.splitAt(docs.size / 2)
    val stream = MemoryStream[DocIngest]
    val q = StreamingOps.lshBandGate(stream.toDF(), "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("lsh_gate_out").start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
    } finally q.stop()

    val surviving = spark.table("lsh_gate_out")
    // The gate's invariant: each (band_id, band_hash) is claimed once.
    assert(surviving.groupBy("band_id", "band_hash").count()
      .filter(col("count") > 1).isEmpty)

    // Every batch LSH candidate pair shares >= 1 band, so at most one of
    // the two docs can own all its bands: the other is flagged.
    val owned = surviving.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = DedupOps.NumHashes / DedupOps.BandSize.toLong
    val pairs = DedupOps.minhashDupPairs(spark, dir)
      .select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(owned.getOrElse(a, 0L) < full || owned.getOrElse(b, 0L) < full,
        s"pair ($a, $b) not flagged by the streaming gate")
    }
  }

  test("per-doc dedup verdict: dropped ⊆ batch candidate pairs; no singleton dropped") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.operators.DedupOps

    val docsDf = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = docsDf.orderBy("doc_id").collect().zipWithIndex.map { case (r, i) =>
      DocIngest(r.getLong(0), new Timestamp(1700000000000L + i * 1000L), r.getString(1))
    }.toSeq
    val (first, second) = docs.splitAt(docs.size / 2)
    // Sentinel far past every doc + watermark horizon: advances the
    // watermark so every real document's window closes and its verdict
    // emits in append mode. Its own verdict stays pending — excluded below.
    val sentinel = DocIngest(-1L,
      new Timestamp(1700000000000L + 30L * 24 * 3600 * 1000), "sentinel advance")

    val stream = MemoryStream[DocIngest]
    val q = StreamingOps.lshDedupVerdicts(stream.toDF(), "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("verdict_out").start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
      stream.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()

    val verdicts = spark.table("verdict_out").filter(col("doc_id") >= 0)
    // Exactly one verdict per document — full dups (all bands lost) and
    // shingle-less docs included, anchored by the presence row.
    assert(verdicts.count() == docs.size)
    assert(verdicts.select("doc_id").distinct().count() == docs.size)
    val banded = DedupOps.minhashBands(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

    val dropped = verdicts.filter(!col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val pairDocs = DedupOps.minhashDupPairs(spark, dir)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    // Every dropped doc is a member of some batch q42 candidate pair.
    assert(dropped.nonEmpty && dropped.subsetOf(pairDocs),
      s"dropped outside batch pairs: ${dropped -- pairDocs}")
    // No singleton (doc in no candidate pair) is ever dropped.
    val singletons = banded -- pairDocs
    assert((singletons & dropped).isEmpty)
    // And at least one member of every pair was dropped-or-flagged: a pair
    // sharing a band cannot both own all their bands.
    DedupOps.minhashDupPairs(spark, dir).select("doc_a", "doc_b").collect()
      .foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(dropped.contains(a) || dropped.contains(b),
          s"pair ($a, $b): neither dropped")
      }
  }

  test("streaming quality gate scores equal the batch frozen-model serve path") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps

    val model = TextAnalysisOps.qualityModelArtifact(spark, dir)
    val modelRow = model.collect()(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (first, second) = docs.splitAt(docs.size / 2)

    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps.qualityGate(
        stream.toDF().toDF("doc_id", "text"), modelRow)
      .writeStream.outputMode("append")
      .format("memory").queryName("quality_gate_out").start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("quality_gate_out")
    val batch = TextAnalysisOps.scoreWithQualityModel(spark, dir, model)
    assert(streamed.count() == docs.size.toLong)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream-scored documents diverged from the batch frozen-model scores")
  }

  test("streaming Gopher gate flags equal the batch ablation's per-doc flags") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (first, second) = docs.splitAt(docs.size / 2)

    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps.gopherGate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_gate_out").start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("gopher_gate_out")
    val flagCols = Seq("f_word_count", "f_mean_word_len", "f_symbol_ratio",
      "f_bullet_lines", "f_ellipsis_lines", "f_alpha_words", "f_stopwords")
    val batch = TextAnalysisOps.gopherFlagsOf(
        spark.read.parquet(s"$dir/documents.parquet"))
      .withColumn("kept", !flagCols.map(col).reduce(_ || _))
    assert(streamed.count() == docs.size.toLong)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream-gated flags diverged from the batch q127 derivation")
    // The gate actually gates: both verdicts occur on this corpus.
    val kept = spark.table("gopher_gate_out").filter(col("kept")).count()
    assert(kept > 0 && kept < docs.size, s"degenerate gate: kept=$kept")
  }

  test("streaming embedding gate: buckets match batch; one survivor per bucket") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.operators.SimilarityOps

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val anchors = e.filter(col("vec_id").between(1, SimilarityOps.LshAnchors))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq

    // The row-local literal-anchor bucket must equal the batch bucket table.
    val rowLocal = e.select(col("vec_id"),
      StreamingOps.lshBucket(col("embedding"), anchors).as("bucket"))
    val batch = SimilarityOps.lshBuckets(spark, dir)
    assert(rowLocal.exceptAll(batch).isEmpty && batch.exceptAll(rowLocal).isEmpty)

    // Stream the vectors; exactly one survivor per occupied bucket.
    val vecs = e.orderBy("vec_id").collect().map(r =>
      (r.getLong(0), new Timestamp(1700000000000L + r.getLong(0) * 1000L),
        r.getSeq[Float](1))).toSeq
    val (first, second) = vecs.splitAt(vecs.size / 2)
    val stream = MemoryStream[(Long, Timestamp, scala.collection.Seq[Float])]
    val q = StreamingOps.embeddingGate(
        stream.toDF().toDF("vec_id", "ts", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>")),
        "ts", "1 hour", anchors)
      .writeStream.outputMode("append")
      .format("memory").queryName("emb_gate_out").start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
    } finally q.stop()

    val survivors = spark.table("emb_gate_out")
    val batchBuckets = batch.select("bucket").distinct()
    assert(survivors.count() == batchBuckets.count(),
      "survivor count != occupied bucket count")
    assert(survivors.select("bucket").distinct().count() == survivors.count(),
      "a bucket passed two vectors")
    assert(survivors.select("bucket").exceptAll(batchBuckets).isEmpty,
      "survivor bucket not in the batch bucket set")
    // Each survivor sits in its batch-assigned bucket.
    assert(survivors.join(batch, Seq("vec_id"))
      .filter(survivors("bucket") =!= batch("bucket")).isEmpty)
  }

  test("streaming mixture monitor: window shares normalize and tie to a batch recount") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps

    // Frozen baseline: the corpus's own per-source token shares.
    val mw = TextAnalysisOps.mixtureWeights(spark, dir)
      .select("source", "n_tokens").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens"))
    val totTok = mw.map(_._2).sum.toDouble
    val baseline = spark.createDataFrame(
      spark.sparkContext.parallelize(mw.toSeq.map { case (s, n) =>
        org.apache.spark.sql.Row(s, n / totTok) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("base_share",
          org.apache.spark.sql.types.DoubleType))))

    // First 250 docs land in hour 1, the rest in hour 2; a far-future
    // sentinel closes both windows under a 0-second watermark.
    val docRows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source").collect()
    val base = 1700000000L - (1700000000L % 3600)
    val feed = docRows.map { r =>
      val id = r.getAs[Long]("doc_id")
      (id, new Timestamp((base + (if (id < 250) 0L else 3600L) + id % 60) * 1000L),
        r.getAs[String]("text"), r.getAs[String]("source"))
    }.toSeq
    val outDir = java.nio.file.Files.createTempDirectory("graft_mixmon").toString
    val stream = MemoryStream[(Long, Timestamp, String, String)]
    val q = StreamingOps.mixtureMonitor(
        stream.toDF().toDF("doc_id", "ts", "text", "source"),
        "ts", "0 seconds", baseline, outDir)
      .start()
    try {
      stream.addData(feed)
      q.processAllAvailable()
      stream.addData(Seq((-1L, new Timestamp((base + 36000L) * 1000L), "sentinel", "sentinel")))
      q.processAllAvailable()
    } finally q.stop()

    val res = spark.read.parquet(outDir).collect()
    val wins = res.groupBy(_.getAs[Timestamp]("win_start"))
    assert(wins.size == 2, s"expected 2 closed windows, got ${wins.size}")
    wins.foreach { case (_, rows) =>
      val shareSum = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-9, s"window shares sum to $shareSum")
    }
    // Hour-1 token counts tie to a batch recount over the same slice.
    val batchH1 = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 250)
      .select(col("source"),
        size(graft.textops.TextOps.tokenize(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("n_tokens")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens")).toMap
    val h1 = wins.minBy(_._1.getTime)._2
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens")).toMap
    assert(h1 == batchH1, "streamed hour-1 token counts diverge from the batch recount")
    // share_delta is share minus the frozen baseline share, exactly.
    val baseMap = mw.map { case (s, n) => s -> n / totTok }.toMap
    wins.values.flatten.foreach { r =>
      val expect = r.getAs[Double]("share") - baseMap(r.getAs[String]("source"))
      assert(math.abs(r.getAs[Double]("share_delta") - expect) < 1e-12)
    }
  }

  test("streaming ANN serve: per-query answers equal the single-query serving tier") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.operators.SimilarityOps

    // Persisted index (same artifact set the ingest test builds).
    val out = java.nio.file.Files.createTempDirectory("graft_serve_idx").toString
    SimilarityOps.writeIndex(spark, dir, out)

    val qids = Seq(5L, 17L, 42L)
    val embOf = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id").isin(qids: _*)).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")).toMap

    val resDir = java.nio.file.Files.createTempDirectory("graft_serve_out").toString
    val stream = MemoryStream[(Long, scala.collection.Seq[Float])]
    val q = StreamingOps.annServe(
        stream.toDF().toDF("query_id", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>")),
        out, resDir)
      .start()
    try {
      // Two micro-batches, so append-mode accumulation is exercised too.
      stream.addData(qids.take(2).map(id => (id, embOf(id))))
      q.processAllAvailable()
      stream.addData(qids.drop(2).map(id => (id, embOf(id))))
      q.processAllAvailable()
    } finally q.stop()

    val served = spark.read.parquet(resDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(served.keySet == qids.toSet)
    // One answer schema for every tier (ADVICE r13): the fixed float
    // tier's native cos arrives as `score`, tagged with its tier.
    assert(served.values.flatten.map(_.getAs[String]("tier")).toSet == Set("float"))
    qids.foreach { id =>
      val got = served(id)
        .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
        .sortBy(_._1)
      val want = SimilarityOps.annIvfServe(spark, out, embOf(id).toArray).collect()
        .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
        .sortBy(_._1)
      assert(got.toSeq == want.toSeq, s"query $id: streamed answers diverge from annIvfServe")
      assert(got.head._2 == id, s"query $id: rank 1 is not the query vector itself")
    }
  }

  test("streaming index ingest: gated append lands in owning partitions, dups never indexed") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    import graft.operators.SimilarityOps

    // Fresh persisted index (the BuildVectorIndex artifact set).
    val out = java.nio.file.Files.createTempDirectory("graft_ingest_idx").toString
    val (_, kasgF) = SimilarityOps.kmeansModel(spark, dir)
    SimilarityOps.writeIndex(spark, dir, out)
    val before = spark.read.parquet(s"$out/vectors").count()

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val anchors = e.filter(col("vec_id").between(1, SimilarityOps.LshAnchors))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq

    // Three source vectors in pairwise-DISTINCT sign-LSH buckets (so they
    // don't gate each other), plus an exact duplicate of the first (same
    // embedding, new id) that MUST be gated.
    val buckets = SimilarityOps.lshBuckets(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val srcIds = buckets.toSeq.sortBy(_._1)
      .foldLeft(Vector.empty[Long]) { case (acc, (id, b)) =>
        if (acc.size < 3 && !acc.exists(a => buckets(a) == b)) acc :+ id else acc
      }
    assert(srcIds.size == 3, s"corpus has < 3 distinct occupied buckets")
    val embOf = e.filter(col("vec_id").isin(srcIds: _*)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val delta = srcIds.zipWithIndex.map { case (id, i) =>
      (2000000L + id, new Timestamp(1700000000000L + i * 1000L), embOf(id))
    } :+ ((2900000L, new Timestamp(1700000004000L), embOf(srcIds.head)))

    val stream = MemoryStream[(Long, Timestamp, scala.collection.Seq[Float])]
    val q = StreamingOps.indexIngest(
        stream.toDF().toDF("vec_id", "ts", "embedding")
          .withColumn("embedding", col("embedding").cast("array<float>")),
        "ts", "1 hour", anchors, out)
      .start()
    try { stream.addData(delta); q.processAllAvailable() } finally q.stop()

    // Exactly the three gate survivors were appended; the duplicate never
    // reached the index.
    val after = spark.read.parquet(s"$out/vectors")
    assert(after.count() == before + 3)
    assert(after.filter(col("vec_id") === 2900000L).isEmpty,
      "gated duplicate reached the index")

    // Each appended row landed in its source vector's owning cluster
    // partition (same embedding + same persisted centroids => same
    // assignment as training, file-level).
    val kasg = kasgF.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val appended = after.filter(col("vec_id") >= 2000000L)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        input_file_name().as("f"))
      .collect()
    assert(appended.length == 3)
    appended.foreach { r =>
      val srcCluster = kasg(r.getAs[Long]("vec_id") - 2000000L)
      assert(r.getAs[Long]("cluster") == srcCluster)
      assert(r.getAs[String]("f").contains(s"cluster=$srcCluster"),
        s"appended row not in its owning partition dir: ${r.getAs[String]("f")}")
    }

    // The grown index serves the appended vectors: querying with the
    // first source embedding returns its appended twin (cosine 1).
    val served = SimilarityOps.annIvfServe(spark, out, embOf(srcIds.head).toArray)
    assert(served.filter(col("vec_id") === (2000000L + srcIds.head)).count() == 1,
      "served top-k missing the appended twin of the query vector")
  }

  test("ingest is exactly-once: a replayed micro-batch does not double-append") {
    val dir = "/root/testdata/sf0.001"
    import graft.operators.SimilarityOps

    val out = java.nio.file.Files.createTempDirectory("graft_ingest_once").toString
    SimilarityOps.writeIndex(spark, dir, out)
    val base = spark.read.parquet(s"$out/vectors").count()

    val batch = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 40)
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))

    StreamingOps.ingestBatch(batch, 7L, out)
    val afterFirst = spark.read.parquet(s"$out/vectors").count()
    assert(afterFirst == base + 40)

    // The Structured Streaming replay contract: same batchId, same data.
    // A plain append sink would land 40 duplicates here.
    StreamingOps.ingestBatch(batch, 7L, out)
    val afterReplay = spark.read.parquet(s"$out/vectors").count()
    assert(afterReplay == afterFirst, s"replayed batch changed the index: " +
      s"$afterFirst -> $afterReplay")
    assert(spark.read.parquet(s"$out/vectors")
      .groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "replay produced duplicate vec_ids")

    // A NEW batch id is genuinely new data and must append.
    StreamingOps.ingestBatch(
      batch.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")), 8L, out)
    assert(spark.read.parquet(s"$out/vectors").count() == afterFirst + 40)

    // The dynamic overwrite touched ONLY batch 7's partitions: the base
    // tier is intact and the grown index still serves.
    assert(spark.read.parquet(s"$out/vectors")
      .filter(col("ingest_batch") === -1L).count() == base)
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === SimilarityOps.QueryVecId)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    assert(SimilarityOps.annIvfServe(spark, out, qv).count() > 0)
  }

  test("streaming decontam gate flags the planted verbatim quote, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    // The Round7OpsSpec planted corpus: doc 97 is the benchmark, doc 1
    // quotes 8 consecutive benchmark tokens, doc 2 scatters 3-token
    // phrases (no verbatim window), doc 3 is clean.
    val out = java.nio.file.Files.createTempDirectory("graft_sdecon").toString
    val alpha = (0 until 20).map(i => s"alpha$i")
    val quoted = ((0 until 30).map(i => s"uniq$i") ++ alpha.slice(5, 13) ++
      (0 until 20).map(i => s"tail$i")).mkString(" ")
    val scattered = (alpha.slice(0, 3) ++ (0 until 10).map(i => s"fillA$i") ++
      alpha.slice(7, 10) ++ (0 until 10).map(i => s"fillB$i") ++
      alpha.slice(14, 17) ++ (0 until 10).map(i => s"fillC$i")).mkString(" ")
    Seq((97L, alpha.mkString(" ")), (1L, quoted), (2L, scattered),
      (3L, (0 until 40).map(i => s"clean$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val bench = DedupOps.benchWindowKeys(spark, out)
    assert(bench.nonEmpty)

    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps.decontamGate(
        stream.toDF().toDF("doc_id", "text"), bench.toSeq)
      .select("doc_id", "n_hits", "contaminated")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdecon_out").start()
    try {
      stream.addData(Seq((1L, quoted), (2L, scattered),
        (3L, (0 until 40).map(i => s"clean$i").mkString(" "))))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdecon_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))).toMap
    assert(got(1L)._2 && got(1L)._1 == 1L, s"quote not flagged: $got")
    assert(!got(2L)._2 && !got(3L)._2, s"false positives: $got")

    // Batch tie: the gate's verdict matches q83 on the same corpus.
    val batch = DedupOps.verbatimDecontamination(spark, out).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(batch == got.filter(_._2._2).keySet)
  }

  test("streaming interval join emits exactly the in-horizon purchase-view pairs") {
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val stream = MemoryStream[Ev]
    stream.addData(events)

    val q = StreamingOps.intervalMatches(stream.toDF(), "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ij_out")
      .select("p_event_id", "v_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // Expected pair set at the stream's own (micros) precision — the
    // batch q59 truncates to whole seconds first, so its counts are the
    // wrong oracle exactly at |Δt| = interval boundaries.
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val w = graft.operators.EventsOps.IntervalS * 1000000L
    val ps = events.filter(_.event_type == "purchase")
    val vs = events.filter(_.event_type == "view")
    val expect = (for {
      p <- ps; v <- vs if math.abs(us(p.ts) - us(v.ts)) <= w
    } yield (p.event_id, v.event_id)).toSet
    assert(expect.nonEmpty, "test data has no in-horizon pairs")
    assert(got == expect,
      s"pair sets differ: got ${got.size}, expected ${expect.size}")
  }

  test("left-outer interval join: one null row per unmatched purchase, after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    // Far-future sentinel pair (one per side's filter) pushes the global
    // watermark past every real event so tail unmatched verdicts emit.
    val maxTs = events.map(_.ts.getTime).max
    val far = new java.sql.Timestamp(maxTs + 10L * 24 * 3600 * 1000)
    val sentinels = Seq(
      Ev(-1L, far, -1L, "purchase", 0.0), Ev(-2L, far, -1L, "view", 0.0))
    val stream = MemoryStream[Ev]
    stream.addData(events ++ sentinels)

    val q = StreamingOps.intervalMatches(stream.toDF(), "0 seconds", "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("loj_out").start()
    try {
      q.processAllAvailable()
      // second batch so the watermark advanced by batch 1's max lands
      stream.addData(Ev(-3L, new java.sql.Timestamp(far.getTime + 1000), -1L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("loj_out").filter(col("p_event_id") >= 0).collect()
    val matched = rows.filter(r => !r.isNullAt(r.fieldIndex("v_event_id")))
      .map(r => (r.getAs[Long]("p_event_id"), r.getAs[Long]("v_event_id")))
    val unmatched = rows.filter(r => r.isNullAt(r.fieldIndex("v_event_id")))
      .map(_.getAs[Long]("p_event_id"))

    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val w = graft.operators.EventsOps.IntervalS * 1000000L
    val ps = events.filter(_.event_type == "purchase")
    val vs = events.filter(_.event_type == "view")
    val expectPairs = (for {
      p <- ps; v <- vs if math.abs(us(p.ts) - us(v.ts)) <= w
    } yield (p.event_id, v.event_id)).toSet
    val expectUnmatched = ps.map(_.event_id).toSet -- expectPairs.map(_._1)

    assert(matched.toSet == expectPairs, "matched pair set differs")
    assert(unmatched.length == unmatched.distinct.length,
      "an unmatched purchase emitted more than one null row")
    assert(unmatched.toSet == expectUnmatched,
      s"unmatched set differs: got ${unmatched.length}, expected ${expectUnmatched.size}")
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

  test("cluster drift monitor: assignments, shares, and TVD recount vs the frozen quantizer") {
    import graft.operators.SimilarityOps
    val dir = "/root/testdata/sf0.001"
    val (cent, asg) = SimilarityOps.kmeansModel(spark, dir)
    val asgRows = asg.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster")))
    val baseline = asgRows.groupBy(_._2)
      .map { case (c, v) => (c, v.length.toDouble / asgRows.length) }
      .toSeq.toDF("cluster", "base_share")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val base = 1700000000L
    val feed = embs.take(60).zipWithIndex.map { case ((id, e), i) =>
      VecIngest(id, new Timestamp((base + (if (i < 40) 10L else 3620L)) * 1000L), e)
    }
    val outDir = java.nio.file.Files.createTempDirectory("graft_clusterdrift").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[VecIngest]
    val q = StreamingOps.clusterDriftMonitor(
        stream.toDF(), "ts", "0 seconds", cent, baseline, outDir)
      .start()
    try {
      stream.addData(feed)
      q.processAllAvailable()
      stream.addData(Seq(VecIngest(-1L,
        new Timestamp((base + 9000L) * 1000L), embs.head._2)))
      q.processAllAvailable()
    } finally q.stop()

    // Driver recount with the same double arithmetic the gate inlines.
    val centArr = cent.collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Int]("pos"), r.getAs[Double]("c")))
      .groupBy(_._1)
      .map { case (k, rs) => k -> rs.sortBy(_._2).map(_._3) }
      .toSeq.sortBy(_._1)
    def assign(e: Array[Float]): Long = centArr.map { case (cid, cv) =>
      var d = 0.0
      var i = 0
      while (i < cv.length) { val t = e(i).toDouble - cv(i); d += t * t; i += 1 }
      (d, cid)
    }.min._2
    val baseMap = asgRows.groupBy(_._2)
      .map { case (c, v) => c -> v.length.toDouble / asgRows.length }
    val res = spark.read.parquet(outDir).collect()
    val wins = res.groupBy(_.getAs[Timestamp]("win_start"))
    assert(wins.size == 2, s"expected 2 closed hour windows, got ${wins.size}")
    val byHour = feed.groupBy(f => f.ts.getTime / 3600000L)
    wins.foreach { case (ws, rows) =>
      val inWin = byHour(ws.getTime / 3600000L)
      val expOcc = inWin.map(f => assign(f.embedding)).groupBy(identity)
        .map { case (c, v) => c -> v.length.toLong }
      val gotOcc = rows.map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_vecs")).toMap
      assert(gotOcc == expOcc, s"window $ws: $gotOcc vs $expOcc")
      val n = inWin.length.toDouble
      val presentBase = expOcc.keys.toSeq.map(c => baseMap.getOrElse(c, 0.0)).sum
      val l1 = expOcc.map { case (c, k) =>
        math.abs(k / n - baseMap.getOrElse(c, 0.0)) }.sum
      val expTvd = (l1 + (1.0 - presentBase)) / 2
      rows.foreach { r =>
        val c = r.getAs[Long]("cluster")
        assert(math.abs(r.getAs[Double]("share") - expOcc(c) / n) < 1e-12)
        assert(math.abs(r.getAs[Double]("base_share") - baseMap.getOrElse(c, 0.0)) < 1e-12)
        assert(math.abs(r.getAs[Double]("tvd") - expTvd) < 1e-9,
          s"window $ws: got tvd ${r.getAs[Double]("tvd")} vs exp $expTvd " +
            s"(l1 $l1, presentBase $presentBase, n $n, occ $expOcc)")
      }
    }
  }
}
