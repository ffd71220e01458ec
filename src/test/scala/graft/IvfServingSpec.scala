package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Pins the round-7 serving contract (VERDICT r6 next-round #1): the ANN
  * tier can answer queries from the PERSISTED BuildVectorIndex output
  * alone —
  *
  *   - float and int8 serving results equal the in-session q51/q77 frames
  *     row-for-row;
  *   - the probe scan carries a cluster predicate INSIDE PartitionFilters
  *     (file-level partition pruning on the persisted files);
  *   - at query time no file outside the index directory is read — so no
  *     k-means training, no corpus amax pass, no embeddings.parquet scan
  *     can be hiding anywhere in the served plans (reconstruction inputs
  *     `codes`/`scale` are index columns, materialized at build).
  */
class IvfServingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val indexDir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_serve").toString
    SimilarityOps.writeIndex(spark, dir, out)
    out
  }

  private lazy val queryVec: Array[Float] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === SimilarityOps.QueryVecId)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

  test("served float tier at nprobe=NProbe equals the in-session q51 frame") {
    val served = SimilarityOps.annIvfServe(spark, indexDir, queryVec,
      nprobe = SimilarityOps.NProbe)
    val inSession = SimilarityOps.annIvf(spark, dir)
    assert(served.count() > 0)
    assert(served.exceptAll(inSession).isEmpty && inSession.exceptAll(served).isEmpty)
  }

  test("served int8 tier at nprobe=NProbe equals the in-session q77 frame") {
    val served = SimilarityOps.annIvfInt8Serve(spark, indexDir, queryVec,
      nprobe = SimilarityOps.NProbe)
    val inSession = SimilarityOps.annIvfInt8(spark, dir)
    assert(served.count() > 0)
    assert(served.exceptAll(inSession).isEmpty && inSession.exceptAll(served).isEmpty)
  }

  test("served PQ tier at nprobe=NProbe equals the in-session q104 frame") {
    val served = SimilarityOps.annPqServe(spark, indexDir, queryVec,
      nprobe = SimilarityOps.NProbe)
    val inSession = SimilarityOps.annIvfPq(spark, dir)
    assert(served.count() > 0)
    assert(served.exceptAll(inSession).isEmpty && inSession.exceptAll(served).isEmpty)
  }

  test("served re-rank tier at nprobe=NProbe equals the in-session q111 frame") {
    val served = SimilarityOps.annPqRerankServe(spark, indexDir, queryVec,
      nprobe = SimilarityOps.NProbe)
    val inSession = SimilarityOps.annIvfPqRerank(spark, dir)
    assert(served.count() > 0)
    assert(served.exceptAll(inSession).isEmpty && inSession.exceptAll(served).isEmpty)
  }

  test("serving default is the declared operating point (nprobe = NProbeServe)") {
    // The default-probe serve answers at the recall >= 0.8 point — a
    // superset probe of the NProbe tier whose top-k can only improve:
    // every vector the NProbe serve scored is also scored here.
    val atDefault = SimilarityOps.annIvfServe(spark, indexDir, queryVec)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = SimilarityOps.annBruteForce(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (atDefault & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"served default recall $recall < 0.8")
  }

  test("served scans are partition-pruned and read only index files") {
    for (served <- Seq(
        SimilarityOps.annIvfServe(spark, indexDir, queryVec),
        SimilarityOps.annIvfInt8Serve(spark, indexDir, queryVec),
        SimilarityOps.annPqServe(spark, indexDir, queryVec),
        SimilarityOps.annPqRerankServe(spark, indexDir, queryVec),
        SimilarityOps.annBinaryServe(spark, indexDir, queryVec))) {
      // Cluster predicate INSIDE the PartitionFilters bracket (a whole
      // FileScan renders on one line whose attribute list also says
      // `cluster`, so a plain substring test could pass with
      // PartitionFilters: []).
      val plan = served.queryExecution.executedPlan.toString
      assert("""PartitionFilters: \[[^\]]*cluster""".r.findFirstIn(plan).isDefined,
        s"no cluster predicate inside PartitionFilters:\n$plan")

      // Zero training/amax/corpus work at query time: every relation the
      // served plan reads is a file inside the index directory — no
      // embeddings.parquet, so no k-means or corpus-amax input exists
      // anywhere in the plan.
      val files = served.inputFiles
      assert(files.nonEmpty)
      files.foreach(f => assert(f.contains(indexDir),
        s"served plan reads outside the index: $f"))
    }
  }

  test("served binary tier: driver recount of the Hamming shortlist + float re-rank") {
    val served = SimilarityOps.annBinaryServe(spark, indexDir, queryVec).collect()

    // Independent recount from the persisted artifacts alone: re-derive
    // the query's sign code from bq_mu, the Hamming shortlist from the
    // persisted bq_lo/bq_hi, and the exact-cosine re-rank with the same
    // sequential double fold CosineSimilarity generates — bit-identical
    // arithmetic, so vec_id ORDER must match, not just the set.
    val mu = spark.read.parquet(s"$indexDir/bq_mu").collect()
      .map(r => r.getAs[Number]("pos").intValue() ->
        r.getAs[Number]("m").doubleValue()).toMap
    var qlo = 0L; var qhi = 0L
    queryVec.indices.foreach { p =>
      if (queryVec(p).toDouble > mu(p)) {
        if (p < 32) qlo |= 1L << p else qhi |= 1L << (p % 32)
      }
    }
    val probed = SimilarityOps
      .servedProbe(spark, indexDir, queryVec, SimilarityOps.NProbeServe).toSet
    val rows = spark.read.parquet(s"$indexDir/vectors")
      .select("vec_id", "embedding", "bq_lo", "bq_hi", "cluster").collect()
      .filter(r => probed.contains(r.getAs[Number]("cluster").longValue()))
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Long]("bq_lo"), r.getAs[Long]("bq_hi")))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val expect = rows
      .map { case (id, e, lo, hi) =>
        (id, java.lang.Long.bitCount(lo ^ qlo) + java.lang.Long.bitCount(hi ^ qhi), e) }
      .sortBy { case (id, ham, _) => (ham, id) }
      .take(SimilarityOps.RerankK)
      .map { case (id, _, e) => (id, cos(e, queryVec)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(SimilarityOps.TopK)
    assert(served.length == expect.length && served.nonEmpty)
    served.zip(expect).zipWithIndex.foreach { case ((row, (eid, ecos)), i) =>
      assert(row.getAs[Long]("vec_id") == eid,
        s"rank ${i + 1}: served ${row.getAs[Long]("vec_id")} vs recount $eid")
      assert(row.getAs[Long]("rank") == i + 1)
      assert(row.getAs[Double]("cos") == math.floor(ecos * 1e6 + 0.5) / 1e6)
    }
    // A query that IS an indexed vector gets its indexed code bit for
    // bit, so its own id must re-rank to #1 at cosine 1.0.
    assert(served.head.getAs[Long]("vec_id") == SimilarityOps.QueryVecId)
    assert(served.head.getAs[Double]("cos") == 1.0)
  }

  test("incremental append: delta vectors land in their centroid's partition, no retrain") {
    // Fresh index copy so the shared indexDir stays pristine for the
    // equality tests.
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    SimilarityOps.writeIndex(spark, dir, out)
    val before = spark.read.parquet(s"$out/vectors").count()

    // The same embeddings, id-shifted, standing in for new arrivals.
    val delta = spark.read.parquet(s"$dir/embeddings.parquet")
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    SimilarityOps.appendArtifacts(spark, out, delta)
      .withColumn("ingest_batch", lit(-1L))
      .write.mode("append").partitionBy("cluster", "ingest_batch").parquet(s"$out/vectors")

    val after = spark.read.parquet(s"$out/vectors")
    assert(after.count() == before * 2)

    // Same content, same centroids => every appended twin must land in
    // its original's cluster (assignment against persisted centroids is
    // the training assignment, bit for bit).
    val orig = after.filter(col("vec_id") < 1000000L)
      .select(col("vec_id"), col("cluster"))
    val appended = after.filter(col("vec_id") >= 1000000L)
      .select((col("vec_id") - 1000000L).as("vec_id"), col("cluster"))
    assert(orig.exceptAll(appended).isEmpty && appended.exceptAll(orig).isEmpty)

    // The grown index still serves with file-level pruning and includes
    // the appended rows in results (the id-shifted twin of the query's
    // nearest neighbors scores identically).
    val served = SimilarityOps.annIvfServe(spark, out, queryVec)
    assert(served.count() > 0)
    val plan = served.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cluster""".r.findFirstIn(plan).isDefined)
    assert(served.filter(col("vec_id") >= 1000000L).count() > 0)
  }

  test("compaction: fewer files, identical rows, identical served answers") {
    // Fresh index, then three appends to fragment the partitions.
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_compact").toString
    SimilarityOps.writeIndex(spark, dir, out)
    (1 to 3).foreach { i =>
      val delta = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 50)
        .select((col("vec_id") + i * 1000000L).as("vec_id"), col("embedding"))
      SimilarityOps.appendArtifacts(spark, out, delta)
        .withColumn("ingest_batch", lit(-1L))
        .write.mode("append").partitionBy("cluster", "ingest_batch").parquet(s"$out/vectors")
    }
    val rowsBefore = spark.read.parquet(s"$out/vectors")
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val servedBefore = SimilarityOps.annIvfServe(spark, out, queryVec)
      .collect().map(_.toString).toSeq

    val (fb, fa) = SimilarityOps.compactVectors(spark, out)
    assert(fa < fb, s"compaction did not reduce file count ($fb -> $fa)")
    // Full-table compaction flips the MANIFEST to a new generation dir;
    // read the ACTIVE table through the same resolution serving uses.
    val active = SimilarityOps.vectorsPath(spark, out)
    assert(active.endsWith("vectors_g1"), s"expected generation flip, got $active")
    val clusters = spark.read.parquet(active)
      .select("cluster").distinct().count()
    assert(fa == clusters, s"expected one file per cluster partition, got $fa for $clusters")

    val rowsAfter = spark.read.parquet(active)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(rowsAfter == rowsBefore, "compaction must not change a single row")
    val servedAfter = SimilarityOps.annIvfServe(spark, out, queryVec)
      .collect().map(_.toString).toSeq
    assert(servedAfter == servedBefore, "served answers drifted across compaction")
  }

  test("the probe is file-level: served rows come from NProbe cluster dirs only") {
    val probed = SimilarityOps.servedProbe(spark, indexDir, queryVec)
    assert(probed.size == SimilarityOps.NProbe &&
      probed.size < SimilarityOps.KmeansK)

    // The pruned read returns exactly the probed partitions' rows, and
    // every surviving row physically came from a probed cluster=N
    // directory (input_file_name over the pruned scan).
    val scan = spark.read.parquet(s"$indexDir/vectors")
      .filter(col("cluster").isin(probed: _*))
    val perFile = scan.select(input_file_name().as("f")).distinct().collect()
      .map(_.getString(0))
    assert(perFile.nonEmpty)
    perFile.foreach { f =>
      assert(probed.exists(c => f.contains(s"cluster=$c")),
        s"row read from unprobed partition file: $f")
    }
    val bySizes = spark.read.parquet(s"$indexDir/vectors")
      .groupBy("cluster").count().collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("count")).toMap
    assert(scan.count() == probed.map(bySizes).sum)
  }
}
