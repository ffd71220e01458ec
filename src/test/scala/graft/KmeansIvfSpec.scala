package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Pins the round-6 learned-quantizer contract (VERDICT r5 #1): the IVF
  * tier trains its own coarse quantizer (fixed-iteration Lloyd k-means,
  * hash-seeded) instead of borrowing the testdata's `label` column.
  *
  *   - training is deterministic: two model builds agree exactly;
  *   - the assignment partitions the table into KmeansK non-empty clusters;
  *   - recall@50 vs brute force is AT LEAST the old label-IVF's at the
  *     same NProbe (measured: learned 0.38 vs label 0.24 at sf0.001);
  *   - an index written partitionBy(cluster) serves the probe via
  *     file-level partition pruning (the 100 TB read path).
  */
class KmeansIvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The pre-round-6 label-IVF, reproduced inline as the recall baseline:
    * per-label mean centroids, probe NProbe nearest by cosine, exact
    * cosine top-k within the probed labels. */
  private def labelIvfTopK(): Seq[Long] = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val centroids = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
    val q = e.filter(col("vec_id") === SimilarityOps.QueryVecId)
      .select(col("embedding").as("q_embedding"))
    val probed = centroids.crossJoin(broadcast(q))
      .select(col("label"),
        SimilarityOps.cosineHof(col("centroid"), col("q_embedding")).as("ccos"))
      .orderBy(col("ccos").desc, col("label").asc)
      .limit(SimilarityOps.NProbe)
      .select("label")
    e.join(broadcast(probed), "label").crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.functions.CosineSimilarity.cosineSim(
          col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(SimilarityOps.TopK)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
  }

  test("k-means training is deterministic and partitions the corpus") {
    val (cent, asg) = SimilarityOps.kmeansModel(spark, dir)
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()

    // Every vector assigned exactly once; all K clusters non-empty.
    val sizes = asg.groupBy("cluster").count().collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("count")).toMap
    assert(sizes.values.sum == total)
    assert(sizes.keySet == (0L until SimilarityOps.KmeansK.toLong).toSet)

    // Deterministic: a from-scratch recompute of the final assignment
    // (bypassing the memo's cached frames) agrees row-for-row.
    val asg2 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v0")))
      .select(col("vec_id"), col("pos"), col("v0").cast("double").as("v"))
      .join(broadcast(cent), "pos")
      .groupBy("vec_id", "cluster")
      .agg(sum(((col("v") - col("c")) * (col("v") - col("c")))
        .cast("decimal(38,18)")).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cluster"))).as("best"))
      .select(col("vec_id"), col("best.cluster").as("cluster"))
    assert(asg.exceptAll(asg2).isEmpty && asg2.exceptAll(asg).isEmpty)
  }

  test("learned-IVF recall@50 vs brute force >= label-IVF recall@50") {
    val bf = SimilarityOps.annBruteForce(spark, dir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val learned = SimilarityOps.annIvf(spark, dir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val label = labelIvfTopK().toSet
    val learnedRecall = (learned & bf).size.toDouble / bf.size
    val labelRecall = (label & bf).size.toDouble / bf.size
    assert(learnedRecall >= labelRecall,
      s"learned $learnedRecall < label $labelRecall")
    // Absolute floor pinning the measured margin (0.38 vs 0.24): a
    // regression to near-label quality fails even if both drift.
    assert(learnedRecall >= 0.30, s"learned recall $learnedRecall < 0.30")
  }

  test("declared operating point: recall@50 >= 0.8 at nprobe = NProbeServe") {
    // The q79 curve at the serving probe depth (VERDICT r6 #2): probing
    // NProbeServe of the KmeansK learned clusters retains >= 80% of the
    // exact top-50 (measured 0.94 at sf0.001; RecallSweep showed the
    // curve is flat in KmeansIters, so depth 2 is the plateau).
    val curve = SimilarityOps.ivfRecallCurve(spark, dir).collect()
      .map(r => r.getAs[Long]("nprobe") -> r.getAs[Double]("recall")).toMap
    assert(curve.keySet == SimilarityOps.NProbeSweep.map(_.toLong).toSet)
    val atServe = curve(SimilarityOps.NProbeServe.toLong)
    assert(atServe >= 0.8, s"recall@50 at nprobe=${SimilarityOps.NProbeServe}: $atServe < 0.8")
  }

  test("index written partitionBy(cluster) serves the probe via partition pruning") {
    val (_, asg) = SimilarityOps.kmeansModel(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    spark.read.parquet(s"$dir/embeddings.parquet")
      .join(asg, "vec_id")
      .write.mode("overwrite").partitionBy("cluster").parquet(out)

    val probed = Seq(0L, 3L)
    val scan = spark.read.parquet(out).filter(col("cluster").isin(probed: _*))
    val plan = scan.queryExecution.executedPlan.toString
    // The filter must sit INSIDE the PartitionFilters bracket: the whole
    // FileScan renders on one line whose output-attribute list already
    // contains `cluster`, so a per-line contains() check would pass even
    // with PartitionFilters: [] (ADVICE r6).
    assert("""PartitionFilters: \[[^\]]*cluster""".r.findFirstIn(plan).isDefined,
      s"no cluster predicate inside PartitionFilters:\n$plan")

    val expected = asg.filter(col("cluster").isin(probed: _*)).count()
    assert(scan.count() == expected && expected > 0)
  }
}
