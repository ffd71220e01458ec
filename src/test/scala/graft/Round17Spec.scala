package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.SimilarityOps

/** Round-17 pins — filtered ANN serving (VERDICT r16 #1): the q208
  * census IS the dispatcher's behavior, each forced arm matches its
  * analytic derivation, and the pre arm's predicate actually reaches
  * the parquet scan.
  */
class Round17Spec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private lazy val idx: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r17_idx").toString
    SimilarityOps.writeIndex(spark, sf, dir)
    dir
  }

  /** The q208 panel as a request frame: each panel vector queries for
    * "top-k among label <= my own label". */
  private def panelQueries = spark.read.parquet(s"$sf/embeddings.parquet")
    .filter(col("vec_id") < SimilarityOps.NPanel)
    .select(col("vec_id").as("query_id"), col("embedding"),
      col("label").cast("long").as("flabel"))

  test("filtered serve (auto) ≡ the q208 census per panel query: same " +
    "strategy, same (rank, vec_id) answers — the census is the dispatch") {
    val census = SimilarityOps.filteredServePlan(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("vec_id"), r.getAs[String]("strategy"))).toMap
    val served = SimilarityOps
      .annIvfServeManyFiltered(spark, idx, panelQueries).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("vec_id"), r.getAs[String]("strategy"))).toMap
    assert(served.nonEmpty && served == census,
      s"filtered serve diverged from q208: ${served.size} vs ${census.size} rows")
  }

  test("forced pre ≡ exact filtered truth for EVERY panel query (the " +
    "pre arm is exact at any selectivity); forced post on the census's " +
    "post slice ≡ the census rows themselves") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    // Exact truth: per query, cosine top-k among label <= flabel.
    val truth = e.select(col("vec_id"), col("label").cast("long").as("vl"),
        col("embedding"))
      .join(broadcast(panelQueries.select(col("query_id"),
        col("embedding").as("qe"), col("flabel"))),
        col("vl") <= col("flabel"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.CosineSimilarity.cosineSim(
          col("embedding"), col("qe")).as("cos"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= SimilarityOps.TopK)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank").toLong) ->
        r.getAs[Long]("vec_id")).toMap
    val pre = SimilarityOps
      .annIvfServeManyFiltered(spark, idx, panelQueries, strategy = "pre")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("vec_id")).toMap
    assert(pre == truth, "forced pre diverged from the exact filtered truth")
    val censusPost = SimilarityOps.filteredServePlan(spark, sf).collect()
      .filter(_.getAs[String]("strategy") == "post")
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("vec_id")).toMap
    val postIds = censusPost.keys.map(_._1).toSet
    val post = SimilarityOps.annIvfServeManyFiltered(spark, idx,
        panelQueries.filter(col("query_id").isin(postIds.toSeq: _*)),
        strategy = "post")
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("vec_id")).toMap
    assert(postIds.nonEmpty && post == censusPost,
      "forced post diverged from the census's post arm")
  }

  test("pre arm pushes the label predicate into the parquet scan " +
    "(PushedFilters on the payload column) — the 100 TB reason the " +
    "payload lives ON the vector rows") {
    val plan = SimilarityOps
      .annIvfServeManyFiltered(spark, idx, panelQueries, strategy = "pre")
      .queryExecution.executedPlan.toString
    assert(plan.contains("IsNotNull(label)") &&
      plan.contains("LessThanOrEqual(label"),
      s"label predicate not pushed to the scan:\n$plan")
  }

  test("op = eq answers only the query's own label and routes pre " +
    "(sel ≈ 0.1 ≤ 1/overfetch); every returned id carries the label") {
    val served = SimilarityOps
      .annIvfServeManyFiltered(spark, idx, panelQueries, op = "eq")
    val rows = served.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[String]("strategy") == "pre"))
    val labelOf = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label").toLong).toMap
    val flabelOf = panelQueries.select("query_id", "flabel").collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("flabel")).toMap
    rows.foreach { r =>
      assert(labelOf(r.getAs[Long]("vec_id")) ==
        flabelOf(r.getAs[Long]("query_id")),
        s"eq answer crossed labels: $r")
    }
  }

  test("filtered serve REFUSES an unlabeled index (payload-less rows " +
    "can never match a predicate — failing loud beats empty answers)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r17_nolabel").toString
    val unlabeled = java.nio.file.Files
      .createTempDirectory("graft_r17_nolabel_src").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$unlabeled/embeddings.parquet")
    SimilarityOps.writeIndex(spark, unlabeled, dir)
    val err = intercept[IllegalArgumentException] {
      SimilarityOps.annIvfServeManyFiltered(spark, dir, panelQueries)
    }
    assert(err.getMessage.contains("label payload"))
  }

  test("label payload survives the maintenance lifecycle: ingest " +
    "(null-label delta), hot compaction, split, and retrain all keep " +
    "labeled rows labeled — and label_sizes tracks the live table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r17_life").toString
    SimilarityOps.writeIndex(spark, sf, dir)
    val before = SimilarityOps.vectorsDf(spark, dir)
      .filter(col("label").isNotNull).count()
    assert(before == 500L, s"fresh labeled rows: $before")
    // Streamed delta: payload-less rows land NULL.
    val extra = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 40)
      .select((col("vec_id") + 7000000L).as("vec_id"), col("embedding"))
    graft.streaming.StreamingOps.ingestBatch(extra, 3L, dir)
    assert(SimilarityOps.vectorsDf(spark, dir)
      .filter(col("label").isNotNull).count() == before)
    SimilarityOps.compactHotClusters(spark, dir, threshold = 0)
    assert(SimilarityOps.vectorsDf(spark, dir)
      .filter(col("label").isNotNull).count() == before,
      "hot compaction dropped labels")
    SimilarityOps.splitHotCells(spark, dir, ratio = 1.01, maxCells = 1)
    assert(SimilarityOps.vectorsDf(spark, dir)
      .filter(col("label").isNotNull).count() == before,
      "split dropped labels")
    SimilarityOps.retrainIndex(spark, dir)
    assert(SimilarityOps.vectorsDf(spark, dir)
      .filter(col("label").isNotNull).count() == before,
      "retrain dropped labels")
    // The estimator artifact follows the live table through the verbs.
    val lsz = SimilarityOps.indexLabelSizes(spark, dir)
    assert(lsz.values.sum == before, s"label_sizes drifted: $lsz")
  }
}
