package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.retrieve.Retrievers
import graft.answer.Answer
import graft.telemetry.InMemoryTelemetryStore

/** Behavioral parity against the reference on its bundled 200-doc corpus and
  * 14 golden labels. Expected values are the measured reference numbers in
  * BASELINE.md / FIXTURES.md §A5.
  */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Pipeline.loadCorpusJsonl(spark, TestSpark.resource("corpus.jsonl"))
  private lazy val labels = Pipeline.loadLabelsJsonl(spark, TestSpark.resource("labels.jsonl"))
  private lazy val idx = Pipeline.buildIndexes(docs)

  test("corpus loads 200 docs with line-order doc_idx") {
    assert(docs.count() == 200)
    val first = docs.orderBy("doc_idx").select("doc_id").limit(1).collect()(0).getString(0)
    assert(first == "DOC-000")
  }

  test("corpus stats golden values: vocab=560, rare=407, avg_dl≈22.9, grams=3135") {
    assert(idx.token.termStats.count() == 560)
    assert(idx.token.rareTerms.count() == 407)
    assert(math.abs(idx.token.avgDl - 22.9) < 0.05)
    assert(idx.gram.gramStats.count() == 3135)
  }

  test("Q-001 end-to-end: BM25 top-1 is DOC-001 and the answer equals the golden string") {
    val queries = Seq(("Q-001", "What is BM25 used for?")).toDF("query_id", "query")
    val top = Retrievers.topK(Retrievers.keywordScores(queries, idx.token), 5)
    val top1 = top.filter(col("rank") === 1).select("doc_id").collect()(0).getString(0)
    assert(top1 == "DOC-001")
    val topDocs = top.join(idx.docs.select("doc_id", "title", "text"), "doc_id")
    val ans = Answer.generateAnswers(queries, topDocs).select("answer").collect()(0).getString(0)
    val expected = labels.filter(col("query_id") === "Q-001")
      .select("expected_answer").collect()(0).getString(0)
    assert(ans == expected)
  }

  test("all three arms hit@5 = 14/14; EM vector 14, keyword 13, hybrid 13 (pass 1)") {
    val queries = labels.select("query_id", "query")
    val kw = Retrievers.keywordScores(queries, idx.token)
    val vec = Retrievers.vectorScores(queries, idx.gram)
    val hyb = Retrievers.hybridScores(kw, vec)
    def hitsAndEm(scores: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val top = Retrievers.topK(scores, 5)
      val topDocs = top.join(idx.docs.select("doc_id", "title", "text"), "doc_id")
      val ans = Answer.generateAnswers(queries, topDocs)
      val ev = graft.evalr.Evaluator.scores(top, ans, labels)
        .agg(sum("hit_at_k"), sum("exact_match")).collect()(0)
      (ev.getDouble(0), ev.getDouble(1))
    }
    assert(hitsAndEm(vec) == ((14.0, 14.0)))
    assert(hitsAndEm(kw) == ((14.0, 13.0)))
    assert(hitsAndEm(hyb) == ((14.0, 13.0)))
  }

  test("evaluateAll pass 1: mean=0.97857, state=(+0.25,-0.125,-0.125); pass 2: mean=1.0") {
    val store = new InMemoryTelemetryStore
    val p1 = Pipeline.evaluateAll(spark, idx, labels, store, k = 5)
    assert(math.abs(p1.meanScore - 13.7 / 14.0) < 1e-9)
    assert(math.abs(p1.state.weightVector - 0.25) < 1e-9)
    assert(math.abs(p1.state.weightKeyword + 0.125) < 1e-9)
    assert(math.abs(p1.state.weightHybrid + 0.125) < 1e-9)
    assert(p1.state.lr == 0.25)

    val p2 = Pipeline.evaluateAll(spark, idx, labels, store, k = 5)
    assert(math.abs(p2.meanScore - 1.0) < 1e-9)
    assert(math.abs(p2.state.weightVector - 0.5) < 1e-9)
    assert(math.abs(p2.state.weightKeyword + 0.25) < 1e-9)
    assert(math.abs(p2.state.weightHybrid + 0.25) < 1e-9)

    // run log: one row per label per pass
    assert(store.runFrames.map(_.count()).sum == 28)

    // pass-1 routing vector (reference, SURVEY.md §3.2): Q-001 and Q-006
    // choose hybrid, everything else keyword.
    val routed = p1.perQuery.select("query_id", "strategy").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(routed("Q-001") == "hybrid" && routed("Q-006") == "hybrid")
    assert(routed.count(_._2 == "keyword") == 12)
  }

  test("parquet telemetry store round-trips state and serves recent runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-telemetry").toString
    val store = new graft.telemetry.ParquetTelemetryStore(spark, dir)
    val out = Pipeline.evaluateAll(spark, idx, labels, store, k = 5)
    assert(math.abs(out.state.weightVector - 0.25) < 1e-9)
    val recent = store.recentRuns(10)
    assert(recent.count() == 10)
    assert(recent.columns.toSet ==
      Set("ts_unix", "query", "strategy", "score", "meta_json"))
    // env dispatch: default backend is parquet
    val dispatched = graft.telemetry.TelemetryStore.fromEnv(spark, dir)
    assert(dispatched.isInstanceOf[graft.telemetry.ParquetTelemetryStore])
    assert(math.abs(dispatched.loadRouterState().weightVector - 0.25) < 1e-9)
  }

  test("runOnce: labeled query routes, answers, and scores 1.0") {
    val store = new InMemoryTelemetryStore
    val out = Pipeline.runOnce(spark, idx, labels, store, "What is BM25 used for?", 5)
    val r = out.collect()(0)
    assert(r.getAs[String]("strategy") == "keyword" || r.getAs[String]("strategy") == "hybrid"
      || r.getAs[String]("strategy") == "vector")
    assert(r.getAs[Double]("score") == 1.0)
    assert(r.getAs[scala.collection.Seq[Any]]("top_k").nonEmpty)
    assert(r.getAs[String]("answer").startsWith("Based on the retrieved context"))
  }
}
