package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.answer.Answer
import graft.evalr.Evaluator
import graft.retrieve.Retrievers
import graft.router.{Router, RouterState}
import graft.stats.{GramIndex, TokenIndex}
import graft.telemetry.TelemetryStore

/** End-to-end wiring of the adaptive retrieval engine: the reference's two
  * entry points re-expressed as lazy DataFrame plans
  * (/root/reference/src/beyond_vector_search/run.py:16-73,
  *  /root/reference/src/beyond_vector_search/evaluate.py:16-116).
  */
object Pipeline {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType), StructField("title", StringType),
    StructField("text", StringType)))

  val labelSchema: StructType = StructType(Seq(
    StructField("query_id", StringType), StructField("query", StringType),
    StructField("expected_doc_id", StringType),
    StructField("expected_answer", StringType)))

  /** Load a JSONL corpus with a deterministic `doc_idx` = file line number
    * (0-based, blank lines skipped) — the stable-top-k tie-break key
    * (reference text.py:52-54 sorts by corpus position). zipWithIndex is
    * deterministic here because input-file splits are ordered by offset.
    */
  def loadCorpusJsonl(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
    val withIdx = lines.rdd.zipWithIndex.map { case (r, i) => (r.getString(0), i) }
    spark.createDataFrame(withIdx).toDF("value", "doc_idx")
      .select(from_json(col("value"), docSchema).as("d"), col("doc_idx"))
      .select(col("d.doc_id").as("doc_id"), col("d.title").as("title"),
        col("d.text").as("text"), col("doc_idx"))
  }

  def loadLabelsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(labelSchema).json(path)

  /** Built, cached retrieval indexes over a corpus
    * (doc_id, title, text, doc_idx). */
  final case class Indexes(docs: DataFrame, token: TokenIndex, gram: GramIndex)

  def buildIndexes(docs: DataFrame): Indexes = {
    val d = docs.cache()
    val full = concat(col("title"), lit(" "), col("text"))
    Indexes(d, TokenIndex.build(d, full).cache(), GramIndex.build(d, full).cache())
  }

  /** Dense scores for one arm. */
  def armScores(strategy: String, queries: DataFrame, idx: Indexes): DataFrame =
    strategy match {
      case "keyword" => Retrievers.keywordScores(queries, idx.token)
      case "vector"  => Retrievers.vectorScores(queries, idx.gram)
      case "hybrid"  => Retrievers.hybridScores(
        Retrievers.keywordScores(queries, idx.token),
        Retrievers.vectorScores(queries, idx.gram))
    }

  final case class EvalOutcome(
      perQuery: DataFrame, meanScore: Double, state: RouterState)

  /** Batch evaluation + feedback (reference evaluate.py:16-116).
    *
    * Semantics choice (documented in SURVEY.md §3.2): the reference routes
    * label i against state mutated by labels 1..i-1; the update deltas are
    * state-independent, so this build routes ALL labels against the frozen
    * pass-start state and applies the summed deltas once — identical final
    * weights, identical retrieval, and identical routing on the bundled
    * data; divergent mid-pass routing is possible in general.
    */
  def evaluateAll(
      spark: SparkSession,
      idx: Indexes,
      labels: DataFrame,
      store: TelemetryStore,
      k: Int = 5): EvalOutcome = {

    val queries = labels.select("query_id", "query")

    // Each arm feeds the evaluator, the answers, the top-id aggregate, and
    // (for kw/vec) the hybrid blend — cache the dense frames or Catalyst
    // re-executes each scoring subtree 4-6x inside the armTotals plan.
    val kw = Retrievers.keywordScores(queries, idx.token).cache()
    val vec = Retrievers.vectorScores(queries, idx.gram).cache()
    val hyb = Retrievers.hybridScores(kw, vec).cache()

    def armEval(name: String, scores: DataFrame): DataFrame = {
      val top = Retrievers.topK(scores, k).cache()
      val topDocs = top.join(idx.docs.select("doc_id", "title", "text"), "doc_id")
      val answers = Answer.generateAnswers(queries, topDocs)
      val ev = Evaluator.scores(top, answers, labels)
      val topIds = top.groupBy("query_id").agg(
        transform(array_sort(collect_list(struct(col("rank"), col("doc_id")))),
          s => s.getField("doc_id")).as(s"${name}_top_doc_ids"))
      ev.select(col("query_id"),
          col("hit_at_k").as(s"${name}_hit"),
          col("exact_match").as(s"${name}_em"),
          col("total").as(s"${name}_total"))
        .join(topIds, "query_id")
    }

    val armTotals = armEval("vector", vec)
      .join(armEval("keyword", kw), "query_id")
      .join(armEval("hybrid", hyb), "query_id")
      .cache()

    val state = store.loadRouterState()
    val routed = Router.route(
      Router.features(queries, idx.token.termStats.select("term"), idx.token.rareTerms),
      state)

    val perQuery = routed.join(armTotals, "query_id")
      .withColumn("chosen_total",
        when(col("strategy") === "vector", col("vector_total"))
          .when(col("strategy") === "keyword", col("keyword_total"))
          .otherwise(col("hybrid_total")))
      .cache()

    val mean = perQuery.agg(
      coalesce(sum(col("chosen_total")), lit(0.0)) /
        greatest(lit(1L), count(lit(1)))).collect()(0).getDouble(0)

    val newState = Router.applyDeltas(state,
      Router.updateDeltas(armTotals, state.lr))
    store.saveRouterState(newState)

    val runs = perQuery
      .join(labels.select("query_id", "expected_doc_id"), "query_id")
      .select(
        current_timestamp().cast("double").as("ts_unix"),
        col("query"),
        col("strategy"),
        col("chosen_total").as("score"),
        to_json(struct(
          lit(true).as("eval"),
          col("query_id"),
          col("expected_doc_id"),
          struct(col("n_tokens"), col("digit_ratio"), col("oov_ratio"),
            col("rare_ratio")).as("features"),
          struct(col("heuristic_keyword"), col("heuristic_vector"),
            col("heuristic_hybrid"), col("score_keyword"), col("score_vector"),
            col("score_hybrid")).as("route_meta"),
          struct(col("vector_total").as("score_total"), col("vector_hit").as("hit_at_k"),
            col("vector_em").as("exact_match"), col("vector_top_doc_ids").as("top_doc_ids"))
            .as("vector"),
          struct(col("keyword_total").as("score_total"), col("keyword_hit").as("hit_at_k"),
            col("keyword_em").as("exact_match"), col("keyword_top_doc_ids").as("top_doc_ids"))
            .as("keyword"),
          struct(col("hybrid_total").as("score_total"), col("hybrid_hit").as("hit_at_k"),
            col("hybrid_em").as("exact_match"), col("hybrid_top_doc_ids").as("top_doc_ids"))
            .as("hybrid"))).as("meta_json"))
    store.logRuns(runs)

    EvalOutcome(perQuery, mean, newState)
  }

  /** Single-query entry point (reference run.py:16-73). Routes with the
    * current state, executes only the chosen arm, answers, scores if the
    * query is labeled, and logs one run row. The driver-side branch on the
    * 1-row routing decision mirrors the reference's dispatch.
    */
  def runOnce(
      spark: SparkSession,
      idx: Indexes,
      labels: DataFrame,
      store: TelemetryStore,
      query: String,
      k: Int = 5): DataFrame = {
    import spark.implicits._

    val queries = Seq(("q", query)).toDF("query_id", "query")
    val state = store.loadRouterState()
    val routed = Router.route(
      Router.features(queries, idx.token.termStats.select("term"), idx.token.rareTerms),
      state).cache()
    val strategy = routed.select("strategy").collect()(0).getString(0)

    val top = Retrievers.topK(armScores(strategy, queries, idx), k)
    val topDocs = top.join(idx.docs.select("doc_id", "title", "text"), "doc_id")
    val answers = Answer.generateAnswers(queries, topDocs)
    val context = Answer.buildContext(topDocs)

    // Reference keeps ONE label per query text (dict, last insertion wins);
    // dedup deterministically on the highest query_id.
    val labeled = labels.filter(col("query") === query)
      .orderBy(col("query_id").desc).limit(1)
      .select(col("query_id").as("label_id"), col("expected_doc_id"),
        col("expected_answer"))
    val scored =
      if (labeled.isEmpty) answers.withColumn("score", lit(0.0))
      else {
        val lab = labeled.withColumn("query_id", lit("q"))
        Evaluator.scores(top, answers, lab)
          .select(col("query_id"), col("total").as("score"))
          .join(answers, "query_id")
      }

    // Left joins + coalesce: with an empty top-k (e.g. empty corpus) the
    // reference still returns the fallback answer with score 0 and logs the
    // run (run.py:63-73) — inner joins would drop the row entirely.
    val result = scored
      .join(context, Seq("query_id"), "left")
      .withColumn("context", coalesce(col("context"), lit("")))
      .withColumn("strategy", lit(strategy))
      .join(top.groupBy("query_id").agg(
        transform(array_sort(collect_list(struct(col("rank"), col("doc_id"), col("score")))),
          s => struct(s.getField("doc_id").as("doc_id"), s.getField("score").as("score")))
          .as("top_k")), Seq("query_id"), "left")
      .withColumn("top_k", coalesce(col("top_k"), expr("array()")))
      .withColumn("query", lit(query))

    store.logRuns(result.select(
      current_timestamp().cast("double").as("ts_unix"),
      col("query"), col("strategy"), col("score"),
      to_json(struct(lit(k).as("k"),
        transform(col("top_k"), r => r.getField("doc_id")).as("top_doc_ids"),
        substring(col("context"), 1, 240).as("context_preview"))).as("meta_json")))

    result.select("query", "strategy", "top_k", "answer", "score", "context")
  }
}
