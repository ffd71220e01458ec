package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, EventsOps, MultimodalOps, RelationalOps, RetrievalOps, SimilarityOps, TextAnalysisOps}
import graft.retrieve.Retrievers

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: adaptive hybrid retrieval over the sf0.001 documents table —
    * BM25 + char-gram cosine blended, stable top-10 with scores.
    * Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    val q = Seq(("q", RetrievalOps.Bm25Query)).toDF("query_id", "query")
    val top = Retrievers.topK(
      Retrievers.hybridScores(
        Retrievers.keywordScores(q, RetrievalOps.tokenIndex(spark, dir)),
        Retrievers.vectorScores(q, RetrievalOps.gramIndex(spark, dir))), 10)
    top.join(spark.read.parquet(s"$dir/documents.parquet"), "doc_id")
      .select(col("rank"), col("doc_id"), round(col("score"), 6).as("score"),
        col("lang"), substring(col("text"), 1, 80).as("preview"))
      .orderBy("rank")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ RetrievalOps.queries ++ TextAnalysisOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ EventsOps.queries ++
      MultimodalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ RetrievalOps.oracles ++ TextAnalysisOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ EventsOps.oracles ++
      MultimodalOps.oracles
}
