package graft.evalr

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.textops.TextOps

/** hit@k / answer exact-match / blended total
  * (/root/reference/src/beyond_vector_search/evaluator.py:8-28).
  */
object Evaluator {

  val HitWeight = 0.7
  val EmWeight = 0.3

  /** topK: (query_id, doc_id, rank); labels: (query_id, expected_doc_id).
    * Returns (query_id, hit_at_k) — 1.0 iff expected doc appears in top-k.
    */
  def hitAtK(topK: DataFrame, labels: DataFrame): DataFrame =
    labels.select("query_id", "expected_doc_id")
      .join(topK.select("query_id", "doc_id"), Seq("query_id"), "left")
      .groupBy("query_id")
      .agg(max(when(col("doc_id") === col("expected_doc_id"), 1.0).otherwise(0.0))
        .as("hit_at_k"))

  /** answers: (query_id, answer); labels: (query_id, expected_answer).
    * Case/whitespace-insensitive exact match → (query_id, exact_match).
    */
  def exactMatch(answers: DataFrame, labels: DataFrame): DataFrame =
    answers.join(labels.select("query_id", "expected_answer"), "query_id")
      .select(col("query_id"),
        when(TextOps.emKey(col("answer")) === TextOps.emKey(col("expected_answer")),
          1.0).otherwise(0.0).as("exact_match"))

  /** (query_id, hit_at_k, exact_match, total). */
  def scores(topK: DataFrame, answers: DataFrame, labels: DataFrame): DataFrame =
    hitAtK(topK, labels).join(exactMatch(answers, labels), "query_id")
      .withColumn("total",
        lit(HitWeight) * col("hit_at_k") + lit(EmWeight) * col("exact_match"))
}
