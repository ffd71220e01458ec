package graft.answer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.textops.TextOps

/** Context assembly + template answer generation
  * (/root/reference/src/beyond_vector_search/answer.py:15-39).
  *
  * The greedy 900-char context budget is a sequential fold over ≤k ranked
  * rows; expressed with the `aggregate` higher-order function over a
  * rank-sorted collected array, so it stays fully distributed (one row per
  * query, no driver loop).
  */
object Answer {

  val MaxContextChars = 900
  val Fallback = "I couldn't find relevant context in the toy corpus."

  /** Per-row context block: `[doc_id] title: snippet`. */
  def block(docId: Column, title: Column, text: Column): Column =
    concat(lit("["), docId, lit("] "), title, lit(": "),
      TextOps.joinTopSentences(text, 2))

  /** topKDocs: (query_id, rank, doc_id, title, text) → (query_id, context).
    * Greedy: stop at the first block that would exceed the budget
    * (break, not skip — reference answer.py:20-24).
    */
  def buildContext(topKDocs: DataFrame, maxChars: Int = MaxContextChars): DataFrame = {
    val blocks = topKDocs
      .select(col("query_id"), col("rank"),
        block(col("doc_id"), col("title"), col("text")).as("block"))
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(col("rank"), col("block")))),
        s => s.getField("block")).as("blocks"))

    blocks.select(col("query_id"),
      aggregate(
        col("blocks"),
        struct(lit("").as("text"), lit(0).as("used"), lit(false).as("done")),
        (acc, b) =>
          when(acc.getField("done") || acc.getField("used") + length(b) > maxChars,
            struct(acc.getField("text").as("text"), acc.getField("used").as("used"),
              lit(true).as("done")))
          .otherwise(
            struct(
              when(length(acc.getField("text")) === 0, b)
                .otherwise(concat(acc.getField("text"), lit("\n"), b)).as("text"),
              (acc.getField("used") + length(b)).as("used"),
              lit(false).as("done"))),
        acc => acc.getField("text")).as("context"))
  }

  /** queries: (query_id, query); topKDocs as above. Returns
    * (query_id, answer, citation). Missing top-1 → fallback text.
    */
  def generateAnswers(queries: DataFrame, topKDocs: DataFrame): DataFrame = {
    val top1 = topKDocs.filter(col("rank") === 1)
      .select(col("query_id"), col("doc_id"), col("title"),
        TextOps.joinTopSentences(col("text"), 2).as("snippet"))
    queries.join(top1, Seq("query_id"), "left")
      .select(col("query_id"),
        when(col("doc_id").isNull, lit(Fallback)).otherwise(
          concat(lit("Based on the retrieved context, here's the best match:\n\n"),
            col("title"), lit("\n"), col("snippet"),
            lit("\n\n(Query: "), col("query"), lit(")"))).as("answer"),
        col("doc_id").as("citation"))
  }
}
