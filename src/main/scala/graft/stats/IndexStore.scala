package graft.stats

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, bucketed storage for the token index.
  *
  * An engine at 100 TB does not rebuild its inverted index per session: the
  * long-form tables are written once, BUCKETED BY the join key, and every
  * subsequent scoring/statistics job reads them shuffle-free:
  *   - `doc_term_freq` and `term_stats` bucket by `term`: the scoring join
  *     (query terms ⋈ index) and any per-term aggregation co-locate without
  *     an Exchange on the index side;
  *   - `doc_len` buckets by `doc_id` for the per-doc length join.
  * Scalars (n_docs, avg_dl) live in a 1-row `_meta` table.
  *
  * Bucketed tables require the session catalog (`saveAsTable`); bucket
  * counts are small here (local warehouse) — at production scale they'd be
  * sized so each bucket file is O(100 MB).
  */
object IndexStore {

  val Buckets = 8

  /** Drop a managed table AND its (possibly orphaned) warehouse location —
    * a crashed writer leaves the directory behind, which then blocks every
    * subsequent Overwrite with LOCATION_ALREADY_EXISTS. */
  private def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  def save(spark: SparkSession, idx: TokenIndex, prefix: String): Unit = {
    Seq("doc_term_freq", "term_stats", "doc_len", "meta")
      .foreach(t => reset(spark, s"${prefix}_$t"))
    idx.docTermFreq.write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "term").sortBy("term")
      .saveAsTable(s"${prefix}_doc_term_freq")
    idx.termStats.write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "term").sortBy("term")
      .saveAsTable(s"${prefix}_term_stats")
    idx.docLen.write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "doc_id")
      .saveAsTable(s"${prefix}_doc_len")
    import spark.implicits._
    Seq((idx.nDocs, idx.avgDl, idx.rareDfThreshold))
      .toDF("n_docs", "avg_dl", "rare_df_threshold")
      .write.mode(SaveMode.Overwrite).saveAsTable(s"${prefix}_meta")
  }

  def load(spark: SparkSession, prefix: String): TokenIndex = {
    val meta = spark.table(s"${prefix}_meta").collect()(0)
    TokenIndex(
      docTermFreq = spark.table(s"${prefix}_doc_term_freq"),
      termStats = spark.table(s"${prefix}_term_stats"),
      docLen = spark.table(s"${prefix}_doc_len"),
      avgDl = meta.getDouble(1),
      nDocs = meta.getLong(0),
      rareDfThreshold = meta.getInt(2))
  }

  /** True when a join over the two term-bucketed tables plans without a
    * SHUFFLE exchange on either side (broadcast of the small stats table is
    * disabled for the probe so the bucket-to-bucket path is what's tested).
    */
  def termJoinIsShuffleFree(spark: SparkSession, prefix: String): Boolean = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = spark.table(s"${prefix}_doc_term_freq")
        .join(spark.table(s"${prefix}_term_stats"), "term")
        .queryExecution.executedPlan.toString
      !plan.contains("Exchange hashpartitioning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
