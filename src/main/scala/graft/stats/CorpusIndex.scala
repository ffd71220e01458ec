package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.textops.TextOps

/** Corpus statistics, long-form (the idiomatic Spark inverted-index layout).
  *
  * Two strictly separate spaces (reference keeps them independent on purpose,
  * /root/reference/src/beyond_vector_search/retrievers.py:59-62):
  *   - token space → BM25 keyword scoring
  *     (/root/reference/src/beyond_vector_search/index.py:21-46)
  *   - char-4-gram space → TF-IDF cosine "vector" scoring
  *     (/root/reference/src/beyond_vector_search/retrievers.py:57-85)
  *
  * Layouts are all (doc_id, term/gram)-keyed long tables rather than
  * MapType columns: scoring then becomes broadcast-join + hash-aggregate,
  * which scales to a partitioned 100 TB corpus (no per-row dict scans, full
  * predicate pushdown, map-side partial aggregation).
  */
object CorpusIndex {

  /** BM25-style smoothed IDF: ln(1 + (N - df + 0.5)/(df + 0.5)).
    * Reference: index.py:38-41 (tokens) and retrievers.py:71 (grams). */
  def bm25Idf(df: Column, nDocs: Long): Column =
    log(lit(1.0) + (lit(nDocs.toDouble) - df + lit(0.5)) / (df + lit(0.5)))

  /** Sublinear TF weight: (1 + ln(tf)) * idf. Reference: retrievers.py:29. */
  def sublinearTfIdf(tf: Column, idf: Column): Column =
    (lit(1.0) + log(tf.cast("double"))) * idf
}

/** Token-space index over a corpus.
  *
  * @param docTokens  (doc_id, tokens array<string>, doc_idx) — cached upstream
  * @param docTermFreq (doc_id, term, tf)
  * @param termStats  (term, df, idf)
  * @param docLen     (doc_id, doc_idx, dl)
  * @param avgDl      corpus mean doc length (guarded n>=1)
  * @param nDocs      corpus size
  */
final case class TokenIndex(
    docTermFreq: DataFrame,
    termStats: DataFrame,
    docLen: DataFrame,
    avgDl: Double,
    nDocs: Long,
    rareDfThreshold: Int) {

  /** (term) frame of rare terms (df <= threshold). */
  def rareTerms: DataFrame = termStats.filter(col("df") <= rareDfThreshold).select("term")

  def cache(): TokenIndex = {
    docTermFreq.cache(); termStats.cache(); docLen.cache(); this
  }

  /** Blocking unpersist of every cached frame (memo release path). */
  def uncache(): Unit = {
    docTermFreq.unpersist(true); termStats.unpersist(true); docLen.unpersist(true)
  }
}

object TokenIndex {

  /** Build from a corpus frame with columns (doc_id, <textCol>, doc_idx).
    * doc_idx is the deterministic corpus position used for stable top-k
    * tie-breaks (reference text.py:52-54).
    */
  def build(corpus: DataFrame, textCol: Column, rareDfThreshold: Int = 1): TokenIndex = {
    val toks = corpus.select(
      col("doc_id"), col("doc_idx"), TextOps.tokenize(textCol).as("tokens"))

    val docLen = toks.select(col("doc_id"), col("doc_idx"), size(col("tokens")).as("dl"))

    // One shuffle on (doc_id, term); map-side partial counts come free.
    val docTermFreq = toks
      .select(col("doc_id"), explode(col("tokens")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("int").as("tf"))

    val Array(nDocsRaw, totalLen) = docLen
      .agg(count(lit(1)), sum(col("dl"))).collect()(0) match {
        case r => Array(r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
    val nDocs = math.max(1L, nDocsRaw)
    val avgDl = totalLen.toDouble / nDocs

    // df re-derived from docTermFreq (already distinct per (doc_id, term)).
    val termStats = docTermFreq
      .groupBy("term")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", CorpusIndex.bm25Idf(col("df"), nDocs))

    TokenIndex(docTermFreq, termStats, docLen, avgDl, nDocs, rareDfThreshold)
  }
}

/** Char-n-gram space index (the "vector" space).
  *
  * @param docGramVec (doc_id, gram, w) sublinear-TF-IDF weights
  * @param gramStats  (gram, df, idf)
  * @param docNorm    (doc_id, doc_idx, norm) L2 norms, 0 → 1.0 guard
  */
final case class GramIndex(
    docGramVec: DataFrame,
    gramStats: DataFrame,
    docNorm: DataFrame,
    nDocs: Long,
    n: Int)(
    // Second parameter list (outside equals/unapply): the build-internal
    // cached TF frame, carried only so uncache() can release it.
    private val docGramFreq: DataFrame) {

  def cache(): GramIndex = {
    docGramVec.cache(); gramStats.cache(); docNorm.cache(); this
  }

  /** Blocking unpersist of every cached frame (memo release path),
    * including the build-internal TF cache. */
  def uncache(): Unit = {
    docGramVec.unpersist(true); gramStats.unpersist(true); docNorm.unpersist(true)
    docGramFreq.unpersist(true)
  }
}

object GramIndex {

  /** Exploded (doc_id, doc_idx, gram) rows. Formulated as
    * explode(sequence) + substr rather than explode(array-HOF) — the
    * array `transform` lambda runs interpreted (outside whole-stage
    * codegen) and is ~10× slower per gram; this shape stays fully
    * codegen'd. Semantics identical to TextOps.charNgrams: substr clamps,
    * so strings shorter than n yield the whole string; empty → no rows. */
  def explodedNgrams(corpus: DataFrame, textCol: Column, n: Int): DataFrame =
    corpus
      .select(col("doc_id"), col("doc_idx"), TextOps.wsNormalize(textCol).as("s"))
      .filter(length(col("s")) > 0)
      .select(col("doc_id"), col("doc_idx"), col("s"),
        explode(sequence(lit(1), greatest(lit(1), length(col("s")) - (n - 1)))).as("i"))
      .select(col("doc_id"), col("doc_idx"), col("s").substr(col("i"), lit(n)).as("gram"))

  def build(corpus: DataFrame, textCol: Column, n: Int = 4): GramIndex = {
    val grams = explodedNgrams(corpus, textCol, n)

    // Both gramStats and docGramVec derive from the TF table — cache it or
    // the explode+aggregate pipeline executes once per branch.
    val docGramFreq = grams
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).cast("int").as("tf"))
      .cache()

    val nDocs = math.max(1L, corpus.count())

    val gramStats = docGramFreq
      .groupBy("gram")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", CorpusIndex.bm25Idf(col("df"), nDocs))

    val docGramVec = docGramFreq
      .join(gramStats.select("gram", "idf"), "gram")
      .select(col("doc_id"), col("gram"),
        CorpusIndex.sublinearTfIdf(col("tf"), col("idf")).as("w"))

    // Every doc must keep a norm row even with an empty gram vector
    // (norm 0 → 1.0 guard, reference retrievers.py:84); left join from the
    // full corpus keeps empty-text docs present.
    val norms = docGramVec
      .groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("norm0"))
    val docNorm = corpus.select("doc_id", "doc_idx")
      .join(norms, Seq("doc_id"), "left")
      .select(col("doc_id"), col("doc_idx"),
        when(col("norm0").isNull || col("norm0") === 0.0, 1.0)
          .otherwise(col("norm0")).as("norm"))

    GramIndex(docGramVec, gramStats, docNorm, nDocs, n)(docGramFreq)
  }
}
