package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim
import graft.operators._

/** Operator-pack sanity on sf0.001 (the DuckDB hash-compare runs at sf0.01
  * via Verify + tools/check_oracle.py; these specs pin semantics that the
  * hash compare can't see — invariants, edge cases, expression parity).
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("CosineSimilarity expression matches the HOF formulation and handles edges") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),   // identical → 1.0
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),               // orthogonal → 0.0
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),               // zero vector → 0.0
      (Array(-1.0f, -2.0f), Array(1.0f, 2.0f))              // opposite → -1.0
    ).toDF("a", "b")
    val rows = df.select(
      cosineSim(col("a"), col("b")).as("expr"),
      SimilarityOps.cosineHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getDouble(0)) < 1e-12)
    assert(rows(2).getDouble(0) == 0.0)
    assert(math.abs(rows(3).getDouble(0) + 1.0) < 1e-12)
  }

  test("brute-force ANN: rank 1 is the query vector itself with cos 1.0") {
    val top = SimilarityOps.annBruteForce(spark, dir).collect()
    assert(top.head.getAs[Long]("vec_id") == SimilarityOps.QueryVecId)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-6)
    assert(top.length == SimilarityOps.TopK)
    val scores = top.map(_.getAs[Double]("cos")).toSeq
    assert(scores == scores.sorted.reverse) // descending
  }

  test("IVF returns a descending ranking that is a sub-ranking of brute force") {
    // NOTE: IVF is approximate — with noisy clusters the query's own label
    // may not be probed, so rank 1 can differ from brute force. The
    // invariant is: results are sorted, and any vec that appears in both
    // rankings appears in the same relative order.
    val bf = SimilarityOps.annBruteForce(spark, dir).collect()
      .map(_.getAs[Long]("vec_id")).toSeq
    val ivf = SimilarityOps.annIvf(spark, dir).collect()
    val scores = ivf.map(_.getAs[Double]("cos")).toSeq
    assert(scores == scores.sorted.reverse)
    val common = ivf.map(_.getAs[Long]("vec_id")).filter(bf.contains).toSeq
    assert(common == common.sortBy(bf.indexOf))
  }

  test("minhash signatures: identical texts share all bands; bands are stable") {
    val a = DedupOps.minhashBands(spark, dir)
    val b = DedupOps.minhashBands(spark, dir)
    assert(a.exceptAll(b).isEmpty) // deterministic across runs
    assert(a.groupBy("doc_id").count().filter(col("count") =!= 4).isEmpty)
  }

  test("exact dup groups: group sizes sum to corpus size; canonical <= member") {
    val g = DedupOps.exactDupGroups(spark, dir)
    assert(g.count() == 500)
    assert(g.filter(col("canonical_id") > col("doc_id")).isEmpty)
  }

  test("jaccard pairs are symmetric-free (a<b) and within [0,1]") {
    val p = DedupOps.jaccardPairs(spark, dir)
    assert(p.filter(col("doc_a") >= col("doc_b")).isEmpty)
    assert(p.filter(col("jaccard") < 0 || col("jaccard") > 1).isEmpty)
  }

  test("simhash: near-identical docs have small hamming distance") {
    val sh = TextAnalysisOps.simhash(spark, dir)
    // deterministic + full coverage
    assert(sh.count() == 500)
    val dupPair = DedupOps.exactDupGroups(spark, dir)
      .filter(col("group_size") > 1).limit(2).collect()
    if (dupPair.nonEmpty) {
      val ids = dupPair.map(_.getAs[Long]("doc_id"))
      val hs = sh.filter(col("doc_id").isin(ids: _*)).collect()
        .map(_.getAs[Long]("simhash"))
      if (hs.length == 2)
        assert(java.lang.Long.bitCount(hs(0) ^ hs(1)) == 0)
    }
  }

  test("multimodal stub decode: features deterministic and schema-stable") {
    val f = MultimodalOps.mediaFeatures(spark, dir)
    assert(f.count() == 500)
    val r = f.orderBy("doc_id").limit(1).collect()(0)
    assert(r.getAs[Long]("byte_len") > 0)
    assert(r.getAs[Double]("avg_byte") > 0.0 && r.getAs[Double]("avg_byte") < 256.0)
    assert(r.getAs[Long]("pixels") > 0)
    // metadata-only query never decodes: byte_len equals utf-8 length
    val m = MultimodalOps.mediaMeta(spark, dir).orderBy("doc_id").limit(1).collect()(0)
    assert(m.getAs[Long]("byte_len") == r.getAs[Long]("byte_len"))
  }

  test("sessionization: every event in exactly one session; durations non-negative") {
    val s = EventsOps.userSessions(spark, dir)
    val total = s.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == 1000)
    assert(s.filter(col("duration_s") < 0).isEmpty)
  }

  test("langid covers every doc with a deterministic prediction") {
    val l = TextAnalysisOps.langId(spark, dir)
    assert(l.count() == 500)
    assert(l.filter(col("predicted_lang").isNull).isEmpty)
  }

  test("hashedEmbeddings sign bit tracks (h // dims) % 2 at other dims") {
    // The oracle computes (h // dims) % 2; the engine computes
    // shiftright(h, log2(dims)) % 2. Pin their agreement across dims so
    // changing EmbeddingDims can't silently diverge the two (VERDICT r2 #7).
    val hs = Seq(0L, 1L, 15L, 16L, 17L, 31L, 32L, 47L, 63L, 64L,
      1152921504606846975L, 987654321098765L).toDF("h")
    for (dims <- Seq(16, 32, 64)) {
      val got = hs.select(col("h"),
        RetrievalOps.signFactor(col("h"), dims).as("s")).collect()
      got.foreach { r =>
        val h = r.getLong(0)
        val want = if ((h / dims) % 2 == 0) 1.0 else -1.0
        assert(r.getDouble(1) == want, s"h=$h dims=$dims")
      }
    }
    intercept[IllegalArgumentException] {
      RetrievalOps.signFactor(col("h"), 12)
    }
  }
}
