package graft

import org.apache.spark.sql.functions._

import graft.retrieve.Retrievers
import graft.stats.{GramIndex, IndexStore, TokenIndex}

/** Bucketed index persistence: save → load round-trip preserves scoring
  * exactly, and index-side joins on the bucket key plan without a shuffle.
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  test("saved+loaded index scores identically and term joins are shuffle-free") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("doc_id").as("doc_idx"), col("text"))
    val idx = TokenIndex.build(corpus, col("text"))
    IndexStore.save(spark, idx, "graft_test_idx")

    val loaded = IndexStore.load(spark, "graft_test_idx")
    assert(loaded.nDocs == idx.nDocs)
    assert(math.abs(loaded.avgDl - idx.avgDl) < 1e-12)

    val q = Seq(("q", "fast spark join stream table merge")).toDF("query_id", "query")
    def top(ti: TokenIndex) =
      Retrievers.topK(Retrievers.keywordScores(q, ti), 10).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    // Same ranking; scores equal to 1e-9 (bucketed layout changes the
    // double-sum accumulation order by a final ulp — see SCALE.md).
    val (a, b) = (top(loaded), top(idx))
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, sa), (_, sb)) => assert(math.abs(sa - sb) < 1e-9) }

    assert(IndexStore.termJoinIsShuffleFree(spark, "graft_test_idx"),
      "bucketed term join should plan without Exchange")
  }

  test("saved+loaded gram index scores identically and gram joins are shuffle-free") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("doc_id").as("doc_idx"), col("text"))
    val idx = GramIndex.build(corpus, col("text"))
    IndexStore.saveGram(spark, idx, "graft_test_gidx")

    val loaded = IndexStore.loadGram(spark, "graft_test_gidx")
    assert(loaded.nDocs == idx.nDocs)
    assert(loaded.n == idx.n)

    val q = Seq(("q", "fast spark join stream table merge")).toDF("query_id", "query")
    def top(gi: GramIndex) =
      Retrievers.topK(Retrievers.vectorScores(q, gi), 10).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    val (a, b) = (top(loaded), top(idx))
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, sa), (_, sb)) => assert(math.abs(sa - sb) < 1e-9) }

    assert(IndexStore.gramJoinIsShuffleFree(spark, "graft_test_gidx"),
      "bucketed gram join should plan without Exchange")
  }
}
