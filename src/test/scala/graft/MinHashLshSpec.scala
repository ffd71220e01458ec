package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Cross-validates the hand-rolled MinHash/Jaccard dedup against Spark ML's
  * MinHashLSH (SURVEY §7.1 step 10): on sf0.001, every exact-Jaccard dup
  * pair (threshold 0.30, q43 semantics) must be recalled by an ML
  * approxSimilarityJoin at the equivalent Jaccard-distance threshold. The
  * two pipelines share no code — shingling feeds HashingTF set-vectors on
  * the ML side — so agreement pins the dedup semantics, not the
  * implementation.
  */
class MinHashLshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ML MinHashLSH recalls every exact-Jaccard dup pair at the threshold") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val feat = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
      .transform(sh)
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
      .fit(feat)
    // distance = 1 − Jaccard; +ε so pairs at exactly the threshold survive
    // the strict < filter inside approxSimilarityJoin.
    val mlPairs = model
      .approxSimilarityJoin(feat, feat, 1.0 - DedupOps.JaccardThreshold + 1e-6, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = DedupOps.jaccardPairs(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

    assert(exact.nonEmpty, "test corpus should contain dup pairs")
    val missed = exact -- mlPairs
    assert(missed.isEmpty, s"ML pipeline missed exact dup pairs: $missed")
  }
}
