package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Round-8 additions: residual IVF-PQ (IVFADC proper — VERDICT r7 #1).
  *
  * The dominance test is the round's acceptance criterion: training the
  * PQ codebooks on residuals v − centroid(v) must move the q105 composed
  * recall curve up (or hold it) at EVERY probe depth relative to the
  * pre-round-8 raw-vector geometry, measured by the exact same curve
  * machinery over the same corpus and the same coarse quantizer.
  */
class Round8OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("residual PQ recall curve dominates the raw-vector geometry at every nprobe") {
    val residual = SimilarityOps.ivfPqRecallCurve(spark, dir).collect()
      .map(r => r.getAs[Long]("nprobe") -> r.getAs[Double]("recall")).toMap
    val (rawCent, rawAsg) = SimilarityOps.rawPqModel(spark, dir)
    val raw = SimilarityOps.pqCurveFor(spark, dir, rawCent, rawAsg, residual = false)
      .collect().map(r => r.getAs[Long]("nprobe") -> r.getAs[Double]("recall")).toMap

    SimilarityOps.NProbeSweep.map(_.toLong).foreach { np =>
      assert(residual(np) >= raw(np),
        s"residual recall ${residual(np)} < raw ${raw(np)} at nprobe=$np " +
          s"(residual curve: $residual, raw curve: $raw)")
    }
    // The switch must buy something, not just tie everywhere.
    assert(SimilarityOps.NProbeSweep.map(_.toLong)
        .exists(np => residual(np) > raw(np)),
      s"residual geometry bought no recall anywhere: residual=$residual raw=$raw")
  }

  test("Memos.release(dir) returns storage to baseline; re-derivation reproduces the frames") {
    import graft.operators.{DedupOps, Memos}
    // Clean slate for this dir (earlier suites/tests may have memoized it),
    // then measure the session's storage baseline.
    Memos.release(dir)
    val base = spark.sparkContext.getPersistentRDDs.size

    val before = DedupOps.minhashDupPairs(spark, dir).collect()
      .map(_.toString).sorted.toSeq
    SimilarityOps.annIvf(spark, dir).count() // k-means model memo
    assert(spark.sparkContext.getPersistentRDDs.size > base,
      "memoized frames should be persisted after use")

    val evicted = Memos.release(dir)
    assert(evicted > 0, "release evicted nothing")
    assert(spark.sparkContext.getPersistentRDDs.size == base,
      s"storage not back to baseline: ${spark.sparkContext.getPersistentRDDs.size} vs $base")

    // Releasing loses nothing but cache: the same frames re-derive.
    val after = DedupOps.minhashDupPairs(spark, dir).collect()
      .map(_.toString).sorted.toSeq
    assert(before == after, "re-derivation after release changed the frame")
    Memos.release(dir)
  }

  test("residual codes reconstruct better than raw codes (mean sq_err strictly lower)") {
    // The mechanism behind the recall win: 64 bits spent on within-cell
    // variance quantize what remains after the probe. Mean squared
    // reconstruction error of the residual codebooks must beat the raw
    // geometry's on the same corpus.
    val residErr = SimilarityOps.pqModel(spark, dir)._2
      .agg(avg(col("dist").cast("double"))).collect()(0).getDouble(0)
    val rawErr = SimilarityOps.rawPqModel(spark, dir)._2
      .agg(avg(col("dist").cast("double"))).collect()(0).getDouble(0)
    assert(residErr < rawErr,
      s"residual mean sq_err $residErr not below raw $rawErr")
  }
}
