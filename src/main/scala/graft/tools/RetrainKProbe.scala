package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** `runMain graft.tools.RetrainKProbe [sfDir]` — the graduated-K
  * retrain adjudication (VERDICT r16 stretch #7): on a skewed-ingest
  * index whose splits grew K past the baseline, does
  * retrain-at-the-grown-K beat retrain-then-resplit on imbalance,
  * recall, and serve wall? Fixture: clones of the fattest cell's rows
  * ingested until splitHotCells fires, then the two arms run on copies
  * of the SAME drifted index:
  *   (a) `retrainIndex` (K resets to KmeansK) + `splitHotCells` — the
  *       r16 behavior plus the follow-up split the reset forces;
  *   (b) `retrainIndex(k = grown K)` — one verb, cells start at the
  *       observed density.
  * Printed per arm: verb wall, post-state K / imbalance / max-cell
  * share, float batch20 wall, recall@TopK vs the exact truth.
  */
object RetrainKProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Cli.session()
    graft.Cli.quietBoundedWindowWarnings()
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_rkp").toString
    SimilarityOps.writeIndex(spark, dir, base)
    // Skewed ingest: clones of the fattest cell until a split would fire.
    val fat = SimilarityOps.vectorsDf(spark, base)
      .groupBy("cluster").count().orderBy(col("count").desc)
      .collect()(0).getAs[Number]("cluster").longValue()
    val fatIds = SimilarityOps.vectorsDf(spark, base)
      .filter(col("cluster") === fat).select("vec_id")
      .collect().map(_.getLong(0))
    (0 until 3).foreach { b =>
      val batch = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id").isin(fatIds.toSeq: _*))
        .select((col("vec_id") + 9000000L + b * 100000L).as("vec_id"),
          col("embedding"))
      graft.streaming.StreamingOps.ingestBatch(batch, b.toLong, base)
    }
    val splits = SimilarityOps.splitHotCells(spark, base, ratio = 1.3)
    val kGrown = SimilarityOps.indexClusterSizes(spark, base)._1.size
    println(s"[retraink] fixture: splits=${splits.size} kGrown=$kGrown " +
      f"imbalance=${SimilarityOps.indexImbalance(spark, base)}%.3f")

    val panel = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < SimilarityOps.NPanel)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qdf = panel.toSeq.toDF("query_id", "embedding").localCheckpoint(true)

    def arm(tag: String, prep: String => Unit): Unit = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_rkp_$tag").toString
      ProbeUtil.copyDir(base, d)
      graft.operators.Memos.release(d)
      val t0 = System.nanoTime()
      prep(d)
      val verbSec = (System.nanoTime() - t0) / 1e9
      val (sizes, ntot) = SimilarityOps.indexClusterSizes(spark, d)
      val truth = ProbeUtil.exactTruth(spark, d, qdf)
      val served = SimilarityOps.annIvfServeMany(spark, d, qdf).collect()
        .groupBy(_.getAs[Long]("query_id"))
      val recall = truth.keys.toSeq.map { q =>
        val got = served.getOrElse(q, Array.empty)
          .map(_.getAs[Long]("vec_id")).toSet
        (got & truth(q)).size.toDouble / truth(q).size
      }
      val wall = ProbeUtil.timedMinMs(
        SimilarityOps.annIvfServeMany(spark, d, qdf).collect())
      println(f"[retraink] $tag verb_sec=$verbSec%.1f K=${sizes.size} " +
        f"imbalance=${SimilarityOps.indexImbalance(spark, d)}%.3f " +
        f"max_share=${sizes.values.max.toDouble / ntot}%.3f " +
        f"batch20_ms=$wall%.1f recall=${recall.sum / recall.size}%.4f")
    }
    arm("reset_then_resplit", { d =>
      SimilarityOps.retrainIndex(spark, d)
      SimilarityOps.splitHotCells(spark, d, ratio = 1.3)
      ()
    })
    arm("graduated_k      ", { d =>
      SimilarityOps.retrainIndex(spark, d, k = kGrown)
      ()
    })
    spark.stop()
  }
}
