package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** `runMain graft.tools.TrainFracProbe [sfDir]` — the sampled-train
  * retrain measurement (VERDICT r15 #4): on one drifted index (base
  * build + one ingested batch), copy per fraction and time
  * `retrainIndex(trainFraction = f)` end-to-end, then read float-tier
  * recall@TopK at the declared operating point (nprobe = NProbeServe)
  * against the exact cosine truth over the SAME live rows. Expected
  * shape: recall ≈ flat (the encode pass is exact regardless of what
  * the quantizer trained on), verb cost falls with the fraction (the
  * two training passes shrink; the encode pass and the rewrite stay).
  * Results go in SCALE.md "Sampled-train retrain". */
object TrainFracProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Cli.session()
    graft.Cli.quietBoundedWindowWarnings()
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_tfp_base").toString
    SimilarityOps.writeIndex(spark, dir, base)
    val extra = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
    graft.streaming.StreamingOps.ingestBatch(extra, 11L, base)

    val panel = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < SimilarityOps.NPanel)
      .orderBy("vec_id").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qdf = panel.toSeq.toDF("query_id", "embedding").localCheckpoint(true)

    // Exact truth over the live rows (base + drift) — computed once; the
    // retrain never changes the row set, only the geometry.
    val truth: Map[Long, Set[Long]] = ProbeUtil.exactTruth(spark, base, qdf)

    Seq(1.0, 0.5, 0.25, 0.1).foreach { frac =>
      val d = java.nio.file.Files.createTempDirectory(
        s"graft_tfp_$frac").toString
      ProbeUtil.copyDir(base, d)
      val t0 = System.nanoTime()
      SimilarityOps.retrainIndex(spark, d, trainFraction = frac)
      val verbSec = (System.nanoTime() - t0) / 1e9
      val served = SimilarityOps.annIvfServeMany(spark, d, qdf)
        .collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
      val recall = truth.keys.toSeq.map { q =>
        (served.getOrElse(q, Set.empty) & truth(q)).size.toDouble / truth(q).size
      }.sum / truth.size
      val live = SimilarityOps.vectorsDf(spark, base).select("vec_id")
      val nTrain = if (frac >= 1.0) live.count()
        else live.filter(SimilarityOps.hashSampleE4(col("vec_id"),
          math.round(frac * 10000).toInt)).count()
      println(f"""[trainfrac] frac=$frac%.2f verb_sec=$verbSec%.1f """ +
        f"""recall@${SimilarityOps.TopK}=$recall%.4f n_train_sample=$nTrain""")
    }
    spark.stop()
  }
}
