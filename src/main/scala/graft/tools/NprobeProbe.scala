package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** `runMain graft.tools.NprobeProbe [sfDir]` — calibration + verdict
  * data for dispatch-aware probe depth (VERDICT r15 stretch #7):
  *   1. per panel query: the census margin vs float recall@TopK at
  *      nprobe ∈ {4, 8, 16} against the exact cosine truth — the data
  *      the DepthMargin* thresholds are picked from;
  *   2. batch-of-20 wall time: fixed nprobe=NProbeServe vs the
  *      depth-routed dispatch (min-of-5 each);
  *   3. the SCALE term wall time can't show at sf0.1: scanned-row
  *      coverage (Σ probed-cell sizes / corpus, from the size
  *      artifact) per policy — the number that grows into the scan
  *      bound at 100 TB.
  */
object NprobeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Cli.session()
    graft.Cli.quietBoundedWindowWarnings()
    import spark.implicits._

    val idx = java.nio.file.Files.createTempDirectory("graft_nprobe").toString
    SimilarityOps.writeIndex(spark, dir, idx)
    val panel = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < SimilarityOps.NPanel)
      .orderBy("vec_id").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qdf = panel.toSeq.toDF("query_id", "embedding").localCheckpoint(true)

    val truth: Map[Long, Set[Long]] = ProbeUtil.exactTruth(spark, idx, qdf)

    val margins: Map[Long, Double] = SimilarityOps
      .servedTierFeatures(spark, idx, qdf)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Double]("margin")).toMap

    def recallAt(np: Int): Map[Long, Double] =
      SimilarityOps.annIvfServeMany(spark, idx, qdf, nprobe = np)
        .collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) =>
          q -> (rs.map(_.getAs[Long]("vec_id")).toSet & truth(q)).size.toDouble /
            truth(q).size
        }
    val r4 = recallAt(4); val r8 = recallAt(8); val r16 = recallAt(16)
    margins.keys.toSeq.sorted.foreach { q =>
      println(f"[nprobe] qid=$q margin=${margins(q)}%.6f " +
        f"r4=${r4(q)}%.3f r8=${r8(q)}%.3f r16=${r16(q)}%.3f")
    }

    val fixedMs = ProbeUtil.timedMinMs(
      SimilarityOps.annIvfServeMany(spark, idx, qdf).collect())
    val routedMs = ProbeUtil.timedMinMs(
      SimilarityOps.annIvfServeManyDepth(spark, idx, qdf).collect())
    println(f"""[nprobe] "float_batch20_fixed_ms": $fixedMs%.1f""")
    println(f"""[nprobe] "float_batch20_depth_ms": $routedMs%.1f""")

    // Depth-routed recall + scanned-row coverage vs fixed.
    val routed = SimilarityOps.annIvfServeManyDepth(spark, idx, qdf)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> (rs.map(_.getAs[Long]("vec_id")).toSet & truth(q)).size.toDouble /
          truth(q).size
      }
    val depths = SimilarityOps.probeDepthOf(spark, idx, qdf)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("np_depth")).toMap
    def meanOf(m: Map[Long, Double]) = m.values.sum / m.size
    println(f"[nprobe] recall_fixed8=${meanOf(r8)}%.4f " +
      f"recall_routed=${meanOf(routed)}%.4f " +
      s"depths=${depths.toSeq.sorted.map(_._2).groupBy(identity)
        .map { case (d, xs) => s"np$d:${xs.size}" }.toSeq.sorted.mkString(",")}")
    val (sizes, ntot) = SimilarityOps.indexClusterSizes(spark, idx)
    val cent = SimilarityOps.artifactDf(spark, idx, "centroids")
    // Scanned-row fraction per policy: Σ over queries of probed-cell
    // sizes, relative to |Q|·corpus (the fixed-depth bound's currency).
    def scannedFrac(npOf: Long => Long): Double = {
      val cranks = SimilarityOps.crankFrameFor(spark, idx, qdf)
        .collect().map(r => (r.getAs[Long]("query_id"),
          r.getAs[Number]("cluster").longValue(), r.getAs[Int]("crank")))
      val scanned = cranks.collect {
        case (q, c, k) if k <= npOf(q) => sizes.getOrElse(c, 0L)
      }.sum
      scanned.toDouble / (ntot.toDouble * depths.size)
    }
    println(f"[nprobe] scanned_frac_fixed8=${scannedFrac(_ => 8L)}%.4f " +
      f"scanned_frac_routed=${scannedFrac(q => depths(q))}%.4f")
    assert(cent.count() > 0)
    spark.stop()
  }
}
