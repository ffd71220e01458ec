package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.CosineSimilarity.cosineSim
import graft.operators.SimilarityOps

/** `runMain graft.tools.FilterProbe [sfDir]` — the measured
  * recall/latency table for filtered ANN serving (VERDICT r16 #1's done
  * criterion): a LOW-selectivity predicate (`label = own`, sel ≈ 0.1)
  * and a HIGH-selectivity one (`label <= 8`, sel ≈ 0.9), each answered
  * by the forced pre arm, the forced post arm, and the shipped auto
  * dispatch. Recall is against the exact filtered cosine truth;
  * latency is batch-of-NPanel min-of-5 after warmup (ProbeUtil
  * protocol). Also prints the scanned-row fractions — the term that
  * grows into the scan bound at 100 TB, where wall time at sf0.1 is
  * plan-floor-dominated.
  */
object FilterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Cli.session()
    graft.Cli.quietBoundedWindowWarnings()

    val idx = java.nio.file.Files.createTempDirectory("graft_filter").toString
    SimilarityOps.writeIndex(spark, dir, idx)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def queriesOf(flabelCol: org.apache.spark.sql.Column) =
      e.filter(col("vec_id") < SimilarityOps.NPanel)
        .select(col("vec_id").as("query_id"), col("embedding"),
          flabelCol.cast("long").as("flabel"))
        .localCheckpoint(true)
    // Low selectivity: each query filters to its own label (~10%).
    val lowQ = queriesOf(col("label"))
    // High selectivity: label <= 8 (~90%) for every query.
    val highQ = queriesOf(lit(8))

    def truthOf(qdf: org.apache.spark.sql.DataFrame, op: String): Map[Long, Set[Long]] =
      e.select(col("vec_id"), col("label").cast("long").as("vl"), col("embedding"))
        .join(broadcast(qdf.select(col("query_id"), col("embedding").as("qe"),
          col("flabel"))),
          if (op == "eq") col("vl") === col("flabel") else col("vl") <= col("flabel"))
        .select(col("query_id"), col("vec_id"),
          cosineSim(col("embedding"), col("qe")).as("cos"))
        .withColumn("rank", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id").asc)))
        .filter(col("rank") <= SimilarityOps.TopK)
        .collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }

    def run(tag: String, qdf: org.apache.spark.sql.DataFrame, op: String): Unit = {
      val truth = truthOf(qdf, op)
      Seq("pre", "post", "auto").foreach { s =>
        val ms = ProbeUtil.timedMinMs(
          SimilarityOps.annIvfServeManyFiltered(spark, idx, qdf,
            op = op, strategy = s).collect())
        val rows = SimilarityOps.annIvfServeManyFiltered(spark, idx, qdf,
          op = op, strategy = s).collect()
        val recall = truth.keys.toSeq.map { q =>
          val got = rows.filter(_.getAs[Long]("query_id") == q)
            .map(_.getAs[Long]("vec_id")).toSet
          (got & truth(q)).size.toDouble / truth(q).size
        }
        val strategies = rows.map(_.getAs[String]("strategy")).distinct.sorted
        println(f"[filter] $tag strategy=$s%-4s batch_ms=$ms%.1f " +
          f"recall=${recall.sum / recall.size}%.4f " +
          s"arms=${strategies.mkString("+")}")
      }
    }
    run("low_sel_eq_own  ", lowQ, "eq")
    run("high_sel_le_8   ", highQ, "le")

    // Scanned-row fractions (per query, relative to the corpus): the
    // pre arm reads sel·N rows; the post arm reads the probe fraction.
    // Per-tier post-arm recall AT THE DISPATCH BOUNDARY (r18 — VERDICT
    // r17 #1's done criterion): a predicate just ABOVE sel = 1/overfetch
    // (label <= 2, sel ≈ 0.3 on the 10-label corpus) is the lowest
    // selectivity the auto dispatch still answers post — the worst case
    // the rule admits per tier. Recall compounds the tier's own
    // shortlist fidelity with the overfetch coverage; the float row is
    // the pure coverage term the q208 cliff table already measured.
    val boundaryQ = queriesOf(lit(2))
    val truthB = truthOf(boundaryQ, "le")
    SimilarityOps.Tiers.foreach { t =>
      def serveB() = SimilarityOps.tierServeManyFiltered(
        spark, idx, boundaryQ, tier = t, op = "le", strategy = "post")
      val ms = ProbeUtil.timedMinMs(serveB().collect())
      val rows = serveB().collect()
      val recall = truthB.keys.toSeq.map { q =>
        val got = rows.filter(_.getAs[Long]("query_id") == q)
          .map(_.getAs[Long]("vec_id")).toSet
        (got & truthB(q)).size.toDouble / truthB(q).size
      }
      println(f"[filter] tier=$t%-9s post@boundary sel~0.3 batch_ms=$ms%.1f " +
        f"recall=${recall.sum / recall.size}%.4f")
    }

    val (sizes, ntot) = SimilarityOps.indexClusterSizes(spark, idx)
    val lsz = SimilarityOps.indexLabelSizes(spark, idx)
    val selLow = lsz.values.map(_.toDouble / ntot).sum / lsz.size
    val selHigh = lsz.filter(_._1 <= 8L).values.sum.toDouble / ntot
    val cranks = SimilarityOps.crankFrameFor(spark, idx, lowQ)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Number]("cluster").longValue(), r.getAs[Int]("crank")))
    val postFrac = cranks.collect {
      case (_, c, k) if k <= SimilarityOps.NProbeServe => sizes.getOrElse(c, 0L)
    }.sum.toDouble / (ntot.toDouble * SimilarityOps.NPanel)
    println(f"[filter] scanned_frac pre_low=$selLow%.4f pre_high=$selHigh%.4f " +
      f"post=$postFrac%.4f (post is the probe fraction at ANY selectivity; " +
      "at production K it is nprobe/K ≪ sel_high)")
    spark.stop()
  }
}
