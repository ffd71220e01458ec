package graft.tools

import graft.operators.SimilarityOps

/** Dev tool: sweep the Lloyd iteration count and print the recall/nprobe
  * curve per depth — the measurement that picked SimilarityOps.KmeansIters
  * (the plateau) and the declared serving operating point.
  * `sbt "runMain graft.tools.RecallSweep [sfDir]"`.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Cli.session()
    for (iters <- Seq(1, 2, 3, 4, 6, 8, 12)) {
      val (cent, asg) = SimilarityOps.trainKmeans(spark, dir, iters)
      val curve = SimilarityOps.recallCurveFor(spark, dir, cent, asg)
        .orderBy("nprobe").collect()
        .map(r => s"np${r.getAs[Long]("nprobe")}=${r.getAs[Double]("recall")}")
      println(s"[sweep] iters=$iters ${curve.mkString(" ")}")
    }
    spark.stop()
  }
}
