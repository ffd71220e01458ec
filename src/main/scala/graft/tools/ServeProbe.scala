package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** `runMain graft.tools.ServeProbe [sfDir]` — serve-path measurement
  * harness for the round-13 levers, run OUTSIDE the full bench so a
  * change can be priced in minutes:
  *   - `routed_batch20_ms`: routeAndServe over the NPanel panel
  *     (measures the concurrent per-tier dispatch vs the sequential
  *     union the r13 artifact priced at 2.8 s);
  *   - `routed_batchcost_batch20_ms`: the same under q200's batch
  *     prices (fewer, cheaper arms typically present);
  *   - `float_1row_batch_ms` vs `float_single_ms`: whether collapsing
  *     the probe collect into one dynamic-pruning plan (ServeMany with
  *     a 1-row frame) beats the two-job single-request tier — decides
  *     whether a resident loop should funnel singles through the
  *     batched plan.
  * Each number is a min of 5 after a warmup pass.
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Cli.session()
    graft.Cli.quietBoundedWindowWarnings()
    import spark.implicits._

    val idx = java.nio.file.Files.createTempDirectory("graft_serve_probe").toString
    SimilarityOps.writeIndex(spark, dir, idx)

    val panel = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < SimilarityOps.NPanel)
      .orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qdf = panel.toSeq.toDF("query_id", "embedding")
    val one = Seq(panel.head).toDF("query_id", "embedding")

    def time(tag: String)(run: => Unit): Unit = {
      run // warmup
      val ms = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e6
      }.min
      println(f"""[serveprobe] "$tag": $ms%.1f""")
    }

    time("routed_batch20_ms") {
      SimilarityOps.routeAndServe(spark, idx, qdf).collect()
    }
    time("routed_batchcost_batch20_ms") {
      SimilarityOps.routeAndServe(spark, idx, qdf, batchCost = true).collect()
    }
    time("float_single_ms") {
      SimilarityOps.annIvfServe(spark, idx, panel.head._2).collect()
    }
    time("float_1row_batch_ms") {
      SimilarityOps.annIvfServeMany(spark, idx, one).collect()
    }
    time("pq_rerank_single_ms") {
      SimilarityOps.annPqRerankServe(spark, idx, panel.head._2).collect()
    }
    time("pq_rerank_1row_batch_ms") {
      SimilarityOps.annPqRerankServeMany(spark, idx, one).collect()
    }
    spark.stop()
  }
}
