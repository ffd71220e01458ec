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

    time("census_batch20_ms") {
      SimilarityOps.servedTierFeatures(spark, idx, qdf).collect()
    }
    time("routed_batch20_ms") {
      SimilarityOps.routeAndServe(spark, idx, qdf).collect()
    }
    time("routed_batchcost_batch20_ms") {
      SimilarityOps.routeAndServe(spark, idx, qdf, batchCost = true).collect()
    }
    // r15: the SHIPPED streaming-auto dispatch — batch prices + the q203
    // slice collapse (sub-economic arms fold, fewer plans open).
    time("routed_slice_batch20_ms") {
      SimilarityOps.routeAndServe(spark, idx, qdf, batchCost = true,
        sliceAware = true).collect()
    }
    // r14 stretch: the lazy union (one action materializes every tier
    // subtree in one job) vs the eager per-tier checkpoint dispatch.
    time("routed_batch20_lazy_ms") {
      SimilarityOps.routeAndServe(spark, idx, qdf, lazyUnion = true).collect()
    }
    time("routed_batchcost_batch20_lazy_ms") {
      SimilarityOps.routeAndServe(spark, idx, qdf, batchCost = true,
        lazyUnion = true).collect()
    }
    // Per-tier batch-of-20 rows — the q200 penalty inputs, re-measured
    // here after the r14 int8 rewrite so the census can be re-pinned
    // from the shipped plans' actual prices.
    time("float_batch20_ms") {
      SimilarityOps.annIvfServeMany(spark, idx, qdf).collect()
    }
    time("binary_batch20_ms") {
      SimilarityOps.annBinaryServeMany(spark, idx, qdf).collect()
    }
    time("int8_batch20_ms") {
      SimilarityOps.annInt8ServeMany(spark, idx, qdf).collect()
    }
    time("pq_batch20_ms") {
      SimilarityOps.annPqServeMany(spark, idx, qdf).collect()
    }
    time("pq_rerank_batch20_ms") {
      SimilarityOps.annPqRerankServeMany(spark, idx, qdf).collect()
    }
    time("float_single_ms") {
      SimilarityOps.annIvfServe(spark, idx, panel.head._2).collect()
    }
    time("int8_single_ms") {
      SimilarityOps.annIvfInt8Serve(spark, idx, panel.head._2).collect()
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
    // Remaining per-tier 1-row batch floors (r15): the arm-OPENING price
    // each tier pays when a routed slice dispatches it at all — the
    // input to q203's slice-size-aware census (open_floor/|slice| is the
    // unamortized part the batch-of-20 penalties can't see).
    time("binary_1row_batch_ms") {
      SimilarityOps.annBinaryServeMany(spark, idx, one).collect()
    }
    time("int8_1row_batch_ms") {
      SimilarityOps.annInt8ServeMany(spark, idx, one).collect()
    }
    time("pq_1row_batch_ms") {
      SimilarityOps.annPqServeMany(spark, idx, one).collect()
    }
    spark.stop()
  }
}
