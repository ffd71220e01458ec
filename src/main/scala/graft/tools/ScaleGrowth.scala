package graft.tools

import graft.operators.Memos

/** `sbt "runMain graft.tools.ScaleGrowth [passes]"` — the measured
  * scale-growth checkpoint (VERDICT r7 #7): time the five most expensive
  * declared queries at sf0.001 / sf0.01 / sf0.1 and fit the growth
  * exponent α in t ∝ SFᵅ from the log-log slope between consecutive SFs,
  * verifying SCALE.md's structural claims empirically — q97's cost is
  * dominated by corpus-size-independent matrix work (α ≈ 0 between the
  * larger SFs), the curation/calibration family near-linear (α ≈ 1 or
  * below once constant train cost amortizes).
  *
  * This is also the between-corpora memo-lifecycle consumer Bench's
  * release comment points at: after each SF's timings, `Memos.release`
  * unpersists every memoized frame for that dir before the next SF
  * builds its own (VERDICT r7 #2) — a long-lived multi-tenant session's
  * exact shape. Dev tool: prints a markdown table for SCALE.md. */
object ScaleGrowth {
  val Queries = Seq("q97_pca_top_component", "q82_curation_pipeline",
    "q94_learned_curation", "q95_classifier_calibration", "q88_source_overlap",
    // round-8 additions worth a growth checkpoint: DSIR (one corpus-keyed
    // shuffle + B-row broadcasts), known-item eval (panel grows WITH the
    // corpus — expect alpha near the superlinear panel x candidates
    // bound), QL ranking (one posting join, like BM25).
    "q115_dsir_weights", "q125_known_item_eval", "q121_ql_topk",
    // second-wave round-8 additions: the ranker comparison's dl-histogram
    // decomposition should keep q148 at candidate volume even as panel
    // AND corpus grow together; q138 rides the pair x signature join
    // (candidate-volume bound); q145 is metadata-scale past q49's labels.
    "q148_ranker_comparison", "q138_minhash_calibration",
    "q145_cluster_size_spectrum",
    // round-9 additions: the fixpoint propagation (rounds = component
    // diameter — expect α near the bounded q49 path's, since testdata
    // converges in ≤ 3 rounds) and the batched serving panel (panel
    // fixed, corpus grows: α tracks the probed-cluster scan).
    "q159_dup_clusters_fixpoint", "q160_ann_ivf_panel",
    // round-15 additions: the serve-economics censuses. Panel-sized by
    // design, so α ≈ 0 IS the structural claim — per-query routing cost
    // must not grow with the corpus (features are |Q|×K arithmetic over
    // broadcast centroids; coverage reads the size artifact; the slice
    // collapse is census work) — and the split plan is one K-key count
    // over the memoized assignment.
    "q200_tier_route_batch", "q201_tier_route_pass2_batch",
    "q202_cluster_size_skew", "q203_tier_route_slice", "q204_split_plan",
    // round-16 additions: the learned-state slice collapse (q201's fold
    // stack + q203's census — α should track q201's, the fold's recall
    // panel being the corpus-bound part) and the probe-depth plan
    // (pure census arithmetic over tierFeatures — α ≈ 0 is the claim).
    "q206_tier_route_slice_pass2", "q207_probe_depth_plan",
    // round-17 additions: the filtered-serve census (arms run over
    // their routed slices — pre is sel·N exact cosine, post the probed
    // shortlist, so α should track the q160 panel-scan shape), the
    // composed tier×depth table (a projection over q203/q207 frames —
    // α ≈ 0 is the claim), and the hybrid-serve panel (two dense
    // ranking passes + RRF — the q29 shape batched over 5 queries).
    "q208_filtered_serve_plan", "q209_tier_depth_plan",
    "q210_hybrid_serve_plan",
    // round-18 additions: the composed filter×tier census (q208's arms
    // + the q203 route — slice-bound like both parents), the
    // generalized-payload census (marginals are |vocab|- and 16-row
    // broadcasts; the three shape stacks run over routed slices), and
    // the six-arm census (q203's arithmetic + one |vocab|-row text
    // feature join — α ≈ 0 is the claim).
    "q211_filter_tier_plan", "q212_payload_filter_plan",
    "q213_text_route_plan", "q214_payload_tier_plan")
  val Dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 2
    val spark = graft.Cli.session()
    val fns = graft.SparkEntry.queries

    val rows = Dirs.map { dir =>
      // Untimed warmup (memo builds + JIT), then min over timed passes —
      // Bench's steady-state protocol.
      Queries.foreach(n => fns(n)(spark, dir).count())
      val t = Queries.map { name =>
        val ts = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          fns(name)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        name -> ts.min
      }.toMap
      val released = Memos.release(dir)
      println(s"[scale] $dir done, released $released memo entries")
      dir -> t
    }

    val sfOf = Dirs.map(d => d -> d.split("sf").last.toDouble).toMap
    println("| query | " + Dirs.map(_.split("/").last).mkString(" | ") +
      " | alpha(0.001->0.01) | alpha(0.01->0.1) |")
    println("|---|" + ("---|" * (Dirs.size + 2)))
    Queries.foreach { name =>
      val ts = rows.map { case (d, t) => t(name) }
      def alpha(i: Int) = math.log(ts(i + 1) / ts(i)) /
        math.log(sfOf(Dirs(i + 1)) / sfOf(Dirs(i)))
      println(f"| $name | " + ts.map(t => f"$t%.2f").mkString(" | ") +
        f" | ${alpha(0)}%.2f | ${alpha(1)}%.2f |")
    }
    spark.stop()
  }
}
