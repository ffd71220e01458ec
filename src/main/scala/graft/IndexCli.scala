package graft

import org.apache.spark.sql.functions._

import graft.stats.{GramIndex, IndexStore, TokenIndex}

/** `sbt "runMain graft.BuildIndex <sfDir> [prefix]"` — build the token AND
  * gram indexes over a documents table and persist both as key-bucketed
  * tables, then reload and report: the offline index-build job of the
  * engine.
  */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val prefix = if (args.length > 1) args(1) else "graft_idx"
    val spark = Cli.session()

    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("doc_id").as("doc_idx"), col("text"))
    val idx = TokenIndex.build(corpus, col("text"))
    IndexStore.save(spark, idx, prefix)
    val gidx = GramIndex.build(corpus, col("text"))
    IndexStore.saveGram(spark, gidx, s"${prefix}_gram")

    val loaded = IndexStore.load(spark, prefix)
    val gloaded = IndexStore.loadGram(spark, s"${prefix}_gram")
    println(s"[index] prefix=$prefix docs=${loaded.nDocs} " +
      s"terms=${loaded.termStats.count()} avg_dl=${loaded.avgDl} " +
      s"term_join_shuffle_free=${IndexStore.termJoinIsShuffleFree(spark, prefix)} " +
      s"grams=${gloaded.gramStats.count()} " +
      s"gram_join_shuffle_free=${IndexStore.gramJoinIsShuffleFree(spark, s"${prefix}_gram")}")
    spark.stop()
  }
}

/** `sbt "runMain graft.BuildVectorIndex <sfDir> [outDir]"` — the offline
  * vector-index build job: train the IVF coarse quantizer
  * (SimilarityOps.kmeansModel — fixed-iteration Lloyd k-means), quantize
  * every vector to int8 codes + scale, and write the complete serving
  * artifact set (SimilarityOps.indexArtifacts):
  *
  *   `<out>/vectors`       (vec_id, embedding, codes, scale, pq_codes,
  *                          bq_lo, bq_hi) partitionBy(cluster, ingest_batch)
  *   `<out>/centroids`     (cluster, pos, c) long-form
  *   `<out>/pq_centroids`  residual PQ codebooks
  *   `<out>/bq_mu`         binary tier's centering mean (pos, m)
  *
  * then reload and prove the probe read path: filtering on probed clusters
  * must plan as file-level partition pruning (the 100 TB serving shape —
  * the unprobed partitions are never read). SimilarityOps.annIvfServe /
  * annIvfInt8Serve query THIS output with zero training, amax, or corpus
  * reads at query time; IvfServingSpec pins the contract in-test.
  */
object BuildVectorIndex {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "target/graft_ivf_index"
    val spark = Cli.session()
    graft.operators.SimilarityOps.writeIndex(spark, dir, out)

    val reread = spark.read.parquet(s"$out/vectors")
    val sizes = reread.groupBy("cluster").count().orderBy("cluster").collect()
    val probe = reread.filter(col("cluster").isin(0, 1))
    // The filter must appear INSIDE the PartitionFilters bracket — the
    // whole FileScan renders on one line whose output-attribute list also
    // contains `cluster`, so a substring test on the line would pass even
    // with PartitionFilters: [] (no pruning at all).
    val pruned = """PartitionFilters: \[[^\]]*cluster""".r
      .findFirstIn(probe.queryExecution.executedPlan.toString).isDefined
    println(s"[vindex] out=$out clusters=${sizes.length} " +
      s"sizes=${sizes.map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(",")} " +
      s"probe_partition_pruned=$pruned probe_rows=${probe.count()}")
    spark.stop()
  }
}

/** `sbt "runMain graft.CurateCorpus <sfDir> [outDir]"` — write the
  * corpus-release artifact: run the q113 release pipeline (benchmark
  * slice + verbatim-contamination exclusion gates, then keep-best per
  * near-dup cluster → leakage-safe splits → token-budget fill over train
  * survivors), join the surviving documents' text back on, and write the
  * release `partitionBy(split)` — a training run then reads ONLY the
  * `split=train` directory (file-level pruning), exactly like the vector
  * index's cluster partitions. Prints the per-split manifest.
  */
object CurateCorpus {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "target/graft_release"
    val spark = Cli.session()

    val curated = graft.operators.DedupOps.releasePipeline(spark, dir)
      .filter(col("kept"))
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text", "lang", "source"), "doc_id")
    curated.write.mode("overwrite").partitionBy("split").parquet(out)

    val manifest = spark.read.parquet(out)
      .groupBy("split")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      .orderBy("split").collect()
      .map(r => s"${r.getString(0)}:docs=${r.getLong(1)},tokens=${r.getLong(2)}")
    println(s"[release] out=$out ${manifest.mkString(" ")}")
    spark.stop()
  }
}

/** `sbt "runMain graft.BuildTokenizer <sfDir> [outDir]"` — offline BPE
  * tokenizer training job: learn the merge table on word types
  * (TextAnalysisOps.bpeModel — one corpus shuffle, then vocab-local merge
  * rounds) and write the tokenizer artifact set a serving pipeline ships:
  *
  *   `<out>/merges` (merge_rank, lhs, rhs, merged, pair_count)
  *   `<out>/vocab`  (word, cnt, n_sym) — final symbol count per word type
  *
  * then re-tokenize the corpus from the persisted vocab ALONE
  * (TextAnalysisOps.bpeTokenCountsFrom — a word-keyed join, zero merge
  * rounds at apply time) and prove it equals the in-session q93 frame.
  * The merges file is the portable model (any tokenizer runtime can
  * replay it); the vocab file is the precomputed fast path for corpus
  * tokenization, exactly like the vector index's int8 codes.
  */
object BuildTokenizer {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "target/graft_tokenizer"
    val spark = Cli.session()
    import graft.operators.TextAnalysisOps

    val (merges, vocab) = TextAnalysisOps.bpeModel(spark, dir)
    TextAnalysisOps.bpeMergeTable(spark, dir)
      .write.mode("overwrite").parquet(s"$out/merges")
    vocab.select(col("word"), col("cnt"),
        size(split(trim(col("repr")), " ")).cast("long").as("n_sym"))
      .write.mode("overwrite").parquet(s"$out/vocab")

    val fromArtifact = TextAnalysisOps.bpeTokenCountsFrom(spark, dir,
      spark.read.parquet(s"$out/vocab").select("word", "n_sym"))
    val inSession = TextAnalysisOps.bpeTokenCounts(spark, dir)
    val equal = fromArtifact.exceptAll(inSession).isEmpty &&
      inSession.exceptAll(fromArtifact).isEmpty
    val vstats = spark.read.parquet(s"$out/vocab")
      .agg(count(lit(1)), sum(when(col("n_sym") === 1, 1L).otherwise(0L))).collect()(0)
    println(s"[tokenizer] out=$out merges=${merges.length} " +
      s"word_types=${vstats.getLong(0)} fully_merged_types=${vstats.getLong(1)} " +
      s"apply_from_artifact_equal=$equal")
    spark.stop()
  }
}

/** `sbt "runMain graft.TrainQualityModel <sfDir> [outDir]"` — offline
  * quality-model training job: run the fixed-iteration logistic GD
  * (TextAnalysisOps.qualityLrModel) and persist the COMPLETE model — the
  * 5 weights plus the training corpus's feature mean/std — as a one-row
  * parquet. Freezing the standardization stats is the point: a deployed
  * filter must z-score new documents with TRAINING statistics, not
  * re-derive them from whatever corpus it is scoring. Then reload and
  * prove the serve path (scoreWithQualityModel — a single projection
  * pass, zero aggregates over the scored corpus) reproduces the
  * in-session q91 scores on the training corpus.
  */
object TrainQualityModel {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "target/graft_quality_model"
    val spark = Cli.session()
    import graft.operators.TextAnalysisOps

    TextAnalysisOps.qualityModelArtifact(spark, dir)
      .write.mode("overwrite").parquet(out)

    val served = TextAnalysisOps.scoreWithQualityModel(spark, dir,
      spark.read.parquet(out))
    val inSession = TextAnalysisOps.qualityClassifier(spark, dir)
      .select("doc_id", "p_quality", "pred_label")
    val equal = served.exceptAll(inSession).isEmpty &&
      inSession.exceptAll(served).isEmpty
    val m = spark.read.parquet(out).collect()(0)
    val kept = served.filter(col("pred_label") === 1L).count()
    println(s"[qmodel] out=$out weights=(${m.getAs[Double]("b")}," +
      s"${m.getAs[Double]("w1")},${m.getAs[Double]("w2")}," +
      s"${m.getAs[Double]("w3")},${m.getAs[Double]("w4")}) " +
      s"serve_equals_in_session=$equal kept=$kept of ${served.count()}")
    spark.stop()
  }
}

/** `sbt "runMain graft.AppendVectorIndex <indexDir> <deltaSfDir> [idOffset]"`
  * — incremental index growth: assign a delta of new vectors to the
  * PERSISTED centroids (no retraining), quantize them, and append into
  * the existing `partitionBy(cluster)` files. `idOffset` shifts the
  * delta's vec_ids so a testdata table can stand in for genuinely new
  * vectors. Prints per-cluster growth.
  */
object AppendVectorIndex {
  def main(args: Array[String]): Unit = {
    val idx = if (args.nonEmpty) args(0) else "target/graft_ivf_index"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val offset = if (args.length > 2) args(2).toLong else 1000000L
    val spark = Cli.session()

    val vdir = graft.operators.SimilarityOps.vectorsPath(spark, idx)
    val before = spark.read.parquet(vdir).count()
    val delta = spark.read.parquet(s"$dir/embeddings.parquet")
      .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
    val art = graft.operators.SimilarityOps.appendArtifacts(spark, idx, delta)
      .withColumn("ingest_batch", lit(-1L)) // offline append joins the base tier
      .localCheckpoint(true) // one materialization feeds the write AND the bump
    art.write.mode("append").partitionBy("cluster", "ingest_batch").parquet(vdir)
    // Offline append's artifact twin: fold the DELTA's counts into the
    // cluster_sizes base rows — delta-sized work, no corpus recount (at
    // 100 TB the append must not re-read the table it just grew; the
    // full-recount heal lives in compaction).
    val deltaCounts = art.groupBy("cluster").count().collect()
      .map(r => r.getAs[Number]("cluster").longValue() -> r.getLong(1)).toMap
    graft.operators.SimilarityOps.bumpBaseClusterSizes(spark, idx, deltaCounts)
    art.unpersist(true)

    val after = spark.read.parquet(vdir)
    val sizes = after.groupBy("cluster").count().orderBy("cluster").collect()
    println(s"[vappend] idx=$idx before=$before after=${after.count()} " +
      s"sizes=${sizes.map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(",")}")
    spark.stop()
  }
}

/** `sbt "runMain graft.CompactVectorIndex <indexDir>"` — rewrite the
  * vectors table so each cluster partition holds one file again
  * (incremental appends add a file per append per cluster; serve-time
  * task count and footer overhead grow with append history until
  * compaction pays it down). Rows are untouched; the rewrite lands in a
  * NEW generation directory and the index's 1-line MANIFEST flips to it
  * in one atomic rename — the previous generation is kept until the next
  * full compaction, so concurrent reads can never 404 mid-swap. The
  * streaming ingest path uses the cheaper partition-level
  * SimilarityOps.compactHotClusters instead (hot clusters only).
  */
object CompactVectorIndex {
  def main(args: Array[String]): Unit = {
    val idx = if (args.nonEmpty) args(0) else "target/graft_ivf_index"
    val spark = Cli.session()
    val rowsBefore = spark.read
      .parquet(graft.operators.SimilarityOps.vectorsPath(spark, idx)).count()
    val (fb, fa) = graft.operators.SimilarityOps.compactVectors(spark, idx)
    val rowsAfter = spark.read
      .parquet(graft.operators.SimilarityOps.vectorsPath(spark, idx)).count()
    println(s"[vcompact] idx=$idx files_before=$fb files_after=$fa " +
      s"rows_before=$rowsBefore rows_after=$rowsAfter")
    spark.stop()
  }
}

/** `sbt "runMain graft.SplitVectorIndex <indexDir> [ratio] [maxCells]"`
  * — the geometry panel's rebalance verb (q202 says when imbalance makes
  * the fattest cell bound every probe's latency; q204 says exactly which
  * cells the actuator will take): split cells over ratio × mean 2-way in
  * place via SimilarityOps.splitHotCells — only the hot cells' rows are
  * re-encoded/rewritten, centroids and cluster_sizes swap atomically,
  * and a crash between the two commits heals at the next entry. Single
  * maintenance writer per index, like append/compaction. Prints the
  * executed splits and the before/after cell count + imbalance.
  */
object SplitVectorIndex {
  def main(args: Array[String]): Unit = {
    val idx = if (args.nonEmpty) args(0) else "target/graft_ivf_index"
    val ratio = if (args.length > 1) args(1).toDouble
      else graft.operators.SimilarityOps.SplitRatio
    val maxCells = if (args.length > 2) args(2).toInt
      else graft.operators.SimilarityOps.SplitMaxCells
    val spark = Cli.session()
    def imb(): (Int, Double) = {
      val (sizes, _) = graft.operators.SimilarityOps.indexClusterSizes(spark, idx)
      require(sizes.nonEmpty,
        s"no cluster sizes under $idx — not a built vector index " +
          "(run BuildVectorIndex first)")
      (sizes.size, graft.operators.SimilarityOps.indexImbalance(spark, idx))
    }
    val (k0, i0) = imb()
    val done = graft.operators.SimilarityOps.splitHotCells(
      spark, idx, ratio, maxCells)
    val (k1, i1) = imb()
    println(f"[vsplit] idx=$idx ratio=$ratio%.2f " +
      s"splits=${done.map { case (a, b) => s"$a->$b" }.mkString(",")} " +
      f"K=$k0->$k1 imbalance=$i0%.3f->$i1%.3f")
    spark.stop()
  }
}

/** `sbt "runMain graft.RetrainVectorIndex <indexDir>"` — the terminal
  * maintenance verb: rebuild every learned artifact (coarse centroids,
  * residual PQ codebooks, binary centering mean, all codes) from the
  * index's OWN live rows — base plus every appended/ingested batch —
  * via SimilarityOps.retrainIndex. Run it when q58 cohesion / q142
  * drift / q173 occupancy say incremental repair (append, compaction,
  * hot-cell split) has stopped paying. K resets to the trained
  * baseline; the cutover is ONE atomic manifest commit (r16) — a
  * reader or a crash at any instant sees the complete old geometry or
  * the complete new one — and a killed run is finished by re-running
  * (idempotent from live rows). An optional second arg trains the
  * quantizer on a deterministic md5 hash-sample of the live rows
  * (e.g. 0.25) and pays the full corpus only in the encode pass —
  * the 100 TB shape. Single maintenance writer per index, like
  * append/compaction/split.
  */
object RetrainVectorIndex {
  def main(args: Array[String]): Unit = {
    val idx = if (args.nonEmpty) args(0) else "target/graft_ivf_index"
    val frac = if (args.length > 1) args(1).toDouble else 1.0
    // Optional graduated K (r17 stretch): retrain at the given cluster
    // count instead of resetting to KmeansK — e.g. the K splits had
    // grown, so post-retrain cells start at the observed density.
    val k = if (args.length > 2) args(2).toInt
      else graft.operators.SimilarityOps.KmeansK
    val spark = Cli.session()
    val rowsBefore = spark.read
      .parquet(graft.operators.SimilarityOps.vectorsPath(spark, idx)).count()
    val (kb, ka) = graft.operators.SimilarityOps.retrainIndex(
      spark, idx, trainFraction = frac, k = k)
    val after = spark.read
      .parquet(graft.operators.SimilarityOps.vectorsPath(spark, idx))
    println(f"[vretrain] idx=$idx K=$kb->$ka rows_before=$rowsBefore " +
      f"rows_after=${after.count()} imbalance=" +
      f"${graft.operators.SimilarityOps.indexImbalance(spark, idx)}%.3f")
    spark.stop()
  }
}

/** `sbt "runMain graft.DeleteVectors <indexDir> <id[,id...]>"` — the
  * bounded removal verb (takedown / right-to-be-forgotten): physically
  * rewrite ONLY the owning (cluster, ingest_batch) partitions minus the
  * ids, artifact twins decremented under the writer lock. Idempotent —
  * re-running with the same ids removes 0 rows.
  */
object DeleteVectors {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DeleteVectors <indexDir> <id[,id...]>")
    val idx = args(0)
    val ids = args(1).split(",").map(_.trim.toLong).toSeq
    val spark = Cli.session()
    val removed = graft.operators.SimilarityOps.deleteVectors(spark, idx, ids)
    println(s"[vdelete] idx=$idx ids=${ids.size} rows_removed=$removed " +
      s"rows_after=${spark.read
        .parquet(graft.operators.SimilarityOps.vectorsPath(spark, idx)).count()}")
    spark.stop()
  }
}

/** `sbt "runMain graft.AnchorIndex <indexDir>"` — one-shot occupancy
  * anchor for PRE-r17 indexes (r18 — VERDICT r17 #6): the horizon-free
  * drift TVD compares current occupancy against the `.occupancy_baseline`
  * snapshot that build/retrain/split write — an index built before that
  * verb landed has no snapshot until its NEXT geometry verb, which is
  * precisely the window a drifting index needs the trigger in. This verb
  * closes the migration window: snapshot the CURRENT occupancy (K rows,
  * no retrain, no data pass — the cluster_sizes artifact read) as the
  * anchor. Idempotent; a no-op difference from a fresh build's own
  * anchor (Round18Spec pins fold-surviving TVD parity).
  */
object AnchorIndex {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnchorIndex <indexDir>")
    val idx = args(0)
    val spark = Cli.session()
    import graft.operators.SimilarityOps
    SimilarityOps.writeOccupancyBaseline(spark, idx)
    val k = SimilarityOps.readOccupancyBaseline(spark, idx).map(_.size).getOrElse(0)
    val tvd = SimilarityOps.indexOccupancyTvd(spark, idx)
    println(s"[anchor] idx=$idx clusters=$k tvd_after_anchor=$tvd")
    spark.stop()
  }
}

/** `sbt "runMain graft.ServeVectorIndex <indexDir> [sfDir]"` — the ANN
  * serving entry point: answer a query from the PERSISTED index alone
  * (BuildVectorIndex output) — float tier and int8 tier — with the probe
  * read planned as file-level partition pruning. The query vector is
  * fetched once from the corpus (standing in for the query arriving with
  * the request); everything after that touches only index files.
  */
object ServeVectorIndex {
  def main(args: Array[String]): Unit = {
    val idx = if (args.nonEmpty) args(0) else "target/graft_ivf_index"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Cli.session()
    import graft.operators.SimilarityOps

    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === SimilarityOps.QueryVecId)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

    // Serves at the declared operating point (nprobe = NProbeServe,
    // recall@50 >= 0.8 — see the q79 curve).
    val served = SimilarityOps.annIvfServe(spark, idx, qv)
    val pruned = """PartitionFilters: \[[^\]]*cluster""".r
      .findFirstIn(served.queryExecution.executedPlan.toString).isDefined
    val top = served.limit(5).collect()
      .map(r => s"${r.getAs[Long]("vec_id")}:${r.getAs[Double]("cos")}")
    val top8 = SimilarityOps.annIvfInt8Serve(spark, idx, qv).limit(5).collect()
      .map(r => s"${r.getAs[Long]("vec_id")}:${r.getAs[Double]("qcos")}")
    val topPq = SimilarityOps.annPqServe(spark, idx, qv).limit(5).collect()
      .map(r => s"${r.getAs[Long]("vec_id")}:${r.getAs[Double]("adist")}")
    val topBin = SimilarityOps.annBinaryServe(spark, idx, qv).limit(5).collect()
      .map(r => s"${r.getAs[Long]("vec_id")}:${r.getAs[Double]("cos")}")
    println(s"[vserve] idx=$idx nprobe=${SimilarityOps.NProbeServe} " +
      s"probe_partition_pruned=$pruned " +
      s"float_top5=${top.mkString(",")} int8_top5=${top8.mkString(",")} " +
      s"pq_top5=${topPq.mkString(",")} binary_top5=${topBin.mkString(",")}")
    spark.stop()
  }
}

/** `sbt "runMain graft.TierPass <sfDir> [stateDir]"` — one pass of the
  * vector-tier bandit THROUGH the persisted state store
  * (SimilarityOps.tierPass): load the current weights, run the q185
  * recall panel, fold, ADD the fold to the loaded weights, save, and
  * print the panel's routing census under the pre- and post-pass
  * weights. Run it twice against the same stateDir and the second
  * invocation starts from the first's weights and routes differently —
  * the reference's evaluate.py pass-1 → pass-2 arc (BASELINE.md rows
  * 1-2) on the serving tiers. q187 remains the oracle-gated
  * deterministic twin (always exactly one fold applied to zero); THIS
  * is the accumulating production loop.
  */
object TierPass {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val stateDir = if (args.length > 1) args(1) else "target/graft_tier_pass"
    val spark = Cli.session()
    val (w0, w1, c0, c1) =
      graft.operators.SimilarityOps.tierPass(spark, dir, stateDir)
    def fmt(m: Map[String, Long]): String =
      m.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
    println(s"[tierpass] state_dir=$stateDir w_before=${fmt(w0)} " +
      s"w_after=${fmt(w1)} census_before=${fmt(c0)} census_after=${fmt(c1)}")
    spark.stop()
  }
}
