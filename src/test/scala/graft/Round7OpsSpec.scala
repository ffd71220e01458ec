package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, MultimodalOps, SimilarityOps}

/** Round-7 operator behavior that the oracle gate can't express:
  * planted-contamination separation between the three decontamination
  * tiers, dHash locality, and the recall-curve invariants.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Write a crafted documents table and return its dir. */
  private def plantedDir(): String = {
    val out = java.nio.file.Files.createTempDirectory("graft_planted").toString
    val alpha = (0 until 20).map(i => s"alpha$i")
    val bench = alpha.mkString(" ") // doc 97: the "benchmark" doc (97 % 97 == 0)
    // doc 1: a long doc QUOTING 8 consecutive benchmark tokens — verbatim
    // contamination. Jaccard vs bench ≈ 6/68 ≈ 0.09, far below q43's 0.30.
    val quoted = ((0 until 30).map(i => s"uniq$i") ++
      alpha.slice(5, 13) ++ (0 until 20).map(i => s"tail$i")).mkString(" ")
    // doc 2: three SCATTERED 3-token benchmark phrases — shares 3 distinct
    // 3-shingles (q45 flags it) but no 8-token contiguous window.
    val scattered = (alpha.slice(0, 3) ++ (0 until 10).map(i => s"fillA$i") ++
      alpha.slice(7, 10) ++ (0 until 10).map(i => s"fillB$i") ++
      alpha.slice(14, 17) ++ (0 until 10).map(i => s"fillC$i")).mkString(" ")
    val clean = (0 until 40).map(i => s"clean$i").mkString(" ")
    Seq((97L, bench), (1L, quoted), (2L, scattered), (3L, clean))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  test("q83 catches planted verbatim quotes that q43 misses; q45 over-flags scatter") {
    val dir = plantedDir()

    // q83: exactly the verbatim-quoting doc, nothing else.
    val flagged = DedupOps.verbatimDecontamination(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(flagged == Set(1L), s"q83 flagged $flagged, expected {1}")

    // q43 (shingle-set Jaccard at 0.30) misses the quote entirely.
    val jpairs = DedupOps.jaccardPairs(spark, dir)
      .filter(col("doc_a") === 97L || col("doc_b") === 97L).count()
    assert(jpairs == 0L, "q43 unexpectedly caught the quote pair")

    // q45 (>= 3 scattered 3-shingles) flags BOTH the quote and the
    // scattered doc — the precision gap contiguity closes.
    val overlap = DedupOps.decontamination(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(overlap == Set(1L, 2L), s"q45 flagged $overlap, expected {1, 2}")
  }

  test("dHash: identical payloads collide at hamming 0; near-identical stay close") {
    val out = java.nio.file.Files.createTempDirectory("graft_dhash").toString
    val base = (0 until 80).map(i => s"tok${i % 13} word$i").mkString(" ")
    // One byte-level edit deep inside the payload: most downsample points
    // see the same bytes, so the gradient fingerprint moves only a little.
    val nearDup = base.replace("word40", "word41")
    Seq((10L, base), (11L, base), (12L, nearDup))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val pairs = MultimodalOps.imageNearDups(spark, out).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(pairs.get((10L, 11L)).contains(0L), s"identical pair: $pairs")
    assert(pairs.contains((10L, 12L)) && pairs((10L, 12L)) <= 12L,
      s"near-dup pair missing/far: $pairs")
  }

  test("native char-entropy expressions equal the shuffled DataFrame derivation") {
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps
    val native = TextAnalysisOps.charEntropy(spark, dir)
    val shuffled = TextAnalysisOps.charEntropyShuffled(spark, dir)
    assert(native.count() > 0)
    assert(native.exceptAll(shuffled).isEmpty && shuffled.exceptAll(native).isEmpty)

    // SQL registration plans the same expression.
    graft.functions.GraftExtensions.register(spark)
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("r7docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  coalesce(char_distinct(text), 0L) AS n_distinct_chars,
        |  floor((coalesce(char_entropy_nats_neg(text), 0.0d) / 0.6931471805599453d)
        |        * 1000000 + 0.5) / 1000000 AS entropy_bits
        |FROM r7docs""".stripMargin)
    assert(viaSql.exceptAll(native).isEmpty && native.exceptAll(viaSql).isEmpty)
  }

  test("q84 merges overlapping dup spans; straddling windows stay unique") {
    val out = java.nio.file.Files.createTempDirectory("graft_spans").toString
    // A and B share a 7-token run ("shared0..shared6") planted mid-doc.
    // Only the 3 windows fully inside the run are duplicated (straddling
    // windows mix in unique context), so merged coverage is exactly the
    // 7 run tokens, one run. C is all-unique → zero coverage.
    val shared = (0 until 7).map(i => s"shared$i")
    val a = ((0 until 10).map(i => s"ua$i") ++ shared ++ (0 until 5).map(i => s"va$i"))
    val b = ((0 until 10).map(i => s"ub$i") ++ shared ++ (0 until 5).map(i => s"vb$i"))
    val c = (0 until 22).map(i => s"uc$i")
    Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")), (3L, c.mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val rows = DedupOps.repeatedSpans(spark, out).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_tokens"), r.getAs[Long]("n_runs")))).toMap
    assert(rows(1L) == ((7L, 1L)), s"doc 1: ${rows(1L)}")
    assert(rows(2L) == ((7L, 1L)), s"doc 2: ${rows(2L)}")
    assert(rows(3L) == ((0L, 0L)), s"doc 3: ${rows(3L)}")
  }

  test("q85 flags incoming exact copies, passes novel docs with no candidates") {
    val out = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val retained = (0 until 30).map(i => s"ret$i").mkString(" ")
    val novel = (0 until 30).map(i => s"new$i").mkString(" ")
    Seq((1L, retained, "src0"), (2L, retained, DedupOps.IncomingSource),
        (3L, novel, DedupOps.IncomingSource))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val rows = DedupOps.incrementalDedup(spark, out).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("best_match"), r.getAs[Double]("best_jaccard"),
          r.getAs[Boolean]("is_dup")))).toMap
    assert(rows(2L) == ((1L, 1.0, true)), s"copy verdict: ${rows(2L)}")
    assert(rows(3L) == ((-1L, 0.0, false)), s"novel verdict: ${rows(3L)}")
    assert(!rows.contains(1L), "retained doc leaked into the incoming report")
  }

  test("q86 verdicts are cell-consistent: dup_of is a lower id in the same cell") {
    val dir = "/root/testdata/sf0.001"
    val rows = SimilarityOps.semanticDedup(spark, dir).collect()
    val cluster = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val dropped = rows.filterNot(_.getAs[Boolean]("kept"))
    assert(dropped.nonEmpty, "threshold too high: nothing deduplicated")
    assert(dropped.length < rows.length, "threshold too low: everything deduplicated")
    dropped.foreach { r =>
      val (v, dupOf) = (r.getAs[Long]("vec_id"), r.getAs[Long]("dup_of"))
      assert(dupOf >= 0 && dupOf < v, s"dup_of $dupOf !< vec $v")
      assert(cluster(dupOf) == cluster(v), s"dup_of $dupOf crosses cells from $v")
    }
    // The lowest id of every cell can never be dropped (no lower id exists).
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (c, rs) =>
      val lowest = rs.minBy(_.getAs[Long]("vec_id"))
      assert(lowest.getAs[Boolean]("kept"), s"cell $c dropped its lowest id")
    }
  }

  test("q87 recovers slope ~ -1 on a planted Zipf corpus") {
    val out = java.nio.file.Files.createTempDirectory("graft_zipf").toString
    // Term i (i = 1..16) appears round(512/i) times: ln(freq) = ln 512 - ln(rank).
    val words = (1 to 16).flatMap(i => Seq.fill(math.round(512.0 / i).toInt)(f"zipf$i%02d"))
    // Spread across a few docs (the fit is corpus-global, split is irrelevant).
    val docsRows = words.grouped(200).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
    docsRows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val r = graft.operators.TextAnalysisOps.zipfSlope(spark, out).collect().head
    val (slope, r2) = (r.getAs[Double]("slope"), r.getAs[Double]("r2"))
    assert(math.abs(slope - (-1.0)) < 0.05, s"slope $slope not ~ -1")
    assert(r2 > 0.99, s"r2 $r2 not ~ 1")
    assert(r.getAs[Long]("n_terms") == 16L)
  }

  test("q89 counts and scrubs planted PII; clean text passes through unchanged") {
    val out = java.nio.file.Files.createTempDirectory("graft_pii").toString
    val dirty = "contact Bob.Smith+x@example.co.uk or 10.0.255.7 " +
      "ssn 123-45-6789 tel +1 (415) 555-0134 end"
    val clean = "no personal data here just words and the number 42"
    Seq((1L, dirty), (2L, clean)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val rows = graft.operators.TextAnalysisOps.piiScrub(spark, out)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val d = rows(1L)
    assert((d.getAs[Long]("n_emails"), d.getAs[Long]("n_ips"),
      d.getAs[Long]("n_ssns"), d.getAs[Long]("n_phones")) == ((1L, 1L, 1L, 1L)),
      s"counts: $d")
    assert(d.getAs[Boolean]("has_pii"))
    // The scrub replaces every category: its md5 equals the hand-scrubbed text's.
    val expected = "contact <email> or <ip> ssn <ssn> tel <phone> end"
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d.getAs[String]("scrubbed_md5") == expectedMd5, "scrub mismatch")
    val c = rows(2L)
    assert(!c.getAs[Boolean]("has_pii") && c.getAs[Long]("n_ips") == 0L)
    val cleanMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(c.getAs[String]("scrubbed_md5") == cleanMd5, "clean text altered")
  }

  test("q91 classifier separates its weak labels well beyond chance") {
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps
    val rows = TextAnalysisOps.qualityClassifier(spark, dir).collect()
    val acc = rows.count(r =>
      r.getAs[Long]("pred_label") == r.getAs[Long]("weak_label")).toDouble / rows.length
    assert(acc >= 0.9, s"accuracy $acc below the 0.9 pin (sweep plateau 0.96)")
    // Non-degenerate: both predicted classes occur, and probabilities
    // actually order the classes (mean p | y=1 > mean p | y=0).
    val preds = rows.map(_.getAs[Long]("pred_label")).toSet
    assert(preds == Set(0L, 1L), s"degenerate predictions: $preds")
    def meanP(y: Long) = {
      val g = rows.filter(_.getAs[Long]("weak_label") == y)
      g.map(_.getAs[Double]("p_quality")).sum / g.length
    }
    assert(meanP(1L) > meanP(0L) + 0.2,
      s"probability separation too weak: ${meanP(1L)} vs ${meanP(0L)}")
  }

  test("q92 learns the planted top merge; pair counts are non-increasing") {
    val out = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    import graft.operators.TextAnalysisOps
    // "ee" x100 makes (e,e) the unambiguous first merge; the 14-char word
    // (13 adjacent pairs, 50 copies) feeds the remaining 11 fixed rounds.
    val text = (Seq.fill(100)("ee") ++ Seq.fill(50)("zyxwvutsrqponm")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val merges = TextAnalysisOps.bpeMergeTable(spark, out).orderBy("merge_rank").collect()
    assert(merges.length == TextAnalysisOps.BpeMerges)
    val first = merges.head
    assert((first.getAs[String]("lhs"), first.getAs[String]("rhs"),
      first.getAs[String]("merged"), first.getAs[Long]("pair_count")) ==
      (("e", "e", "ee", 100L)), s"first merge: $first")
    // Classic BPE invariant: the winning pair count never increases —
    // a merge can only create pairs at most as frequent as itself.
    val counts = merges.map(_.getAs[Long]("pair_count")).toSeq
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a },
      s"pair counts increased: $counts")
  }

  test("q93 token counts are consistent with q31 and compress under merges") {
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps
    val bpe = TextAnalysisOps.bpeTokenCounts(spark, dir)
    val q31 = TextAnalysisOps.tokenCounts(spark, dir)
      .select(col("doc_id"), col("n_word_tokens"))
    val joined = bpe.join(q31, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (w, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("bpe_tokens"))
      // Same tokenizer as q31's regex count, and every word is >= 1 symbol.
      assert(w == r.getAs[Long]("n_word_tokens"),
        s"doc ${r.getAs[Long]("doc_id")}: q93 words $w != q31 ${r.getAs[Long]("n_word_tokens")}")
      assert(t >= w, s"doc ${r.getAs[Long]("doc_id")}: $t BPE tokens < $w words")
    }
    // The learned merges must actually compress: strictly fewer BPE tokens
    // than raw characters-in-words corpus-wide.
    val totalBpe = joined.map(_.getAs[Long]("bpe_tokens")).sum
    val totalWords = joined.map(_.getAs[Long]("n_words")).sum
    assert(totalBpe < joined.map(r => r.getAs[Long]("n_chars")).sum)
    assert(totalBpe > totalWords, "12 merges cannot collapse every word to one symbol")
  }

  test("tokenizer OOV fallback: unseen words segment to characters, not dropped") {
    import graft.operators.TextAnalysisOps
    // Vocab trained elsewhere knows only "abc" (2 symbols). The scored
    // corpus has one known word and two unseen ones.
    val vocab = Seq(("abc", 2L)).toDF("word", "n_sym")
    val out = java.nio.file.Files.createTempDirectory("graft_oov").toString
    Seq((1L, "abc zz qqqq")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val r = TextAnalysisOps.bpeTokenCountsFrom(spark, out, vocab).collect().head
    assert(r.getAs[Long]("n_words") == 3L, s"OOV words dropped: $r")
    // 2 (abc) + 2 (zz chars) + 4 (qqqq chars)
    assert(r.getAs[Long]("bpe_tokens") == 8L, s"char fallback wrong: $r")
  }

  test("quality-model artifact round-trips: frozen-stats serve equals q91") {
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps
    val art = java.nio.file.Files.createTempDirectory("graft_qm_art").toString
    TextAnalysisOps.qualityModelArtifact(spark, dir)
      .write.mode("overwrite").parquet(art)
    val served = TextAnalysisOps.scoreWithQualityModel(spark, dir,
      spark.read.parquet(art))
    val inSession = TextAnalysisOps.qualityClassifier(spark, dir)
      .select("doc_id", "p_quality", "pred_label")
    assert(served.exceptAll(inSession).isEmpty &&
      inSession.exceptAll(served).isEmpty,
      "frozen-model serve diverged from in-session training scores")
    // The serve plan must not aggregate over the scored corpus: the only
    // aggregates allowed are inside the (already-materialized) 1-row model.
    val aggs = served.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("HashAggregate"))
    assert(aggs == 0, s"serve plan contains $aggs aggregates over the corpus")
  }

  test("tokenizer artifact round-trips: apply from persisted vocab equals q93") {
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps
    val art = java.nio.file.Files.createTempDirectory("graft_tok_art").toString
    val (_, vocab) = TextAnalysisOps.bpeModel(spark, dir)
    vocab.select(col("word"),
        size(split(trim(col("repr")), " ")).cast("long").as("n_sym"))
      .write.mode("overwrite").parquet(s"$art/vocab")
    val fromArtifact = TextAnalysisOps.bpeTokenCountsFrom(spark, dir,
      spark.read.parquet(s"$art/vocab"))
    val inSession = TextAnalysisOps.bpeTokenCounts(spark, dir)
    assert(fromArtifact.exceptAll(inSession).isEmpty &&
      inSession.exceptAll(fromArtifact).isEmpty,
      "artifact-applied tokenization diverged from the in-session frame")
  }

  test("q96 AUC equals brute-force tie-aware pair counting; well above chance") {
    val dir = "/root/testdata/sf0.001"
    import graft.operators.TextAnalysisOps
    // Independent formulation: O(n_pos·n_neg) pairwise comparison on the
    // same micro-score quantization q96 declares (q91's r6 p_quality).
    val scored = TextAnalysisOps.qualityClassifier(spark, dir).collect()
      .map(r => (math.floor(r.getAs[Double]("p_quality") * 1e6 + 0.5).toLong,
        r.getAs[Long]("weak_label")))
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = math.floor(wins / (pos.length.toDouble * neg.length) * 1e6 + 0.5) / 1e6

    val r = TextAnalysisOps.classifierAuc(spark, dir).collect().head
    assert(r.getAs[Long]("n_pos") == pos.length && r.getAs[Long]("n_neg") == neg.length)
    assert(r.getAs[Double]("auc") == expected,
      s"histogram AUC ${r.getAs[Double]("auc")} != pairwise $expected")
    assert(r.getAs[Double]("auc") > 0.8, s"classifier ranks no better than chance: $r")
  }

  test("q97 returns a unit eigenvector of the embedding covariance") {
    val dir = "/root/testdata/sf0.001"
    val out = SimilarityOps.pcaTopComponent(spark, dir).orderBy("pos").collect()
    val v = out.map(_.getAs[Double]("loading"))
    val lambda = out.head.getAs[Double]("lambda1")
    val share = out.head.getAs[Double]("var_share")
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3, "loadings not unit-norm")
    assert(lambda > 0 && share > 0 && share <= 1.0, s"bad spectrum stats: $lambda, $share")

    // Independent check: plain-double covariance from the raw table; the
    // returned (v, λ) must satisfy C·v ≈ λ·v.
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val n = embs.length
    val d = embs.head.length
    val mu = Array.tabulate(d)(i => embs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      embs.map(e => e(i) * e(j)).sum / n - mu(i) * mu(j))
    val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    val residual = math.sqrt((0 until d).map(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
    assert(residual / lambda < 0.02,
      s"not an eigenpair: residual/lambda = ${residual / lambda}")
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(share - lambda / trace) < 1e-3, "var_share != lambda/trace")
  }

  test("recall curve is monotone in nprobe and complete at nprobe = K") {
    val dir = "/root/testdata/sf0.001"
    val curve = SimilarityOps.ivfRecallCurve(spark, dir)
      .orderBy("nprobe").collect()
      .map(r => r.getAs[Long]("nprobe") -> r.getAs[Double]("recall"))
    assert(curve.map(_._1).toSeq == SimilarityOps.NProbeSweep.map(_.toLong))
    curve.sliding(2).foreach { case Array((_, r1), (_, r2)) =>
      assert(r2 >= r1, s"recall not monotone: $curve")
    }
  }

  test("q98 PQ encoding is a per-subspace nearest-centroid argmin on residuals") {
    val dir = "/root/testdata/sf0.001"
    val (centF, asgF) = SimilarityOps.pqModel(spark, dir)
    // centroids: (sub, code) -> dense subvector over GLOBAL positions
    val cent = centF.collect()
      .groupBy(r => (r.getAs[Long]("sub"), r.getAs[Long]("code")))
      .view.mapValues(_.map(r => r.getAs[Int]("pos") -> r.getAs[Double]("c")).toMap)
      .toMap
    val asg = asgF.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub")) -> r.getAs[Long]("code"))
      .toMap
    // Residual vectors: v − coarse centroid of v's assigned cell (the
    // round-8 IVFADC geometry — codebooks quantize residuals).
    val (kcentF, kasgF) = SimilarityOps.kmeansModel(spark, dir)
    val kcent = kcentF.collect()
      .groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(r => r.getAs[Int]("pos") -> r.getAs[Double]("c")).toMap)
      .toMap
    val kasg = kasgF.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map { r =>
        val id = r.getAs[Long]("vec_id")
        val raw = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
        val c = kcent(kasg(id))
        id -> raw.zipWithIndex.map { case (v, pos) => v - c(pos) }
      }
      .toMap

    val n = vecs.size
    assert(asg.size == n * SimilarityOps.PqM, "one code per (vec, subspace)")
    assert(asg.values.forall(c => c >= 0 && c < SimilarityOps.PqK))

    def sqErr(v: Array[Double], sub: Long, code: Long): Double = {
      val c = cent((sub, code))
      c.map { case (pos, cv) => val d = v(pos) - cv; d * d }.sum
    }
    // Every assignment beats (or ties) every other surviving code.
    for (((vecId, sub), code) <- asg) {
      val chosen = sqErr(vecs(vecId), sub, code)
      val codes = cent.keys.filter(_._1 == sub).map(_._2)
      codes.foreach { other =>
        assert(chosen <= sqErr(vecs(vecId), sub, other) + 1e-9,
          s"vec $vecId sub $sub: code $code not the argmin")
      }
    }
  }

  test("q101 KN probabilities sum to exactly 1 over the full continuation vocab") {
    val dir = "/root/testdata/sf0.001"
    val frame = graft.operators.TextAnalysisOps.knFrame(spark, dir).collect()
    val D = graft.operators.TextAnalysisOps.KnDiscount
    val ntypes = frame.head.getAs[Long]("ntypes").toDouble
    // continuation distribution: pcont(w2) = N1+(·w2)/N1+(··), sums to 1
    val pcont = frame.map(r => r.getAs[String]("w2") -> r.getAs[Long]("n1w2"))
      .distinct.toMap
    assert(math.abs(pcont.values.sum / ntypes - 1.0) < 1e-9, "pcont not a distribution")

    val byW1 = frame.groupBy(_.getAs[String]("w1"))
    val sample = byW1.keys.toSeq.sorted.take(25)
    sample.foreach { w1 =>
      val rows = byW1(w1)
      val c1 = rows.head.getAs[Long]("c1").toDouble
      val n1w1 = rows.head.getAs[Long]("n1w1").toDouble
      val lam = D * n1w1 / c1
      val observed = rows.map { r =>
        (r.getAs[Long]("c12") - D) / c1 + lam * (r.getAs[Long]("n1w2") / ntypes)
      }.sum
      val observedW2 = rows.map(_.getAs[String]("w2")).toSet
      val unseen = pcont.collect {
        case (w2, n) if !observedW2.contains(w2) => lam * (n / ntypes)
      }.sum
      assert(math.abs(observed + unseen - 1.0) < 1e-9,
        s"KN mass for '$w1' sums to ${observed + unseen}")
      assert(rows.forall { r =>
        val p = (r.getAs[Long]("c12") - D) / c1 + lam * (r.getAs[Long]("n1w2") / ntypes)
        p > 0 && p < 1
      }, s"p_kn out of (0,1) for '$w1'")
    }
  }

  test("q102 KN surprisal covers every doc and is positive where bigrams exist") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.TextAnalysisOps.knSurprisal(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length == nDocs)
    out.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val s = r.getAs[Double]("mean_kn_surprisal")
      if (n > 0) assert(s > 0, s"doc ${r.getAs[Long]("doc_id")}: surprisal $s")
      else assert(s == 0.0)
    }
  }

  test("q103 cleaning scrubs planted boilerplate and passes clean text through") {
    val out = java.nio.file.Files.createTempDirectory("graft_clean").toString
    val dirty = "Read THIS at https://ex.com/a?b=1 now!!!! mail bob@example.com   ok"
    val clean = "just a plain sentence"
    Seq((1L, dirty), (2L, clean)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = graft.operators.TextAnalysisOps.cleanText(spark, out)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val d = got(1L)
    assert(d.getAs[Long]("n_urls") == 1 && d.getAs[Long]("n_emails") == 1 &&
      d.getAs[Long]("n_punct_runs") == 1)
    // expected string via the same pipeline in JVM regex
    val expected = dirty.toLowerCase
      .replaceAll(graft.operators.TextAnalysisOps.CleanUrlRe, " ")
      .replaceAll(graft.operators.TextAnalysisOps.PiiEmailRe, " ")
      .replaceAll(graft.operators.TextAnalysisOps.CleanPunctRe, ".")
      .replaceAll("\\s+", " ").trim
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d.getAs[String]("clean_md5") == md5hex(expected))
    assert(d.getAs[Double]("removed_frac") > 0)

    val c = got(2L)
    assert(c.getAs[Long]("n_urls") == 0 && c.getAs[Long]("n_emails") == 0)
    assert(c.getAs[String]("clean_md5") == md5hex(clean))
    assert(c.getAs[Double]("removed_frac") == 0.0)
  }

  test("q100 ADC ranking equals a direct per-cell lookup-table recomputation") {
    val dir = "/root/testdata/sf0.001"
    val out = SimilarityOps.annPqAdc(spark, dir).collect()
    assert(out.length == SimilarityOps.TopK)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to out.length).toSeq)

    val (centF, asgF) = SimilarityOps.pqModel(spark, dir)
    val cent = centF.collect()
      .groupBy(r => (r.getAs[Long]("sub"), r.getAs[Long]("code")))
      .view.mapValues(_.map(r => r.getAs[Int]("pos") -> r.getAs[Double]("c")).toMap)
      .toMap
    val codes = asgF.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub")) -> r.getAs[Long]("code"))
    val (kcentF, kasgF) = SimilarityOps.kmeansModel(spark, dir)
    val kcent = kcentF.collect()
      .groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(r => r.getAs[Int]("pos") -> r.getAs[Double]("c")).toMap)
      .toMap
    val kasg = kasgF.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    val qv = vecs(SimilarityOps.QueryVecId)
    // Residual ADC: one distance table per coarse cell, built from the
    // query's residual against that cell; per-vector lookup keys on the
    // vector's own cell.
    val dtab = kcent.keys.flatMap { cl =>
      val kc = kcent(cl)
      cent.map { case (k, c) =>
        (cl, k._1, k._2) ->
          c.map { case (pos, cv) => val d = qv(pos) - kc(pos) - cv; d * d }.sum
      }
    }.toMap
    val adist = codes.groupBy(_._1._1).map { case (vecId, sc) =>
      vecId -> sc.map { case ((_, sub), code) => dtab((kasg(vecId), sub, code)) }.sum
    }
    val expect = adist.toSeq.sortBy { case (id, d) => (d, id) }
      .take(out.length).map(_._1)
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == expect,
      "ADC top-k differs from recomputed lookup-table ranking")
    // the approximation is informative: the true nearest vector (the query
    // itself, distance = its own residual quantization error) ranks first
    assert(out.head.getAs[Long]("vec_id") == SimilarityOps.QueryVecId)
  }

  test("q106 fuzzy join finds the typo'd near-title and respects its blocking") {
    val out = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilom zeta"), // 1 substitution, same block
      (3L, "alpha beta gamma " + ("x" * 200)), // same block, distance >> cap
      (4L, "omega beta gamma delta epsilon zeta")) // 1 sub vs doc 1, DIFFERENT block
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val pairs = DedupOps.fuzzyJoin(spark, out).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("dist")))
    assert(pairs.toSeq == Seq((1L, 2L, 1L)),
      s"expected exactly the typo pair at distance 1, got ${pairs.toSeq}")
  }

  test("q105 end-to-end curve is complete at full probe of a lossless ranking bound") {
    val dir = "/root/testdata/sf0.001"
    val e2e = SimilarityOps.ivfPqRecallCurve(spark, dir).orderBy("nprobe").collect()
      .map(r => r.getAs[Long]("nprobe") -> r.getAs[Double]("recall"))
    val probeOnly = SimilarityOps.ivfRecallCurve(spark, dir).orderBy("nprobe").collect()
      .map(r => r.getAs[Long]("nprobe") -> r.getAs[Double]("recall")).toMap
    assert(e2e.map(_._1).toSeq == SimilarityOps.NProbeSweep.map(_.toLong))
    e2e.foreach { case (np, r) =>
      assert(r >= 0 && r <= 1)
      // probe coverage is an upper bound: ADC misranking can only LOSE
      // exact-top-k members relative to what the probed cells contain
      // (both curves share the probe; q105 additionally ranks by ADC)
      assert(r <= probeOnly(np) + 1e-9,
        s"e2e recall $r exceeds probe coverage ${probeOnly(np)} at nprobe=$np")
    }
    assert(e2e.last._2 > 0, "zero recall even at the widest probe")
  }

  test("q104 IVF-PQ equals the ADC ranking restricted to the probed cells") {
    val dir = "/root/testdata/sf0.001"
    val out = SimilarityOps.annIvfPq(spark, dir).collect()
    assert(out.length == SimilarityOps.TopK)

    // Recompute: probe set from the collected k-means model, candidates'
    // ADC distances from the collected PQ codebooks.
    val (kcentF, kasgF) = SimilarityOps.kmeansModel(spark, dir)
    val kcent = kcentF.collect()
      .groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(r => r.getAs[Int]("pos") -> r.getAs[Double]("c")).toMap)
      .toMap
    val kasg = kasgF.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    val qv = vecs(SimilarityOps.QueryVecId)
    val probed = kcent.toSeq.map { case (cl, c) =>
      cl -> c.map { case (pos, cv) => val d = qv(pos) - cv; d * d }.sum
    }.sortBy { case (cl, d) => (d, cl) }.take(SimilarityOps.NProbe).map(_._1).toSet

    val (pcentF, pasgF) = SimilarityOps.pqModel(spark, dir)
    val pcent = pcentF.collect()
      .groupBy(r => (r.getAs[Long]("sub"), r.getAs[Long]("code")))
      .view.mapValues(_.map(r => r.getAs[Int]("pos") -> r.getAs[Double]("c")).toMap)
      .toMap
    // Residual ADC tables, one per cell (round-8 geometry).
    val dtab = kcent.keys.flatMap { cl =>
      val kc = kcent(cl)
      pcent.map { case (k, c) =>
        (cl, k._1, k._2) ->
          c.map { case (pos, cv) => val d = qv(pos) - kc(pos) - cv; d * d }.sum
      }
    }.toMap
    val codes = pasgF.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub")) -> r.getAs[Long]("code"))
    val adist = codes.groupBy(_._1._1).map { case (vecId, sc) =>
      vecId -> sc.map { case ((_, sub), code) => dtab((kasg(vecId), sub, code)) }.sum
    }
    val expect = adist.toSeq
      .filter { case (id, _) => probed.contains(kasg(id)) }
      .sortBy { case (id, d) => (d, id) }
      .take(out.length).map(_._1)
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == expect,
      "IVF-PQ top-k differs from the probe-restricted ADC ranking")
    // the composition genuinely pruned: some vector outside the probed
    // cells would have ranked inside the top-k under full ADC
    val fullTop = adist.toSeq.sortBy { case (id, d) => (d, id) }
      .take(out.length).map(_._1)
    assert(fullTop.exists(id => !probed.contains(kasg(id))),
      "probe pruned nothing — spec can't distinguish q104 from q100")
  }

  test("q99 weighted sample is the exact top-N of the recomputed A-ES keys") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.TextAnalysisOps.weightedSample(spark, dir).collect()
    assert(out.length == graft.operators.TextAnalysisOps.SampleN)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to out.length).toSeq)

    // Recompute every doc's key independently (same md5→2^52 uniform, JVM
    // math.log == Spark's log on identical doubles) and confirm the
    // selected set IS the global top-N with the declared tie-break.
    val md = java.security.MessageDigest.getInstance("MD5")
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect().map { r =>
        val id = r.getAs[Long]("doc_id")
        val w = math.max(r.getAs[Long]("n_chars"), 1L)
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(13)
        val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4503599627370496.0
        (id, w, math.log(u) / w.toDouble)
      }
    val expect = all.sortBy { case (id, _, k) => (-k, id) }.take(out.length)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == expect.map(_._1).toSeq,
      "sampled set/order differs from recomputed top-N")
    // heavier docs must be overrepresented relative to uniform: the mean
    // sampled weight exceeds the corpus mean weight
    val corpusMean = all.map(_._2.toDouble).sum / all.length
    val sampleMean = out.map(_.getAs[Long]("weight").toDouble).sum / out.length
    assert(sampleMean > corpusMean, s"no weight bias: $sampleMean <= $corpusMean")
  }

  test("q59 interval join matches a direct per-purchase recount") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.EventsOps.intervalJoin(spark, dir).collect()
    val ev = graft.operators.EventsOps.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("long").as("ts_s")).collect()
    val views = ev.filter(_.getAs[String]("event_type") == "view")
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
    assert(out.length == purchases.length, "one row per purchase")
    val w = graft.operators.EventsOps.IntervalS
    val byId = out.map(r => r.getAs[Long]("event_id") -> r).toMap
    purchases.foreach { p =>
      val pts = p.getAs[Long]("ts_s")
      val near = views.filter(v => math.abs(v.getAs[Long]("ts_s") - pts) <= w)
      val r = byId(p.getAs[Long]("event_id"))
      assert(r.getAs[Long]("n_views") == near.length)
      assert(r.getAs[Long]("n_users") ==
        near.map(_.getAs[Long]("user_id")).distinct.length)
    }
    // the join genuinely crosses keys: at least one purchase counts a view
    // from a DIFFERENT user (q65's per-key window could never see it)
    val crossKey = purchases.exists { p =>
      val pts = p.getAs[Long]("ts_s")
      val pu = p.getAs[Long]("user_id")
      views.exists(v => math.abs(v.getAs[Long]("ts_s") - pts) <= w &&
        v.getAs[Long]("user_id") != pu)
    }
    assert(crossKey, "test data has no cross-user interval matches")
  }
}
