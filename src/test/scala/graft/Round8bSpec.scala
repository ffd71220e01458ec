package graft

import org.apache.spark.sql.functions._

import graft.operators.{RelationalOps, SimilarityOps, TextAnalysisOps}

/** Round-8 second-wave additions: context-length truncation ablation
  * (q126), Gopher-rule quality filter ablation (q127), matryoshka
  * dim-truncation recall (q128), and the TPC-H Q21/Q22 join shapes
  * (q130/q131). Each test recounts the query's answer from first
  * principles driver-side (collected rows + plain Scala), so the
  * distributed plan and an independent sequential recount must agree.
  */
class Round8bSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val TokRe = "[a-z0-9]+(?:[-_][a-z0-9]+)*".r

  private def tok(text: String): Seq[String] =
    TokRe.findAllIn(text.toLowerCase).toSeq

  test("q126 truncation-loss table matches a sequential recount") {
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(r => tok(r.getString(0)).size.toLong)
    val rows = TextAnalysisOps.truncationLoss(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("max_seq_len")).toSeq ==
      TextAnalysisOps.TruncLens)
    rows.foreach { r =>
      val l = r.getAs[Long]("max_seq_len")
      assert(r.getAs[Long]("n_docs") == lens.length)
      assert(r.getAs[Long]("n_truncated") == lens.count(_ > l))
      assert(r.getAs[Long]("tokens_total") == lens.sum)
      assert(r.getAs[Long]("tokens_kept") == lens.map(math.min(_, l)).sum)
    }
    // Longer contexts keep monotonically more tokens and truncate fewer docs.
    val kept = rows.map(_.getAs[Long]("tokens_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b })
    val trunc = rows.map(_.getAs[Long]("n_truncated"))
    assert(trunc.zip(trunc.tail).forall { case (a, b) => a >= b })
  }

  test("q127 planted documents trip exactly their Gopher rule") {
    import spark.implicits._
    val clean = "the cat sat on the mat and that dog ran with all off " +
      "into the barn where the hens have corn that they peck all day long"
    val planted = Seq(
      (0L, clean),
      (1L, "- item one\n- item two\n- item three"), // bullet-led lines
      (2L, "we wait for the\nresults to come...\nstill waiting today..."), // ellipsis lines
      (3L, clean + " ## ## ## ## ## ## ## ## ## ## ## ##"), // symbol ratio
      (4L, ("12345 " * 25).trim + " the of"), // non-alphabetic words
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")) // no required stopwords
      .toDF("doc_id", "text")
    val flags = TextAnalysisOps.gopherFlagsOf(planted).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Seq("f_word_count", "f_mean_word_len", "f_symbol_ratio",
          "f_bullet_lines", "f_ellipsis_lines", "f_alpha_words", "f_stopwords")
          .map(f => f -> r.getAs[Boolean](f)).toMap).toMap

    assert(flags(0L).values.forall(!_), s"clean doc flagged: ${flags(0L)}")
    assert(flags(1L)("f_bullet_lines"))
    assert(flags(2L)("f_ellipsis_lines"))
    assert(!flags(2L)("f_bullet_lines"))
    assert(flags(3L)("f_symbol_ratio"))
    assert(flags(4L)("f_alpha_words"))
    assert(!flags(4L)("f_word_count"), "25-word planted doc is long enough")
    assert(flags(5L)("f_stopwords"))
    assert(!flags(5L)("f_alpha_words"))
  }

  test("q127 corpus rates recount from the per-doc flags") {
    val flagCols = Seq("f_word_count", "f_mean_word_len", "f_symbol_ratio",
      "f_bullet_lines", "f_ellipsis_lines", "f_alpha_words", "f_stopwords")
    val perDoc = TextAnalysisOps.gopherFlagsOf(
      spark.read.parquet(s"$dir/documents.parquet")).collect()
    val rows = TextAnalysisOps.gopherRules(spark, dir).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_flagged")).toMap
    flagCols.zipWithIndex.foreach { case (f, i) =>
      assert(rows(s"${i + 1}_${f.stripPrefix("f_")}") ==
        perDoc.count(_.getAs[Boolean](f)).toLong, s"rule $f count mismatch")
    }
    assert(rows("8_any_rule") ==
      perDoc.count(r => flagCols.exists(r.getAs[Boolean](_))).toLong)
  }

  test("q128 matryoshka recall: full-dim anchor at 1.0, recounted at dim=16") {
    val rows = SimilarityOps.dimTruncationRecall(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("recall_at_50"))).toMap
    assert(rows.keySet == SimilarityOps.MatryoshkaDims.map(_.toLong).toSet)
    assert(rows(64L) == ((50L, 1.0)), "full-dim prefix must recover the exact answer")
    rows.values.foreach { case (h, r) =>
      assert(h >= 0 && h <= 50 && r >= 0.0 && r <= 1.0)
    }

    // Sequential recount of the dim=16 row from collected embeddings.
    val embs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until d).foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = embs(SimilarityOps.QueryVecId)
    def top50(d: Int): Set[Long] =
      embs.toSeq.map { case (id, v) => (id, cos(v, q, d)) }
        .sortBy { case (id, c) => (-c, id) }.take(50).map(_._1).toSet
    val expected16 = (top50(16) intersect top50(64)).size.toLong
    assert(rows(16L)._1 == expected16,
      s"dim=16 n_hits ${rows(16L)._1} != recounted $expected16")
  }

  test("q130 lone-failure suppliers matches a sequential recount and plans semi+anti") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_suppkey"),
        r.getAs[String]("l_returnflag")))
    val fOrders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === "F").select("o_orderkey").collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    val byOrder = li.groupBy(_._1)
    val waits = for {
      (ok, sk, rf) <- li
      if rf == "R" && fOrders(ok)
      others = byOrder(ok)
      if others.exists(_._2 != sk) // another supplier touched the order
      if !others.exists(o => o._2 != sk && o._3 == "R") // and none of them failed
    } yield sk
    val suppliers = spark.read.parquet(s"$dir/supplier.parquet").collect()
      .map(r => r.getAs[Long]("s_suppkey") ->
        (r.getAs[String]("s_name"), r.getAs[Int]("s_nationkey"))).toMap
    val nations = spark.read.parquet(s"$dir/nation.parquet").collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val expected = waits.groupBy(identity).map { case (sk, xs) =>
      val (name, nk) = suppliers(sk)
      (name, nations(nk)) -> xs.length.toLong
    }

    val q = RelationalOps.loneFailureSuppliers(spark, dir)
    val got = q.collect().map(r => (r.getAs[String]("s_name"),
      r.getAs[String]("n_name")) -> r.getAs[Long]("numwait")).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.nonEmpty, "q130 should produce rows at sf0.001")

    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "expected a left-semi self-join in the plan")
    assert(plan.contains("LeftAnti"), "expected a left-anti self-join in the plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the non-equi supplier predicate must ride the orderkey equi-join, " +
        "not a nested-loop join")
  }

  test("q129 collapses to q125 on singleton clusters; IDCG is the gain prefix sum") {
    import graft.operators.RetrievalOps
    val gains = RetrievalOps.NdcgGains.map { case (r, g) => r -> BigDecimal(g) }.toMap
    val eval129 = RetrievalOps.clusterRelevantEval(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") -> r).toMap
    val eval125 = RetrievalOps.knownItemEval(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("src_rank")).toMap
    assert(eval129.keySet == eval125.keySet, "same benchmark panel")

    // IDCG@10 for a cluster of size k is the exact prefix sum of the
    // declared gain table — recomputed here from the same literals.
    eval129.values.foreach { r =>
      val k = math.min(r.getAs[Long]("n_rel"), 10L)
      val idcg = (1L to k).map(gains).sum
      val expected = (idcg * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toDouble / 1e6
      assert(math.abs(r.getAs[Double]("idcg_at_10") - expected) < 1e-9,
        s"idcg mismatch for n_rel=${r.getAs[Long]("n_rel")}")
    }

    // On a singleton cluster the graded metrics must equal the known-item
    // ones: hit iff the source ranked ≤ 10, nDCG = gain(rank).
    val singletons = eval129.filter(_._2.getAs[Long]("n_rel") == 1L)
    assert(singletons.nonEmpty, "sf0.001 panel should contain singleton clusters")
    singletons.foreach { case (qid, r) =>
      val rank = eval125(qid)
      val expHits = if (rank <= 10) 1L else 0L
      assert(r.getAs[Long]("hits_at_10") == expHits, s"q$qid hits")
      assert(r.getAs[Double]("recall_at_10") == expHits.toDouble, s"q$qid recall")
      val expNdcg = if (rank <= 10)
        (gains(rank) * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toDouble / 1e6
      else 0.0
      assert(math.abs(r.getAs[Double]("ndcg_at_10") - expNdcg) < 1e-9,
        s"q$qid ndcg ${r.getAs[Double]("ndcg_at_10")} != $expNdcg (rank $rank)")
    }
  }

  test("q132 holdout AUC matches a brute-force pairwise recount; splits tie to q76") {
    import graft.operators.{DedupOps, TextAnalysisOps}
    val row = TextAnalysisOps.holdoutAuc(spark, dir).collect().head
    val splitCounts = DedupOps.leakageSafeSplits(spark, dir).collect()
      .groupBy(_.getAs[String]("split")).view.mapValues(_.length.toLong).toMap
    assert(row.getAs[Long]("n_train") == splitCounts("train"))
    assert(row.getAs[Long]("n_holdout") == splitCounts("holdout"))

    // Brute-force tie-aware Mann-Whitney AUC over the quantized scores
    // (the declared statistic) on the holdout population.
    val (_, sh) = TextAnalysisOps.holdoutScoredFrames(spark, dir)
    val scored = sh.collect().map { r =>
      (math.floor(math.floor(r.getAs[Double]("p") * 1e6 + 0.5) / 1e6 * 1e6 + 0.5).toLong,
        r.getAs[Double]("y"))
    }
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    val expected =
      if (pos.isEmpty || neg.isEmpty) 0.5
      else {
        val num = (for (p <- pos; n <- neg) yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val auc = num / (pos.length.toDouble * neg.length)
        math.floor(auc * 1e6 + 0.5) / 1e6
      }
    assert(row.getAs[Double]("auc_holdout") == expected,
      s"holdout auc ${row.getAs[Double]("auc_holdout")} != pairwise $expected " +
        s"(${pos.length} pos, ${neg.length} neg)")
    assert(math.abs(row.getAs[Double]("auc_gap") -
      (math.floor((row.getAs[Double]("auc_train") - row.getAs[Double]("auc_holdout"))
        * 1e6 + 0.5) / 1e6)) < 1e-12)
  }

  test("q133 scorecard recounts from the per-doc signal frames") {
    import graft.operators.TextAnalysisOps
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val src = d.select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val qual = TextAnalysisOps.textQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("quality_score"))).toMap
    val flagCols = Seq("f_word_count", "f_mean_word_len", "f_symbol_ratio",
      "f_bullet_lines", "f_ellipsis_lines", "f_alpha_words", "f_stopwords")
    val flagged = TextAnalysisOps.gopherFlagsOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        flagCols.exists(r.getAs[Boolean](_))).toMap
    val rows = TextAnalysisOps.sourceScorecard(spark, dir).collect()
    assert(rows.map(_.getAs[String]("source")).toSet == src.values.toSet)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val members = src.collect { case (id, `s`) => id }.toSeq
      assert(r.getAs[Long]("n_docs") == members.size)
      assert(r.getAs[Long]("n_tokens") == members.map(qual(_)._1).sum)
      assert(r.getAs[Long]("n_flagged") == members.count(flagged))
      val mq = math.floor(members.map(m => BigDecimal(qual(m)._2)).sum.toDouble /
        members.size * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("mean_quality") == mq, s"mean_quality $s")
    }
  }

  test("q134 Heaps curve recounts sequentially; fit recomputes from the points") {
    import graft.operators.TextAnalysisOps
    val rows = TextAnalysisOps.heapsLaw(spark, dir).collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)

    // Sequential recount: trigram first-occurrence scan in doc order.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).sortBy(_._1)
    val n = docs.length.toLong
    val firstSeen = scala.collection.mutable.Map.empty[(String, String, String), Long]
    val uniFirst = scala.collection.mutable.Map.empty[String, Long]
    var tokAt = Map.empty[Long, Long]; var cum = 0L
    docs.foreach { case (id, text) =>
      val ws = tok(text)
      cum += ws.size
      tokAt += id -> cum
      ws.foreach(w => if (!uniFirst.contains(w)) uniFirst(w) = id)
      ws.sliding(3).filter(_.size == 3).foreach { t =>
        val k = (t(0), t(1), t(2))
        if (!firstSeen.contains(k)) firstSeen(k) = id
      }
    }
    rows.foreach { r =>
      val t = math.floor(n.toDouble * r.getAs[Long]("decile") / 10.0).toLong
      assert(r.getAs[Long]("threshold") == t)
      assert(r.getAs[Long]("vocab_cum") == uniFirst.values.count(_ < t).toLong)
      assert(r.getAs[Long]("trigram_cum") == firstSeen.values.count(_ < t).toLong,
        s"trigram_cum at decile ${r.getAs[Long]("decile")}")
      assert(r.getAs[Long]("tokens_cum") ==
        docs.filter(_._1 < t).map(d => tok(d._2).size.toLong).sum)
    }

    // The fit recomputes from the ten (ln T, ln V3) points.
    val xs = rows.map(r => math.log(r.getAs[Long]("tokens_cum").toDouble))
    val ys = rows.map(r => math.log(r.getAs[Long]("trigram_cum").toDouble))
    val m = 10.0
    def d8(v: Double) = BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val (sx, sy) = (xs.map(d8).sum.toDouble, ys.map(d8).sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => d8(a * b) }.sum.toDouble
    val sxx = xs.map(a => d8(a * a)).sum.toDouble
    val beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(rows.head.getAs[Double]("beta") - beta) < 2e-6,
      s"beta ${rows.head.getAs[Double]("beta")} != recomputed $beta")
    assert(rows.head.getAs[Double]("beta") > 0.5 &&
      rows.head.getAs[Double]("beta") < 1.0, "Heaps exponent in the plausible band")
    assert(rows.head.getAs[Double]("r2") > 0.9, "near-power-law growth expected")
  }

  test("q135 frame energies recount sequentially; framing covers the payload") {
    import graft.operators.MultimodalOps
    val rows = MultimodalOps.audioFrameEnergy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      val nf = if (bytes.length < MultimodalOps.FrameLen) 0
        else (bytes.length - MultimodalOps.FrameLen) / MultimodalOps.FrameHop + 1
      if (nf == 0) assert(!rows.contains(id))
      else {
        val r = rows(id)
        assert(r.getAs[Long]("n_frames") == nf.toLong, s"doc $id n_frames")
        val rms = (0 until nf).map { j =>
          val ss = (0 until MultimodalOps.FrameLen)
            .map(k => bytes(j * MultimodalOps.FrameHop + k)).map(b => b.toLong * b).sum
          math.sqrt(ss.toDouble / MultimodalOps.FrameLen)
        }
        assert(r.getAs[Long]("n_active") ==
          rms.count(_ > MultimodalOps.ActiveRms).toLong, s"doc $id n_active")
        val meanExp = math.floor(rms.map(v => BigDecimal(v).setScale(8,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / nf * 1e6 + 0.5) / 1e6
        assert(r.getAs[Double]("mean_rms") == meanExp, s"doc $id mean_rms")
      }
    }
    // Both activity verdicts occur on the corpus (threshold discriminates).
    val active = rows.values.map(_.getAs[Long]("n_active")).sum
    val frames = rows.values.map(_.getAs[Long]("n_frames")).sum
    assert(active > 0 && active < frames)
  }

  test("q136 trailing range-frame revenue recounts; same-day orders share frames") {
    import graft.operators.RelationalOps
    val rows = RelationalOps.trailingRevenue(spark, dir).collect()
    val orders = rows.map(r => (r.getAs[Long]("o_orderkey"),
      r.getAs[Long]("o_custkey"), r.getAs[Long]("order_day")))
    val byCust = orders.groupBy(_._2)
    val price = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Double]("o_totalprice")).toMap
    rows.foreach { r =>
      val (ck, day) = (r.getAs[Long]("o_custkey"), r.getAs[Long]("order_day"))
      val inWin = byCust(ck).filter(o =>
        o._3 <= day && o._3 > day - RelationalOps.TrailingDays)
      assert(r.getAs[Long]("n_orders_win") == inWin.length.toLong,
        s"order ${r.getAs[Long]("o_orderkey")} window count")
      val exp = math.floor(inWin.map(o => BigDecimal(price(o._1))).sum.toDouble
        * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("trailing_rev") == exp,
        s"order ${r.getAs[Long]("o_orderkey")} trailing sum")
    }
    // RANGE semantics: any same-day pair of one customer's orders report
    // identical window aggregates (no tie-break dependence).
    val sameDay = orders.groupBy(o => (o._2, o._3)).values.filter(_.length > 1)
    assert(sameDay.nonEmpty, "testdata should contain same-day order pairs")
    val byKey = rows.map(r => r.getAs[Long]("o_orderkey") ->
      (r.getAs[Double]("trailing_rev"), r.getAs[Long]("n_orders_win"))).toMap
    sameDay.foreach { grp =>
      val vals = grp.map(o => byKey(o._1)).distinct
      assert(vals.size == 1, s"same-day orders diverged: $grp -> $vals")
    }
  }

  test("q137 PMI collocations recount from raw token streams") {
    import graft.operators.TextAnalysisOps
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(r => tok(r.getString(0)))
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val bg = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    texts.foreach { ws =>
      ws.foreach(w => uni(w) += 1)
      ws.sliding(2).filter(_.size == 2).foreach(p => bg((p(0), p(1))) += 1)
    }
    val nTok = uni.values.sum.toDouble
    val nBg = bg.values.sum.toDouble
    val expected = bg.toSeq
      .filter(_._2 >= TextAnalysisOps.PmiMinCount)
      .map { case ((a, b), c) =>
        val pmi = math.log((c / nBg) / ((uni(a) / nTok) * (uni(b) / nTok)))
        (a, b, c, pmi)
      }
      .sortBy { case (a, b, _, p) => (-p, a, b) }
      .take(TextAnalysisOps.PmiTopK)
      .map { case (a, b, c, p) =>
        (a, b, c, math.floor(p * 1e6 + 0.5) / 1e6)
      }
    val got = TextAnalysisOps.pmiCollocations(spark, dir).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_ab"), r.getAs[Double]("pmi"))).toSeq
    assert(got == expected, s"got ${got.take(3)}... expected ${expected.take(3)}...")
  }

  test("q155 per-cluster quantization error recounts from the model frames") {
    val perVec = SimilarityOps.pqModel(spark, dir)._2.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[java.math.BigDecimal]("dist")))
      .groupBy(_._1)
      .map { case (v, xs) =>
        v -> (math.floor(xs.map(x => BigDecimal(x._2)).sum.toDouble * 1e6 + 0.5) / 1e6)
      }
    val kasg = SimilarityOps.kmeansModel(spark, dir)._2.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = perVec.toSeq.groupBy { case (v, _) => kasg(v) }
      .map { case (c, xs) =>
        c -> (xs.length.toLong,
          r6d(xs.map(x => BigDecimal(x._2).setScale(8, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble / xs.length),
          r6d(xs.map(_._2).max))
      }
    val got = SimilarityOps.clusterQuantizationError(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster") -> (r.getAs[Long]("n_vecs"),
        r.getAs[Double]("mean_sq_err"), r.getAs[Double]("max_sq_err"))).toMap
    assert(got == expected, s"got $got expected $expected")
    // The audit covers every encoded vector exactly once.
    assert(got.values.map(_._1).sum == perVec.size)
  }

  test("q154 embedding health recounts; testdata satisfies every ANN invariant") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val norms = embs.map { case (_, e) =>
      r6d(math.sqrt(e.map(v => BigDecimal(v.toDouble * v.toDouble))
        .sum.toDouble))
    }
    val row = SimilarityOps.embeddingHealth(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_vecs") == embs.length)
    assert(row.getAs[Long]("n_dims_distinct") == embs.map(_._2.length).distinct.length)
    assert(row.getAs[Long]("dim") == embs.map(_._2.length).max)
    assert(row.getAs[Long]("n_zero_norm") == norms.count(_ == 0.0))
    assert(row.getAs[Long]("n_dup_ids") ==
      embs.length - embs.map(_._1).distinct.length)
    assert(row.getAs[Double]("min_norm") == norms.min)
    assert(row.getAs[Double]("max_norm") == norms.max)
    assert(row.getAs[Double]("mean_norm") == r6d(norms.map(n =>
      BigDecimal(n).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / norms.length))
    // The invariants every ANN tier in SimilarityOps assumes hold on
    // the driver-generated testdata: one dimensionality, no zero
    // vectors, unique ids.
    assert(row.getAs[Long]("n_dims_distinct") == 1L)
    assert(row.getAs[Long]("n_zero_norm") == 0L)
    assert(row.getAs[Long]("n_dup_ids") == 0L)
  }

  test("q153 signal agreement recounts from the per-doc q30/q102 frames") {
    val xs = TextAnalysisOps.textQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    val ys = TextAnalysisOps.knSurprisal(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_kn_surprisal")).toMap
    def d8(x: Double): BigDecimal =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val n = xs.size
    val pairs = xs.keys.toSeq.map(d => (xs(d), ys(d)))
    val sx = pairs.map(p => d8(p._1)).sum.toDouble
    val sy = pairs.map(p => d8(p._2)).sum.toDouble
    val sxy = pairs.map(p => d8(p._1 * p._2)).sum.toDouble
    val sxx = pairs.map(p => d8(p._1 * p._1)).sum.toDouble
    val syy = pairs.map(p => d8(p._2 * p._2)).sum.toDouble
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    val expR = if (vx <= 0 || vy <= 0) 0.0
      else (n * sxy - sx * sy) / math.sqrt(vx * vy)
    val row = TextAnalysisOps.signalAgreement(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Double]("mean_quality") == r6d(sx / n))
    assert(row.getAs[Double]("mean_surprisal") == r6d(sy / n))
    assert(row.getAs[Double]("pearson_r") == r6d(expR))
    // A correlation is only a correlation.
    assert(math.abs(row.getAs[Double]("pearson_r")) <= 1.0)
  }

  test("q152 activity segments recount; runs merge exactly the consecutive frames") {
    import graft.operators.MultimodalOps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = docs.flatMap { case (d, text) =>
      val L = MultimodalOps.FrameLen
      val H = MultimodalOps.FrameHop
      if (text.length < L) None
      else {
        val nf = (text.length - L) / H + 1
        val active = (0 until nf).map { j =>
          val ss = (0 until L).map { k =>
            val c = text.charAt(j * H + k).toInt.toLong; c * c
          }.sum
          math.sqrt(ss.toDouble / L) > MultimodalOps.ActiveRms
        }
        // maximal runs of consecutive `true`
        val runs = active.foldLeft(List.empty[Int]) {
          case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
          case (acc, true) => 1 :: acc
          case (acc, false) => 0 :: acc
        }.filter(_ > 0)
        Some(d -> (nf.toLong, runs.length.toLong,
          if (runs.isEmpty) 0L else runs.max.toLong, runs.sum.toLong))
      }
    }.toMap
    val got = MultimodalOps.audioActivitySegments(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_segments"), r.getAs[Long]("max_seg_frames"),
        r.getAs[Long]("n_active"))).toMap
    assert(got == expected, "segment structure diverges from the sequential recount")
    // active_frac and the q135 active count agree on the same frame stream.
    val q135 = MultimodalOps.audioFrameEnergy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_active")).toMap
    got.foreach { case (d, (_, _, _, na)) => assert(q135(d) == na) }
    MultimodalOps.audioActivitySegments(spark, dir).collect().foreach { r =>
      assert(r.getAs[Double]("active_frac") ==
        r6d(r.getAs[Long]("n_active").toDouble / r.getAs[Long]("n_frames")))
    }
  }

  test("q157 funnel is monotone and ties stage by stage to q113's artifact") {
    import graft.operators.DedupOps
    val rows = DedupOps.curationFunnel(spark, dir).collect()
      .sortBy(_.getAs[Long]("stage_id"))
    assert(rows.map(_.getAs[String]("stage")).toSeq == Seq("raw", "keep_best",
      "bench_excluded", "decontaminated", "train_split", "budget_kept"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b }, "docs not monotone")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b }, "tokens not monotone")
    // Stage 0 is the corpus; stage 4/5 recount from the q113 artifact.
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(docs(0) == nDocs)
    val rel = DedupOps.releasePipeline(spark, dir).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Boolean]("kept"),
        r.getAs[Long]("n_tokens")))
    val train = rel.filter(_._1 == "train")
    assert(docs(4) == train.length && toks(4) == train.map(_._3).sum)
    val kept = train.filter(_._2)
    assert(docs(5) == kept.length && toks(5) == kept.map(_._3).sum)
    // The budget stage honors the declared half-token budget.
    assert(toks(5) <= toks(4) / 2,
      s"kept ${toks(5)} exceeds the half budget of ${toks(4) / 2}")
    // Fractions are fractions of raw.
    rows.foreach { r =>
      val f = math.floor(r.getAs[Long]("n_docs").toDouble / docs(0) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("docs_frac") == f)
    }
  }

  test("q156 stickiness ties the empirical histogram to q151's stationary mix") {
    import graft.operators.EventsOps
    val emp = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    val te = emp.values.sum.toDouble
    val pi = EventsOps.stationaryEventMix(spark, dir).collect()
      .map(r => r.getAs[String]("state") -> r.getAs[Double]("pi")).toMap
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = EventsOps.mixStickiness(spark, dir).collect()
    assert(got.map(_.getAs[String]("state")).toSet == emp.keySet)
    got.foreach { r =>
      val s = r.getAs[String]("state")
      assert(r.getAs[Long]("n_events") == emp(s))
      assert(r.getAs[Double]("emp_share") == r6d(emp(s) / te))
      assert(r.getAs[Double]("stationary_pi") == pi.getOrElse(s, 0.0))
      assert(r.getAs[Double]("pi_minus_emp") ==
        r6d(pi.getOrElse(s, 0.0) - r6d(emp(s) / te)))
    }
    // Both columns are full distributions over the same states.
    assert(math.abs(got.map(_.getAs[Double]("emp_share")).sum - 1.0) < 1e-4)
  }

  test("q151 stationary mix recounts via a driver power iteration; mass conserves") {
    import graft.operators.EventsOps
    val trans = EventsOps.eventTransitions(spark, dir).collect()
      .map(r => ((r.getAs[String]("from_type"), r.getAs[String]("to_type")),
        r.getAs[Long]("n")))
    val states = trans.map(_._1._1).distinct.sorted
    val k = states.length
    val rowSum = trans.filter(t => states.contains(t._1._2))
      .groupBy(_._1._1).map { case (f, xs) => f -> xs.map(_._2).sum }
    val p = trans.filter(t => states.contains(t._1._2))
      .map { case ((f, t), n) => (f, t) -> n.toDouble / rowSum(f) }.toMap
    var pi = states.map(_ -> 1.0 / k).toMap
    var prev = pi
    for (_ <- 1 to EventsOps.PowerIters) {
      prev = pi
      pi = states.map { s =>
        val m = states.toSeq.map { f =>
          p.get((f, s)).map(pf =>
            BigDecimal(pi(f) * pf).setScale(8, BigDecimal.RoundingMode.HALF_UP))
            .getOrElse(BigDecimal(0))
        }.sum.toDouble
        s -> (EventsOps.PowerTeleport / k + EventsOps.PowerDamping * m)
      }.toMap
    }
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = EventsOps.stationaryEventMix(spark, dir).collect()
      .map(r => r.getAs[String]("state") ->
        (r.getAs[Double]("pi"), r.getAs[Double]("residual"))).toMap
    assert(got.keySet == states.toSet)
    states.foreach { s =>
      assert(got(s)._1 == r6d(pi(s)), s"$s: got ${got(s)._1} exp ${r6d(pi(s))}")
      assert(got(s)._2 == r6d(math.abs(pi(s) - prev(s))))
    }
    // Probability mass conserves (teleport + damped flow sum to 1) and the
    // fixed iteration count has converged to the reporting precision.
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-4)
    got.values.foreach { case (_, res) => assert(res <= 1e-4) }
  }

  test("q131 dormant high-balance segments match a sequential recount") {
    val custs = spark.read.parquet(s"$dir/customer.parquet").collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("c_mktsegment"),
        r.getAs[Double]("c_acctbal")))
    val withOrders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderstatus") === "O")
      .select("o_custkey").collect().map(_.getAs[Long]("o_custkey")).toSet
    val pos = custs.filter(_._3 > 0.0).map(c => BigDecimal(c._3))
    val avg = (pos.sum / pos.length).toDouble
    val kept = custs.filter(c => c._3 > avg && !withOrders(c._1))
    val expected = kept.groupBy(_._2).map { case (seg, xs) =>
      seg -> (xs.length.toLong,
        math.floor(xs.map(x => BigDecimal(x._3)).sum.toDouble * 1e6 + 0.5) / 1e6)
    }
    val got = RelationalOps.dormantHighBalance(spark, dir).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n_custs"), r.getAs[Double]("total_bal"))).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.nonEmpty, "q131 should produce rows at sf0.001")
  }

  test("q139 order-count distribution recounts; zero-order customers survive the outer join") {
    val custs = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey").collect().map(_.getAs[Long]("c_custkey"))
    val perCust = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").collect().map(_.getAs[Long]("o_custkey"))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val counts = custs.map(c => perCust.getOrElse(c, 0L))
    val expected = counts.groupBy(identity)
      .map { case (c, xs) => c -> xs.length.toLong }
    val q = RelationalOps.customerOrderDistribution(spark, dir)
    val got = q.collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    assert(got == expected, s"got $got expected $expected")
    // Plan audit: the outer join survives into the physical plan (no
    // inner-join rewrite) and nothing degenerates to a nested loop.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftOuter"), "expected the LEFT OUTER join in the plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // The outer join's reason to exist: the zero bucket is populated and
    // the distribution accounts for every customer.
    assert(got.getOrElse(0L, 0L) == custs.length - perCust.size.toLong)
    assert(got.values.sum == custs.length)
  }

  test("q140 top-supplier revenue recounts; join-back keeps every tie") {
    val rev = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") >= lit(RelationalOps.TopSupplierStart).cast("timestamp") &&
        col("l_shipdate") < lit(RelationalOps.TopSupplierEnd).cast("timestamp"))
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getAs[Long]("l_suppkey"),
        BigDecimal(r.getAs[Double]("l_extendedprice") * (1 - r.getAs[Double]("l_discount")))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val maxRev = rev.values.max
    val winners = rev.filter(_._2 == maxRev).keys.toSet
    val q = RelationalOps.topSupplierRevenue(spark, dir)
    val got = q.collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Double]("total_revenue")).toMap
    assert(got.keySet == winners, s"got ${got.keySet} expected $winners")
    val r6max = math.floor(maxRev.toDouble * 1e6 + 0.5) / 1e6
    got.values.foreach(v => assert(v == r6max))
    // Plan audit: both the 1-row max and the supplier dim come back as
    // broadcasts — lineitem shuffles once for the revenue view, then
    // nothing else exchanges.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast join-backs")
  }

  test("q149 threshold curve recounts from verified pairs and is antitone") {
    import graft.operators.DedupOps
    val pairs = DedupOps.minhashDupPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    val expected = DedupOps.ThresholdSweep.flatMap { t =>
      val surv = pairs.filter(_._3 >= t)
      if (surv.isEmpty) None
      else Some(t -> (surv.length.toLong,
        surv.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong))
    }.toMap
    val got = DedupOps.thresholdSensitivity(spark, dir).collect()
      .map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_flagged_docs"))).toMap
    assert(got == expected, s"got $got expected $expected")
    // Raising the threshold can only shrink the survivor set.
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) =>
      a._1 >= b._1 && a._2 >= b._2
    })
  }

  test("q150 split balance recounts from q76; totals partition the corpus") {
    import graft.operators.DedupOps
    val splits = DedupOps.leakageSafeSplits(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val per = srcOf.groupBy(_._2).map { case (s, xs) =>
      s -> (xs.count(x => splits(x._1) == "train").toLong,
        xs.count(x => splits(x._1) == "holdout").toLong)
    }
    val tt = per.values.map(_._1).sum.toDouble
    val th = per.values.map(_._2).sum.toDouble
    val got = DedupOps.splitBalance(spark, dir).collect()
    assert(got.map(_.getAs[String]("source")).toSet == per.keySet)
    got.foreach { r =>
      val (nt, nh) = per(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_train") == nt)
      assert(r.getAs[Long]("n_holdout") == nh)
      val cs = (nt + nh) / (tt + th)
      val hs = if (th == 0) 0.0 else nh / th
      assert(r.getAs[Double]("corpus_share") == r6d(cs))
      assert(r.getAs[Double]("holdout_share") == r6d(hs))
      assert(r.getAs[Double]("holdout_frac") == r6d(nh.toDouble / (nt + nh)))
      assert(r.getAs[Double]("abs_share_diff") == r6d(math.abs(cs - hs)))
    }
    // The audit partitions the corpus exactly.
    assert(got.map(r => r.getAs[Long]("n_train") + r.getAs[Long]("n_holdout")).sum
      == srcOf.length)
  }

  test("q148 QL ranks match a dense all-docs recount; BM25 side ties to q125") {
    import graft.operators.{DedupOps, RetrievalOps}
    val mu = RetrievalOps.QlMu
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> tok(r.getAs[String]("text")))
    val tf = toks.map { case (d, ts) =>
      d -> ts.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    }.toMap
    val dl = toks.map { case (d, ts) => d -> ts.length.toLong }.toMap
    val cf = toks.flatMap(_._2).groupBy(identity)
      .map { case (t, v) => t -> v.length.toLong }
    val ctot = cf.values.sum.toDouble
    val got = RetrievalOps.rankerComparison(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("bm25_rank"), r.getAs[Long]("ql_rank"))).toMap
    assert(got.nonEmpty)
    // Dense recount: score EVERY doc per query the textbook way and count
    // strictly-better docs (corr-doc ties break on lower id, exactly the
    // declared policy; no-match ties never fire on real data).
    got.keys.foreach { q =>
      val qterms = toks.find(_._1 == q).get._2.take(RetrievalOps.KnownItemPrefix)
        .groupBy(identity).map { case (t, v) => t -> v.length.toLong }
        .filter { case (t, _) => cf.contains(t) }
      val qlen = qterms.values.sum.toDouble
      def corrOf(d: Long): BigDecimal = qterms.map { case (t, qtf) =>
        val p = cf(t) / ctot
        val tfd = tf(d).getOrElse(t, 0L)
        if (tfd == 0L) BigDecimal(0)
        else BigDecimal(qtf * (math.log(tfd + mu * p) - math.log(mu * p)))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      def score(d: Long): Double =
        corrOf(d).toDouble - qlen * math.log(dl(d) + mu)
      val sSrc = score(q)
      val better = toks.map(_._1).count { d =>
        d != q && (score(d) > sSrc ||
          (score(d) == sSrc && corrOf(d) != BigDecimal(0) && d < q))
      }
      assert(got(q)._2 == 1L + better,
        s"query $q: decomposed rank ${got(q)._2} vs dense ${1L + better}")
    }
    // The BM25 column IS q125's rank, row for row.
    val q125 = RetrievalOps.knownItemEval(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("src_rank")).toMap
    assert(got.view.mapValues(_._1).toMap == q125)
    // Plan audit: the scalable decomposition never degenerates into a
    // corpus-sized nested loop or cartesian product — the only cross join
    // is the panel-stats × dl-histogram grid (both metadata-scale).
    val plan = RetrievalOps.rankerComparison(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "panel scoring must not plan a cartesian product")
  }

  test("q147 packing efficiency recounts from the q47 bin assignment") {
    val bins = TextAnalysisOps.sequencePacking(spark, dir).collect()
      .map(r => (r.getAs[Long]("bin_id"), r.getAs[Long]("chunk_tokens")))
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val B = TextAnalysisOps.PackBudget
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val byBucket = bins.values.groupBy(f => math.min(f * 10 / B, 10L))
    val tb = bins.size.toDouble
    val tt = bins.values.sum.toDouble
    val util = r6d(tt / (tb * B))
    val got = TextAnalysisOps.packingEfficiency(spark, dir).collect()
    assert(got.map(_.getAs[Long]("bucket")).toSet == byBucket.keySet)
    got.foreach { r =>
      val fills = byBucket(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_bins") == fills.size)
      assert(r.getAs[Double]("bin_share") == r6d(fills.size / tb))
      assert(r.getAs[Double]("mean_fill") == r6d(fills.sum.toDouble / fills.size))
      assert(r.getAs[Double]("utilization") == util)
    }
    // Every bin lands in exactly one bucket; the audit conserves tokens.
    assert(got.map(_.getAs[Long]("n_bins")).sum == bins.size)
  }

  test("q146 promo share recounts; numerator and denominator from one pass") {
    val ptype = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_type").collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[String]("p_type")).toMap
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("m"),
        col("l_partkey"), col("l_extendedprice"), col("l_discount")).collect()
      .map(r => (r.getAs[String]("m"), ptype(r.getAs[Long]("l_partkey")),
        BigDecimal(r.getAs[Double]("l_extendedprice") * (1 - r.getAs[Double]("l_discount")))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)))
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = rows.groupBy(_._1).map { case (m, xs) =>
      val pd = xs.filter(_._2 == "PROMO").map(_._3).sum
      val td = xs.map(_._3).sum
      m -> (r6d(pd.toDouble), r6d(td.toDouble),
        r6d(pd.toDouble * 100 / td.toDouble))
    }
    val got = RelationalOps.promoRevenueShare(spark, dir).collect()
      .map(r => r.getAs[String]("ship_month") -> (r.getAs[Double]("promo_rev"),
        r.getAs[Double]("total_rev"), r.getAs[Double]("promo_share_pct"))).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got.size == 12, "a full year of months at sf0.001")
  }

  test("q145 cluster-size spectrum recounts from q49; shares sum to 1") {
    import graft.operators.DedupOps
    val clusters = DedupOps.dupClusters(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    val sizes = clusters.groupBy(_._2).map { case (_, v) => v.length.toLong }.toSeq
    val expected = sizes.groupBy(identity).map { case (sz, xs) =>
      sz -> (xs.length.toLong, sz * xs.length)
    }
    val td = clusters.length.toDouble
    val tc = sizes.length.toDouble
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = DedupOps.clusterSizeSpectrum(spark, dir).collect()
    assert(got.map(r => r.getAs[Long]("cluster_size") ->
      (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"))).toMap == expected)
    got.foreach { r =>
      assert(r.getAs[Double]("doc_share") == r6d(r.getAs[Long]("n_docs") / td))
      assert(r.getAs[Double]("dup_factor") == r6d(td / tc))
    }
    // The spectrum is a full partition of the corpus.
    assert(got.map(_.getAs[Long]("n_docs")).sum == clusters.length)
    assert(math.abs(got.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-4)
  }

  test("q144 source surprisal re-totals against the per-doc q102 frame") {
    val per = TextAnalysisOps.knSurprisal(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_kn_surprisal"))).toMap
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = per.toSeq.groupBy { case (d, _) => srcOf(d) }
      .map { case (s, xs) =>
        s -> (xs.length.toLong, xs.map(_._2._1).sum,
          r6d(xs.map(x => BigDecimal(x._2._2).setScale(8, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble / xs.length))
      }
    val got = TextAnalysisOps.sourceKnSurprisal(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_doc_surprisal"))).toMap
    assert(got == expected, s"got $got expected $expected")
    // Every document lands in exactly one source row.
    assert(got.values.map(_._1).sum == per.size)
  }

  test("q143 bench-side contamination report counts quoting docs and leaked windows") {
    import spark.implicits._
    import graft.operators.DedupOps
    val out = java.nio.file.Files.createTempDirectory("graft_benchcontam").toString
    val alpha = (0 until 20).map(i => s"alpha$i")
    val bench = alpha.mkString(" ")
    val quote13 = ((0 until 30).map(i => s"uniq$i") ++ alpha.slice(3, 16) ++
      (0 until 20).map(i => s"tail$i")).mkString(" ")
    val quote8 = ((0 until 30).map(i => s"mid$i") ++ alpha.slice(5, 13) ++
      (0 until 20).map(i => s"end$i")).mkString(" ")
    val clean = (0 until 40).map(i => s"clean$i").mkString(" ")
    Seq((97L, bench), (1L, quote13), (2L, quote8), (3L, clean))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val rows = DedupOps.benchContamination(spark, out).collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("bench_id")) ->
        (r.getAs[Long]("n_contaminating_docs"), r.getAs[Long]("n_leaked_windows"))).toMap
    // n=8: docs 1 and 2 both quote item 97. Doc 1 leaks the 6 8-windows of
    // its 13-token quote (starts 3..8); doc 2's single window (start 5) is
    // among them, so the distinct leaked-window union stays 6.
    assert(rows((8L, 97L)) == (2L, 6L), s"got ${rows.get((8L, 97L))}")
    // n=13: only doc 1 survives, leaking exactly its one 13-window.
    assert(rows((13L, 97L)) == (1L, 1L), s"got ${rows.get((13L, 97L))}")
    assert(rows.keySet == Set((8L, 97L), (13L, 97L)))
  }

  test("q142 assignment drift recounts from the shared model; TVD is the half-L1") {
    val asg = SimilarityOps.kmeansModel(spark, dir)._2.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster")))
    val base = asg.filter(_._1 % 2 == 0).groupBy(_._2).map { case (c, v) => c -> v.length.toLong }
    val fresh = asg.filter(_._1 % 2 == 1).groupBy(_._2).map { case (c, v) => c -> v.length.toLong }
    val tb = base.values.sum.toDouble
    val tf = fresh.values.sum.toDouble
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val clusters = asg.map(_._2).distinct.sorted
    val diffs = clusters.map { c =>
      c -> math.abs(base.getOrElse(c, 0L) / tb - fresh.getOrElse(c, 0L) / tf)
    }.toMap
    val tvd = r6d(diffs.values.map(d =>
      BigDecimal(d).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / 2)
    val got = SimilarityOps.assignmentDrift(spark, dir).collect()
    assert(got.map(_.getAs[Long]("cluster")).toSeq == clusters.toSeq)
    got.foreach { r =>
      val c = r.getAs[Long]("cluster")
      assert(r.getAs[Long]("n_base") == base.getOrElse(c, 0L))
      assert(r.getAs[Long]("n_fresh") == fresh.getOrElse(c, 0L))
      assert(r.getAs[Double]("share_base") == r6d(base.getOrElse(c, 0L) / tb))
      assert(r.getAs[Double]("share_fresh") == r6d(fresh.getOrElse(c, 0L) / tf))
      assert(r.getAs[Double]("abs_share_diff") == r6d(diffs(c)))
      assert(r.getAs[Double]("tvd") == tvd, "TVD is one scalar, repeated per row")
    }
    // Both halves are full distributions: shares each sum to 1 within rounding.
    assert(math.abs(got.map(_.getAs[Double]("share_base")).sum - 1.0) < 1e-4)
    assert(math.abs(got.map(_.getAs[Double]("share_fresh")).sum - 1.0) < 1e-4)
  }

  test("q141 budget sweep recounts; thresholding is integer-exact per budget") {
    import graft.operators.DedupOps
    val comp = DedupOps.minhashComponents(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) =>
        d -> rs.map(r => r.getAs[Long]("j") -> r.getAs[Long]("m")).toMap
      }
    val pairs = DedupOps.minhashDupPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = DedupOps.SweepBudgets.map { h =>
      val per = pairs.map { case (a, b, j) =>
        val m = (0L until h).count(k => comp(a)(k) == comp(b)(k)).toLong
        val flip = (m * 10 >= h * 3) != (j >= DedupOps.JaccardThreshold)
        (math.abs(m.toDouble / h - j), flip)
      }
      h -> (pairs.length.toLong,
        r6d(per.map(x => BigDecimal(x._1).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / per.length),
        per.count(_._2).toLong,
        r6d(per.count(_._2).toDouble / per.length))
    }.toMap
    val got = DedupOps.signatureBudgetSweep(spark, dir).collect()
      .map(r => r.getAs[Long]("n_hashes") -> (r.getAs[Long]("n_pairs"),
        r.getAs[Double]("mean_abs_err"), r.getAs[Long]("n_flips"),
        r.getAs[Double]("flip_rate"))).toMap
    assert(got == expected, s"got $got expected $expected")
    // Every budget scores the same candidate population.
    assert(got.values.map(_._1).toSet.size == 1)
  }

  test("q138 calibration recounts from signature components and exact Jaccards") {
    import graft.operators.DedupOps
    val comp = DedupOps.minhashComponents(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) =>
        d -> rs.map(r => r.getAs[Long]("j") -> r.getAs[Long]("m")).toMap
      }
    val pairs = DedupOps.minhashDupPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    assert(pairs.nonEmpty, "q138 needs candidate pairs at sf0.001")
    val per = pairs.map { case (a, b, j) =>
      val est = (0L until DedupOps.NumHashes.toLong)
        .count(k => comp(a)(k) == comp(b)(k)).toDouble / DedupOps.NumHashes
      (math.floor(j * 10).toLong, est, j)
    }
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = per.groupBy(_._1).map { case (bucket, xs) =>
      bucket -> (xs.length.toLong,
        r6d(xs.map(x => BigDecimal(x._2)).sum.toDouble / xs.length),
        r6d(xs.map(x => BigDecimal(x._3)).sum.toDouble / xs.length),
        r6d(xs.map(x => (BigDecimal(x._2) - BigDecimal(x._3)).abs).sum.toDouble / xs.length))
    }
    val got = DedupOps.minhashCalibration(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n_pairs"),
        r.getAs[Double]("mean_est"), r.getAs[Double]("mean_exact"),
        r.getAs[Double]("mean_abs_err"))).toMap
    assert(got == expected, s"got $got expected $expected")
    // Structural pins: each decile's exact mean lies inside its decile, and
    // LSH selection bias shows up as overestimation in the LOW deciles (a
    // pair only becomes a candidate by matching a whole band, which
    // conditions est upward — measured MAE 0.61 in the 0.0x decile at
    // sf0.001). That bias IS the audit's finding; the query exists to
    // measure it, not to hide it. High deciles merely quantize to 1/16.
    got.foreach { case (bucket, (_, meanEst, meanExact, mae)) =>
      assert(meanExact >= bucket / 10.0 - 1e-9 && meanExact < (bucket + 1) / 10.0)
      if (bucket <= 4)
        assert(meanEst >= meanExact - 1e-9,
          s"bucket $bucket: est $meanEst under exact $meanExact")
      assert(mae >= 0.0 && mae <= 1.0)
    }
  }
}
