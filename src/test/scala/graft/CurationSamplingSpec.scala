package graft

import org.apache.spark.sql.functions._

import graft.operators.{RelationalOps, SimilarityOps, TextAnalysisOps}

/** Round-8 curation/sampling additions: DSIR importance resampling
  * (q115), cluster-balanced diversity sampling (q116), per-source domain
  * caps (q117), tokenizer fertility by language (q118), semantic
  * decontamination (q119), the mixture weight table (q120), and the
  * q17-q19 relational fill-ins. */
class CurationSamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q17/q18/q19: thresholds bind and every q18 order honors the HAVING floor") {
    val q17 = RelationalOps.smallQuantityRevenue(spark, dir).collect()(0)
    assert(q17.getAs[Long]("n_small") > 0, "q17 brand/quantity predicate selected nothing")
    assert(q17.getAs[Double]("avg_yearly") > 0.0)

    val q18 = RelationalOps.largeOrders(spark, dir).collect()
    assert(q18.nonEmpty && q18.length <= 100)
    assert(q18.forall(_.getAs[Double]("sum_qty") > RelationalOps.LargeOrderQty))
    val qtys = q18.map(_.getAs[Double]("sum_qty")).toSeq
    assert(qtys == qtys.sorted.reverse, "q18 must rank by quantity descending")

    val q19 = RelationalOps.disjunctiveRevenue(spark, dir).collect()(0)
    assert(q19.getAs[Long]("n_items") > 0, "q19 disjunction selected nothing")
    assert(q19.getAs[Double]("revenue") > 0.0)
  }

  test("q115 DSIR: target slice scores higher; resample size exact; deterministic") {
    val rows = TextAnalysisOps.dsirWeights(spark, dir).collect()
    assert(rows.length == 500)

    // The importance weight exists to pull the raw pool toward the target
    // distribution, so the target slice itself must average higher than
    // the rest — the sanity check the DSIR paper's quality plot encodes.
    val (en, rest) = rows.partition(_.getAs[String]("lang") == TextAnalysisOps.DsirTargetLang)
    val meanEn = en.map(_.getAs[Double]("log_weight")).sum / en.length
    val meanRest = rest.map(_.getAs[Double]("log_weight")).sum / rest.length
    assert(meanEn > meanRest,
      s"target-slice mean log-weight $meanEn not above non-target $meanRest")

    val kept = rows.filter(_.getAs[Boolean]("kept"))
    assert(kept.length == TextAnalysisOps.DsirKeepN)
    // Gumbel-top-k draws ∝ softmax(log w): the kept set must lean toward
    // the target distribution relative to the pool (selection is doing
    // something), without being a degenerate argmax of lang alone.
    val keptEnFrac = kept.count(_.getAs[String]("lang") == "en").toDouble / kept.length
    val poolEnFrac = en.length.toDouble / rows.length
    assert(keptEnFrac > poolEnFrac,
      s"kept en-fraction $keptEnFrac not above pool fraction $poolEnFrac")

    val again = TextAnalysisOps.dsirWeights(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "q115 must be deterministic across runs")
  }

  test("q116 cluster-balanced sample: sqrt budgets exact, kept counts honor them") {
    val rows = SimilarityOps.clusterBalancedSample(spark, dir).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, members) =>
      val cellN = members.head.getAs[Long]("cell_n")
      assert(members.length == cellN, s"cell_n mismatch in cluster $c")
      val budget = members.head.getAs[Long]("budget")
      assert(budget == math.ceil(math.sqrt(cellN.toDouble)).toLong)
      val kept = members.count(_.getAs[Boolean]("kept"))
      assert(kept == math.min(budget, cellN),
        s"cluster $c kept $kept, expected min($budget, $cellN)")
    }
    // √-scaling must actually rebalance: the kept share of the largest
    // cell is below the kept share of the smallest (dense modes diluted).
    val shares = byCluster.values.map { m =>
      (m.length, m.count(_.getAs[Boolean]("kept")).toDouble / m.length)
    }.toSeq
    assert(shares.maxBy(_._1)._2 < shares.minBy(_._1)._2)
  }

  test("q117 source caps: kept set IS the per-source quality top-20") {
    val rows = TextAnalysisOps.sourceCaps(spark, dir).collect()
    val quality = TextAnalysisOps.textQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        math.floor(r.getAs[Double]("quality_score") * 1e6 + 0.5).toLong).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, members) =>
      val kept = members.filter(_.getAs[Boolean]("kept"))
      assert(kept.length == math.min(TextAnalysisOps.SourceCap, members.length),
        s"source $src kept ${kept.length}")
      // Independent reference ranking straight off q30's scores.
      val expect = members.map(_.getAs[Long]("doc_id"))
        .sortBy(id => (-quality(id), id))
        .take(TextAnalysisOps.SourceCap).toSet
      assert(kept.map(_.getAs[Long]("doc_id")).toSet == expect,
        s"source $src kept set is not the quality top-${TextAnalysisOps.SourceCap}")
      // Dropped rows never carry a rank.
      assert(members.filterNot(_.getAs[Boolean]("kept"))
        .forall(_.getAs[Long]("src_rank") == -1L))
    }
  }

  test("q119 semantic decontam: argmax matches a driver-side recount; bench excluded") {
    val mod = graft.operators.DedupOps.DecontamMod
    val rows = SimilarityOps.semanticDecontam(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("vec_id") % mod != 0),
      "benchmark slice must not appear among scored vectors")

    val all = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    assert(rows.length == all.size - all.keys.count(_ % mod == 0))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val bench = all.filter(_._1 % mod == 0).toSeq.sortBy(_._1)
    // Recompute the verdict for a handful of vectors end to end.
    rows.filter(r => Seq(1L, 2L, 101L, 350L).contains(r.getAs[Long]("vec_id"))).foreach { r =>
      val v = all(r.getAs[Long]("vec_id"))
      val (bestId, bestCos) = bench.map { case (bid, bv) => (bid, cos(v, bv)) }
        .maxBy { case (bid, c) => (c, -bid) }
      assert(r.getAs[Long]("nearest_bench_id") == bestId)
      assert(math.abs(r.getAs[Double]("max_cos") - bestCos) < 1e-6)
      assert(r.getAs[Boolean]("contaminated") == (bestCos >= SimilarityOps.SemDecontamCos))
    }
  }

  test("q120 mixture: weights normalize, draws fit the budget, tail sources get more epochs") {
    val rows = TextAnalysisOps.mixtureWeights(spark, dir).collect()
    assert(rows.length == 20)
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    val tot = rows.map(_.getAs[Long]("n_tokens")).sum
    val drawn = rows.map(_.getAs[Long]("tokens_drawn")).sum
    assert(drawn <= tot / 2, "per-source floors must never exceed the budget")
    assert(drawn > tot / 2 - rows.length, "floor loss is at most one token per source")
    // α = 0.5 over-samples the tail: epochs must be antitone in source size.
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    bySize.sliding(2).foreach { case Array(small, big) =>
      assert(small.getAs[Double]("epochs") >= big.getAs[Double]("epochs") - 1e-9,
        s"smaller source ${small.getAs[String]("source")} got fewer epochs than " +
          s"${big.getAs[String]("source")}")
    }
  }

  test("q121 QL retrieval: sparse background+correction equals a dense recount") {
    val rows = graft.operators.RetrievalOps.qlTopK(spark, dir).collect()
    assert(rows.length == graft.operators.RetrievalOps.TopK)
    assert(rows.head.getAs[Long]("rank") == 1L)

    // Dense driver-side recount: every (doc, query-term) pair scored with
    // the textbook formula, no background/correction split.
    def tok(s: String): Seq[String] =
      graft.textops.TextOps.TokenRegex.r.findAllIn(s.toLowerCase).toSeq
    val mu = graft.operators.RetrievalOps.QlMu
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> tok(r.getAs[String]("text"))).toMap
    val qTerms = tok(graft.operators.RetrievalOps.Bm25Query)
    val cf = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctot = docs.values.map(_.size.toLong).sum.toDouble
    val scores = docs.map { case (id, toks) =>
      val dl = toks.size.toDouble
      val tf = toks.groupBy(identity).view.mapValues(_.size).toMap
      id -> qTerms.filter(cf.contains).map { t =>
        val p = cf(t) / ctot
        math.log((tf.getOrElse(t, 0) + mu * p) / (dl + mu))
      }.sum
    }
    val expect = scores.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(graft.operators.RetrievalOps.TopK)
    rows.zip(expect).foreach { case (got, (eid, es)) =>
      assert(got.getAs[Long]("doc_id") == eid,
        s"rank ${got.getAs[Long]("rank")}: got doc ${got.getAs[Long]("doc_id")}, want $eid")
      assert(math.abs(got.getAs[Double]("score") - es) < 1e-6)
    }
  }

  test("q122 confusion matrix re-totals to the corpus and to q33's verdicts") {
    val cm = TextAnalysisOps.langConfusion(spark, dir).collect()
    assert(cm.map(_.getAs[Long]("n_docs")).sum == 500L)
    cm.groupBy(_.getAs[String]("actual_lang")).foreach { case (lang, rows) =>
      val fracSum = rows.map(_.getAs[Double]("frac")).sum
      assert(math.abs(fracSum - 1.0) < 1e-4, s"$lang row fracs sum to $fracSum")
    }
    // Diagonal mass == q33's correct count.
    val diag = cm.filter(r =>
        r.getAs[String]("actual_lang") == r.getAs[String]("predicted_lang"))
      .map(_.getAs[Long]("n_docs")).sum
    val correct = TextAnalysisOps.langId(spark, dir)
      .filter(org.apache.spark.sql.functions.col("correct")).count()
    assert(diag == correct, s"diagonal $diag != q33 correct count $correct")
  }

  test("q123/q124: chi-square and burstiness tie to driver-side recounts") {
    import org.apache.spark.sql.functions._
    import graft.operators.EventsOps
    val seas = EventsOps.hourSeasonality(spark, dir).collect()
    assert(seas.nonEmpty)
    seas.foreach { r =>
      assert(r.getAs[Double]("chi2_uniform") >= 0.0)
      assert(r.getAs[Double]("peak_share") >= 1.0 / 24.0 - 1e-9)
      assert(r.getAs[Boolean]("seasonal") ==
        (r.getAs[Double]("chi2_uniform") > EventsOps.ChiSq23Crit01))
    }
    // Recount one type end to end from the raw table.
    val t0 = seas.head.getAs[String]("event_type")
    val hs = EventsOps.events(spark, dir)
      .filter(col("event_type") === t0)
      .groupBy(hour(col("ts")).as("h")).count().collect()
      .map(r => r.getAs[Int]("h") -> r.getAs[Long]("count")).toMap
    val n = hs.values.sum.toDouble
    val e = n / 24.0
    val chi2 = (0 until 24).map(h => { val c = hs.getOrElse(h, 0L).toDouble
      (c - e) * (c - e) / e }).sum
    assert(math.abs(seas.head.getAs[Double]("chi2_uniform") - chi2) < 1e-4)
    assert(seas.head.getAs[Long]("n_events") == n.toLong)

    val b = EventsOps.userBurstiness(spark, dir).collect()
    assert(b.nonEmpty)
    b.foreach { r =>
      val bv = r.getAs[Double]("burstiness")
      assert(bv >= -1.0 - 1e-9 && bv < 1.0, s"burstiness $bv out of range")
      assert(r.getAs[Long]("n_events") == r.getAs[Long]("n_gaps") + 1)
    }
    // Recount one user's gaps.
    val u0 = b.head.getAs[Long]("user_id")
    val eps = EventsOps.events(spark, dir).filter(col("user_id") === u0)
      .select(unix_timestamp(col("ts")).as("ep")).collect()
      .map(_.getAs[Long]("ep")).sorted
    val gaps = eps.sliding(2).map(p => (p(1) - p(0)).toDouble).toSeq
    val mean = gaps.sum / gaps.size
    val sd = math.sqrt(gaps.map(g => (g - mean) * (g - mean)).sum / (gaps.size - 1))
    assert(math.abs(b.head.getAs[Double]("mean_gap_s") - mean) < 1e-4)
    assert(math.abs(b.head.getAs[Double]("cv") - sd / mean) < 1e-4)
  }

  test("q125 known-item eval agrees with the production BM25 scoring path") {
    import org.apache.spark.sql.functions._
    import graft.operators.RetrievalOps
    val rows = RetrievalOps.knownItemEval(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("src_rank") >= 1L)
      assert(math.abs(r.getAs[Double]("rr") - 1.0 / r.getAs[Long]("src_rank")) < 1e-6)
    }
    // Re-derive one query through Retrievers.keywordScores (the q22
    // production path): the source's rank among nonzero-scored docs must
    // match, DECIMAL-vs-plain summation differences notwithstanding
    // (the prefix has <= 8 terms; a rank flip would need a 1e-8 tie).
    val qid = rows.head.getAs[Long]("query_id")
    val prefix = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === qid)
      .select(concat_ws(" ", slice(graft.textops.TextOps.tokenize(col("text")),
        1, RetrievalOps.KnownItemPrefix))).collect()(0).getString(0)
    import spark.implicits._
    val scored = graft.retrieve.Retrievers.keywordScores(
        Seq(("q", prefix)).toDF("query_id", "query"),
        RetrievalOps.tokenIndex(spark, dir))
      .filter(col("score") =!= 0.0).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    val srcScore = scored.find(_._1 == qid).get._2
    val rank = 1 + scored.count { case (d, s) =>
      s > srcScore || (s == srcScore && d < qid) }
    assert(rank == rows.head.getAs[Long]("src_rank"),
      s"production-path rank $rank != q125 rank ${rows.head.getAs[Long]("src_rank")}")
  }

  test("q118 fertility: bounded below by 1, consistent with the q93 per-doc counts") {
    val byLang = TextAnalysisOps.bpeFertility(spark, dir).collect()
    assert(byLang.nonEmpty)
    byLang.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0, s"fertility < 1 for ${r.getAs[String]("lang")}")
      assert(r.getAs[Double]("chars_per_token") >= 1.0)
    }
    // Same apply-join underneath: the per-lang token mass must re-total
    // to q93's per-doc token mass exactly.
    val langTotal = byLang.map(_.getAs[Long]("bpe_tokens")).sum
    val docTotal = TextAnalysisOps.bpeTokenCounts(spark, dir)
      .agg(sum("bpe_tokens")).collect()(0).getLong(0)
    assert(langTotal == docTotal, s"per-lang total $langTotal != per-doc total $docTotal")
  }
}
