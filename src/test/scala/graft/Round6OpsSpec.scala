package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysisOps
import graft.textops.TextOps

/** Round-6 specs: the blockwise rolling hash (q34), per-shard sequence
  * packing (q47), and Bench's timing self-defense. The cross-engine value
  * check stays with the DuckDB oracle gate; these pin the restructures
  * against the semantics they replaced.
  */
class Round6OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // ---- q34: blockwise rolling hash ----------------------------------------

  test("blockwise rolling hash equals the per-char Horner fold") {
    // Ground truth is the ORIGINAL interpreted formulation, built inline:
    // the blockwise decomposition must reproduce it bit-for-bit, empty
    // docs included.
    val s = TextOps.emKey(col("text"))
    val codes = transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))))
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), when(length(s) === 0, 0L).otherwise(
        aggregate(codes, lit(0L), (acc, c) => (acc * 31 + c) % TextAnalysisOps.RollMod))
        .as("roll_ref"))
    val got = TextAnalysisOps.fingerprints(spark, dir)
      .select("doc_id", "rolling_fp")
    val diff = got.join(expected, "doc_id")
      .filter(col("rolling_fp") =!= col("roll_ref"))
    assert(diff.count() == 0)
    assert(got.count() == expected.count())
  }

  test("blockwise rolling hash plan has no interpreted higher-order function") {
    val plan = TextAnalysisOps.fingerprints(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"), plan.take(2000))
  }

  // ---- q47: per-shard sequence packing ------------------------------------

  private def packingInvariants(shards: Int): Unit = {
    val rows = TextAnalysisOps.sequencePackingSharded(spark, dir, shards).collect()
    val chunks = TextAnalysisOps.docChunks(spark, dir)
      .select("doc_id", "chunk_id", "chunk_tokens").collect()
    // Every chunk is packed exactly once, tokens unchanged.
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      chunks.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // Bin ids are contiguous from 0 (the per-shard offsets tile, not gap).
    val bins = rows.map(_.getLong(3))
    assert(bins.min == 0L)
    assert(bins.toSet == (0L to bins.max).toSet, s"shards=$shards: bin gap")
    // Start-offset binning bounds: every bin holds at most
    // Budget + ChunkSize - 1 tokens, and only a shard-terminal bin (at
    // most `shards` of them) may fall below Budget - ChunkSize + 1.
    val perBin = rows.groupBy(_.getLong(3)).view.mapValues(_.map(_.getLong(2)).sum)
    val hi = TextAnalysisOps.PackBudget + TextAnalysisOps.ChunkSize - 1
    val lo = TextAnalysisOps.PackBudget - TextAnalysisOps.ChunkSize + 1
    perBin.foreach { case (b, t) => assert(t <= hi, s"shards=$shards bin=$b tokens=$t") }
    assert(perBin.count(_._2 < lo) <= shards, s"shards=$shards: too many short bins")
  }

  test("sharded packing invariants hold for S in {1, 4, 8}") {
    Seq(1, 4, 8).foreach(packingInvariants)
  }

  test("packing with shards=1 equals the global single-sequence layout") {
    val ch = TextAnalysisOps.docChunks(spark, dir)
      .select("doc_id", "chunk_id", "chunk_tokens")
    val w = Window.orderBy("doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val globalRef = ch.withColumn("cum", sum(col("chunk_tokens")).over(w))
      .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"),
        expr(s"(cum - chunk_tokens) DIV ${TextAnalysisOps.PackBudget}").as("bin_id"))
    val got = TextAnalysisOps.sequencePackingSharded(spark, dir, 1)
    assert(got.exceptAll(globalRef).count() == 0)
    assert(globalRef.exceptAll(got).count() == 0)
  }

  test("sharded packing plan has no single-partition exchange") {
    val plan = TextAnalysisOps.sequencePacking(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(3000))
  }

  // ---- q73/q74: bigram LM -------------------------------------------------

  test("bigram LM: counts consistent, probabilities in (0,1], mass bounded") {
    val lm = TextAnalysisOps.bigramLm(spark, dir).collect()
    assert(lm.length == TextAnalysisOps.BigramTop)
    // Ranked by c12 descending; every probability is a valid conditional.
    assert(lm.sliding(2).forall(p => p(0).getLong(2) >= p(1).getLong(2)))
    lm.foreach { r =>
      val (c12, c1, p) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(c12 <= c1 && p > 0.0 && p <= 1.0, s"row $r")
    }
  }

  test("bigram surprisal: n_bigrams = max(0, n_word_tokens - 1) per doc") {
    val nb = TextAnalysisOps.bigramSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nt = TextAnalysisOps.tokenCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nb.keySet == nt.keySet)
    nt.foreach { case (d, n) =>
      assert(nb(d) == math.max(0L, n - 1), s"doc $d: ${nb(d)} vs n=$n")
    }
  }

  // ---- q75/q76: dedup policy + leakage-safe splits ------------------------

  test("keep-best: one row per cluster, members add up, kept doc is argmax") {
    import graft.operators.DedupOps
    val kept = DedupOps.dedupKeepBest(spark, dir).collect()
    val clusters = DedupOps.dupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // One kept row per distinct cluster; membership counts tile the corpus.
    assert(kept.map(_.getLong(0)).toSet == clusters.map(_._2).toSet)
    assert(kept.map(_.getLong(1)).sum == clusters.length)
    // The kept doc carries its cluster's best (quality, -doc_id).
    val quality = graft.operators.TextAnalysisOps.textQuality(spark, dir)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCluster = clusters.groupBy(_._2)
    kept.foreach { r =>
      val (cid, keptDoc, keptQ) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val best = byCluster(cid).map(_._1)
        .minBy(d => (-quality(d), d))
      assert(keptDoc == best && keptQ == quality(keptDoc), s"cluster $cid")
    }
  }

  test("splits: cluster-atomic, so every near-dup pair shares a split") {
    import graft.operators.DedupOps
    val splits = DedupOps.leakageSafeSplits(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // Split is a function of the cluster alone.
    splits.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $cid split torn")
    }
    // Direct leakage check on the verified near-dup pairs.
    val byDoc = splits.map(t => t._1 -> t._3).toMap
    val pairs = DedupOps.minhashDupPairs(spark, dir)
      .select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(byDoc(r.getLong(0)) == byDoc(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) crosses the split")
    }
    // Both splits are populated at this SF (90/10 over ~400 clusters).
    assert(splits.map(_._3).distinct.sorted.toSeq == Seq("holdout", "train"))
  }

  // ---- q77: int8-quantized IVF probe --------------------------------------

  test("int8 IVF: full top-k, high agreement with the float probe ranking") {
    import graft.operators.SimilarityOps
    val int8 = SimilarityOps.annIvfInt8(spark, dir).collect()
    val float = SimilarityOps.annIvf(spark, dir).collect()
    assert(int8.length == SimilarityOps.TopK && float.length == SimilarityOps.TopK)
    // Same probed clusters, scores off by bounded reconstruction error
    // (q53 audits it at ~1e-5 MSE): the two rankings must agree on most
    // of the candidate set even if close neighbors swap ranks.
    val a = int8.map(_.getLong(0)).toSet
    val b = float.map(_.getLong(0)).toSet
    val overlap = a.intersect(b).size.toDouble / SimilarityOps.TopK
    assert(overlap >= 0.8, s"top-k overlap $overlap")
    // Every quantized cosine sits close to its float counterpart.
    val fcos = float.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    int8.foreach { r =>
      fcos.get(r.getLong(0)).foreach { f =>
        assert(math.abs(r.getDouble(2) - f) < 0.01,
          s"vec ${r.getLong(0)}: qcos ${r.getDouble(2)} vs cos $f")
      }
    }
  }

  // ---- q78: token-budget curation ------------------------------------------

  test("token-budget curation equals the greedy prefix, maximally") {
    val kept = TextAnalysisOps.tokenBudgetCuration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val all = TextAnalysisOps.textQuality(spark, dir)
      .select("doc_id", "quality_score", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val budget = all.map(_._3).sum / 2
    // Ground truth: driver-side greedy fill in (quality DESC, doc_id) order.
    val greedy = all.sortBy(t => (-t._2, t._1))
      .scanLeft((0L, 0L, 0.0, 0L)) { case ((cum, _, _, _), (d, q, n)) =>
        (cum + n, d, q, cum + n)
      }.drop(1).takeWhile(_._1 <= budget)
      .map(t => (t._2, t._3, t._4)).toSeq
    assert(kept.map(t => (t._1, t._2, t._4)).sortBy(_._1).toSeq ==
      greedy.map(t => (t._1, t._2, t._3)).sortBy(_._1).toSeq)
    // Maximality: the next doc in greedy order would exceed the budget.
    val keptIds = kept.map(_._1).toSet
    val next = all.sortBy(t => (-t._2, t._1)).find(t => !keptIds.contains(t._1))
    next.foreach { case (_, _, n) =>
      assert(kept.map(_._3).sum + n > budget)
    }
  }

  // ---- Bench self-defense -------------------------------------------------

  test("bench defense: suspects are unconfirmed floors, not slow queries") {
    val passes = Seq(
      "steady_fast" -> Vector(0.2, 0.21),
      "steady_slow" -> Vector(1.9, 2.0),            // genuinely slow: not suspect
      "recovered" -> Vector(9.0, 8.5, 0.5, 0.52),   // re-time CONFIRMED the floor: clean
      "one_outlier" -> Vector(1.3, 1.4, 35.0),      // late outlier, min confirmed: clean
      "polluted" -> Vector(5.0, 1.2),               // min seen once, 4x apart: suspect
      "failed" -> Vector(0.3, -1.0))
    assert(Bench.suspectsOf(passes) == Seq("polluted"))
    assert(Bench.minOf(passes.toMap.apply("failed")) == -1.0)
    assert(Bench.minOf(passes.toMap.apply("recovered")) == 0.5)
    assert(Bench.confirmRatio(Vector(9.0, 8.5, 0.5, 0.52)) == 0.52 / 0.5)
    assert(Bench.confirmRatio(Vector(0.3)) == Double.PositiveInfinity)
    // A failed EXTRA pass never erases valid required passes...
    assert(Bench.minOf(Vector(1.0, 5.0, -1.0, 0.9)) == 0.9)
    // ...but a failed required pass is a failure regardless of re-times.
    assert(Bench.minOf(Vector(1.0, -1.0, 0.9, 0.9)) == -1.0)
  }

  test("bench defense: median of mins ignores failures") {
    val m = Bench.medianOfMins(Seq(Vector(0.1, 0.2), Vector(-1.0, 0.4), Vector(0.3, 0.9)))
    // valid mins are (0.1, 0.3): median picks index 1 of the sorted vector
    assert(m == 0.3)
  }
}
