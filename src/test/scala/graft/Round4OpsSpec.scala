package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventsOps, MultimodalOps, RelationalOps, SimilarityOps, TextAnalysisOps}

/** Invariant specs for the round-4 operators (q13/q14, q55/q56, q67/q68,
  * q72). The cross-engine value check is the DuckDB oracle gate; these pin
  * the semantic invariants that an oracle refactor could silently lose.
  */
class Round4OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("cube: grand total row equals table count; level counts are consistent") {
    val rows = RelationalOps.cubeSummary(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    val byGid = rows.groupBy(_.getLong(0))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val grand = byGid(3L)
    assert(grand.length == 1 && grand.head.getLong(3) == total)
    // every grouping level partitions the table: counts sum to the total
    (0L to 2L).foreach { gid =>
      assert(byGid(gid).map(_.getLong(3)).sum == total, s"gid=$gid")
    }
  }

  test("quantiles: ordered p25<=p50<=p75 within [min,max]; group counts sum") {
    val rows = RelationalOps.priceQuantiles(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (n25, n50, n75) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (mn, mx) = (r.getDouble(5), r.getDouble(6))
      assert(mn <= n25 && n25 <= n50 && n50 <= n75 && n75 <= mx, r.toString)
    }
  }

  test("surprisal: covers every doc; ppl = exp(mean); positive where tokens exist") {
    val rows = TextAnalysisOps.unigramSurprisal(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (n, mean, ppl) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      if (n > 0) assert(mean > 0, r.toString)
      assert(math.abs(ppl - math.exp(mean)) < 1e-3, r.toString)
    }
  }

  test("char entropy: bounded by log2(distinct chars); covers every doc") {
    val rows = TextAnalysisOps.charEntropy(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (k, e) = (r.getLong(1), r.getDouble(2))
      assert(e >= 0.0, r.toString)
      if (k > 0)
        assert(e <= math.log(k.toDouble) / math.log(2.0) + 1e-6, r.toString)
    }
  }

  test("retention: offset-0 counts are cohort sizes and dominate later offsets") {
    val rows = EventsOps.retentionCohorts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohortSize = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    // every cohort has an offset-0 row (each member is active on its min day)
    assert(rows.map(_._1).distinct.forall(cohortSize.contains))
    rows.foreach { case (c, off, n) =>
      assert(n <= cohortSize(c), s"cohort $c offset $off: $n > ${cohortSize(c)}")
    }
    // offset-0 sizes sum to the distinct-user count
    val users = EventsOps.queries("q62_user_sessions")(spark, dir)
      .select("user_id").distinct().count()
    assert(cohortSize.values.sum == users)
  }

  test("transitions: probabilities sum to 1 per source type") {
    val rows = EventsOps.eventTransitions(spark, dir).collect()
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$from: $psum")
    }
  }

  test("novelty: n_novel <= n_distinct_trigrams; frac consistent; all docs") {
    val rows = TextAnalysisOps.ngramNovelty(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (n, novel, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel <= n, r.toString)
      if (n > 0) assert(math.abs(frac - novel.toDouble / n) < 1e-6, r.toString)
      else assert(frac == 0.0)
    }
  }

  test("anomalies: z-scores per type sum to ~0; flag matches |z|>2") {
    val rows = EventsOps.eventAnomalies(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      // standardized scores are centered (up to r6 rounding per row)
      val zsum = rs.map(_.getDouble(3)).sum
      assert(math.abs(zsum) < 1e-4 * rs.length, s"$tpe: $zsum")
    }
    rows.foreach { r =>
      assert(r.getBoolean(4) == (math.abs(r.getDouble(3)) > 2.0), r.toString)
    }
  }

  test("centroid stats: member counts partition the table; cosines coherent") {
    val rows = SimilarityOps.centroidStats(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (norm, mean, mn) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(norm > 0, r.toString)
      assert(mn <= mean && mean <= 1.0 + 1e-9, r.toString)
      // clustered synthetic data: members should cohere with their centroid
      assert(mean > 0.0, r.toString)
    }
  }

  test("frame sample: offsets are stride-aligned; byte values are ASCII") {
    val rows = MultimodalOps.frameSample(spark, dir).limit(5000).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (idx, off, b) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(off == idx * MultimodalOps.FrameStride + 1, r.toString)
      assert(b >= 32 && b < 127, r.toString)
    }
  }
}
