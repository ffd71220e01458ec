package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Round-10 pins for the adaptive serving-tier router (VERDICT r9 #1):
  * heuristic boundary placement, the feedback-shifts-choice contract on a
  * planted profile, and the zero-sum bandit fold over the measured panel.
  */
class Round10bSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** Planted feature rows straddling each heuristic decision boundary
    * (margin ≈ 0.01 for rerank, peak ≈ 0.318 for int8-vs-float, margin ≈
    * 0.10 for pq, peak ≈ 0.295 for binary-vs-pq — all inside the measured
    * sf0.01/sf0.1 panel ranges). */
  private def planted = Seq(
    (0L, 1.0, 0.30, 0.005, 0.20), // hardest: tiny margin -> pq_rerank
    (1L, 1.0, 0.40, 0.050, 0.20), // hard + peaky -> float (int8 distorts)
    (2L, 1.0, 0.25, 0.050, 0.20), // hard + smooth -> int8 (cheaper, same recall)
    (3L, 1.0, 0.30, 0.130, 0.20), // easy + peaky-ish: big margin -> pq
    (4L, 1.0, 0.25, 0.130, 0.20)  // easy + smooth: sign codes suffice -> binary
  ).toDF("qid", "q_norm", "peak", "margin", "coverage")

  private def routeOf(w: Map[String, org.apache.spark.sql.Column]): Map[Long, String] =
    SimilarityOps.tierUtilities(planted, w)
      .select(col("qid"), SimilarityOps.tierChoice.as("tier"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private val zeroW = SimilarityOps.Tiers.map(_ -> lit(0.0)).toMap

  test("zero-state heuristics route each planted regime to its tier") {
    assert(routeOf(zeroW) == Map(
      0L -> "pq_rerank", 1L -> "float", 2L -> "int8", 3L -> "pq",
      4L -> "binary"))
  }

  test("feedback shifts tier choice: a planted weight delta flips the " +
    "boundary queries (the reference's update_from_scores contract)") {
    // One panel pass worth of int8 wins (+0.03 * 20 = +0.6, losers -0.2,
    // the q186 fold on this corpus) redirects every regime to int8.
    val w1 = Map("binary" -> lit(-0.2), "float" -> lit(-0.2),
      "int8" -> lit(0.6), "pq" -> lit(-0.2), "pq_rerank" -> lit(-0.2))
    assert(routeOf(w1).values.toSet == Set("int8"))
    // A small, targeted delta moves only the boundary query: pq demoted
    // by one losing pass leaves qid 3 to the runner-up (binary — at peak
    // 0.30 it trails pq by just 0.0045, the 0.295 crossing) while the
    // others are untouched.
    val w2 = Map("binary" -> lit(0.0), "float" -> lit(0.0),
      "int8" -> lit(0.0), "pq" -> lit(-0.2), "pq_rerank" -> lit(0.0))
    val r2 = routeOf(w2)
    assert(r2(3L) == "binary" && r2(0L) == "pq_rerank" &&
      r2(1L) == "float" && r2(2L) == "int8" && r2(4L) == "binary")
  }

  test("utility ties break to the ascending tier name") {
    // Equal utilities across all five tiers: argmax must pick 'binary';
    // with binary out of the tie, 'float'.
    val flat = Seq((0L, 1.0, 0.0, 0.0, 0.0))
      .toDF("qid", "q_norm", "peak", "margin", "coverage")
      .withColumn("u_float", lit(1.0)).withColumn("u_int8", lit(1.0))
      .withColumn("u_pq", lit(1.0)).withColumn("u_pq_rerank", lit(1.0))
    assert(flat.withColumn("u_binary", lit(1.0))
      .select(SimilarityOps.tierChoice).head().getString(0) == "binary")
    assert(flat.withColumn("u_binary", lit(0.5))
      .select(SimilarityOps.tierChoice).head().getString(0) == "float")
  }

  test("q185 panel: exactly one winner per query; utility is the exact " +
    "integer fold n_hits*0.02 - penalty") {
    val rows = SimilarityOps.tierRecallPanel(spark, sf).collect()
    assert(rows.length == 100) // 20 panel queries x 5 tiers
    val byQid = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQid.size == 20)
    byQid.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("is_winner")).sum == 1L)
    }
    rows.foreach { r =>
      val expected = (r.getAs[Long]("n_hits") * 200L -
        SimilarityOps.TierPenE4(r.getAs[String]("tier"))).toDouble / 10000.0
      assert(math.abs(r.getAs[Double]("utility") - expected) < 1e-12)
    }
  }

  test("q186 bandit fold is zero-sum and conserves panel mass") {
    val fb = SimilarityOps.tierFeedback(spark, sf).collect()
    assert(fb.length == 5)
    // +0.03 win / -0.0075 x 4 losers per query: the fold sums to zero
    // (the A12 conservation contract on the vector tiers).
    val total = fb.map(r => math.round(r.getAs[Double]("d_weight") * 1e4)).sum
    assert(total == 0L, s"delta fold must be zero-sum, got $total e-4")
    assert(fb.map(_.getAs[Long]("n_routed_w0")).sum == 20L)
    assert(fb.map(_.getAs[Long]("n_routed_w1")).sum == 20L)
  }
}
