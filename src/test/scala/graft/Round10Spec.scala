package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, RelationalOps}

/** Round-10 pins: large-star/small-star connected components (VERDICT r9
  * #5), the no-forced-broadcast convention on customer/supplier-shaped
  * join sides (VERDICT r9 #2), and the new TPC-H shapes' plan properties.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  // ---- large-star/small-star CC -------------------------------------------

  test("starLabels: 32-node chain converges in <= 6 alternating rounds " +
    "(vs 31 propagation rounds) with every label = 0") {
    val nodes = (0L until 32L).toDF("doc_id")
    val pairs = (0L until 31L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = DedupOps.starLabelsWithRounds(nodes, pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 32 && got.values.forall(_ == 0L),
      s"chain must collapse to component min 0, got $got")
    assert(rounds <= 6, s"expected <= 6 alternating rounds on a 32-chain, took $rounds")
  }

  test("starLabels == fixpointLabels on seeded random graphs (incl. forests)") {
    val rnd = new scala.util.Random(1234)
    (1 to 3).foreach { _ =>
      val n = 40
      val edges = (1 to 30)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val nodes = (0 until n).map(_.toLong).toDF("doc_id")
      val pairs = edges.toDF("src", "dst")
      val star = DedupOps.starLabels(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fix = DedupOps.fixpointLabels(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == fix)
    }
  }

  test("starLabels: isolated nodes label themselves; empty edge set works") {
    val nodes = Seq(7L, 9L, 11L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = DedupOps.starLabels(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 7L, 9L -> 9L, 11L -> 11L))
  }

  // ---- broadcast convention: AQE picks BHJ where the hints were dropped ----

  /** Executed-plan audit (the ExplainAudit assertion VERDICT r9 #4 asked
    * for): with the forced customer/supplier hints REMOVED, the runtime
    * (static size estimate or AQE re-plan) must still choose broadcast
    * joins at test scale — proving the hints were redundant where they
    * were safe, while scale now gets the shuffle fallback a forced hint
    * forfeits. */
  private def finalPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.toRdd.count() // finalize AQE
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("TPC-H shapes: customer/supplier joins plan as BroadcastHashJoin " +
    "at test scale without forced hints") {
    Seq(
      "q02_top_revenue_orders" -> 1,
      "q03_region_revenue" -> 3,
      "q162_nation_trade_volume" -> 4,
      "q163_local_supplier_volume" -> 3,
      "q164_returned_revenue_customers" -> 2,
      "q165_nation_market_share" -> 2).foreach { case (name, minBhj) =>
      val plan = finalPlanOf(name)
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      assert(bhj >= minBhj,
        s"$name: expected >= $minBhj BroadcastHashJoin in executed plan, saw $bhj")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name: unexpected BroadcastNestedLoopJoin")
    }
  }

  // ---- q180-q183 TPC-H shapes ---------------------------------------------

  test("q180: every reported supplier's cost equals the part's regional min") {
    val out = RelationalOps.minCostSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    // Recompute the regional min unit cost per part driver-side.
    val regionSupp = spark.read.parquet(s"$sf/supplier.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$sf/region.parquet")
        .filter(col("r_name") === RelationalOps.MinCostRegion),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val minCost = spark.read.parquet(s"$sf/lineitem.parquet")
      .collect()
      .filter(r => regionSupp.contains(r.getAs[Long]("l_suppkey")))
      .groupBy(_.getAs[Long]("l_partkey"))
      .map { case (pk, rows) =>
        pk -> rows.map(r => math.floor(r.getAs[Double]("l_extendedprice") /
          r.getAs[Double]("l_quantity") * 1e6 + 0.5).toLong).min
      }
    out.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      val cost = math.round(r.getAs[Double]("unit_cost") * 1e6)
      assert(cost == minCost(pk), s"part $pk: $cost != ${minCost(pk)}")
    }
  }

  test("q182: kept parts all exceed the mean-multiple bar; one part recounted") {
    val out = RelationalOps.importantStock(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("mean_mult") >
      RelationalOps.StockShareMult.toDouble - 0.001))
    val pk = out.head.getAs[Long]("p_partkey")
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$sf/region.parquet")
        .filter(col("r_name") === RelationalOps.MinCostRegion),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_partkey") === pk).collect()
      .filter(r => supp.contains(r.getAs[Long]("l_suppkey")))
      .map(r => BigDecimal(r.getAs[Double]("l_extendedprice"))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum
    val got = BigDecimal(out.head.getAs[Double]("stock_value"))
    assert((got - expected).abs < 1e-5, s"$got vs $expected")
  }

  test("q183: high + low line counts partition the year's joined lines") {
    val out = RelationalOps.priorityShipping(spark, sf).collect()
    assert(out.nonEmpty)
    val total = out.map(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(total == expected)
  }
}
