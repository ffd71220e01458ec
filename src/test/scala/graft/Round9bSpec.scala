package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, RelationalOps, EventsOps, SimilarityOps}

/** Round-9 second wave: independent recounts for the new declared
  * queries (the Round8bSpec discipline — every query's oracle parity is
  * necessary, a differently-shaped recount is what catches a shared
  * misreading of the semantics). */
class Round9bSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  // q158/q162 recount at sf0.01: sf0.001's 10 suppliers leave the
  // declared nation pair / nation filter empty — the queries' own
  // oracle parity covers sf0.01 and sf0.1, and the recounts here use
  // the same dirs.
  val sfMid = "/root/testdata/sf0.01"

  test("q158: every excess supplier is real — one supplier recounted pairwise") {
    val out = RelationalOps.excessStockSuppliers(spark, sfMid).collect()
    assert(out.nonEmpty)
    // Independent recount of the first output supplier via driver-side
    // arithmetic over its raw lineitems.
    val sName = out.head.getString(0)
    val sKey = spark.read.parquet(s"$sfMid/supplier.parquet")
      .filter(col("s_name") === sName).collect()(0).getAs[Long]("s_suppkey")
    val li = spark.read.parquet(s"$sfMid/lineitem.parquet")
      .filter(col("l_suppkey") === sKey)
      .select(col("l_partkey"), col("l_quantity"),
        year(col("l_shipdate")).as("yr")).collect()
    val smallParts = spark.read.parquet(s"$sfMid/part.parquet")
      .filter(col("p_name").like("small%"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val byPart = li.groupBy(_.getLong(0)).map { case (pk, rows) =>
      val avail = rows.filter(_.getInt(2) == 1995)
        .map(r => BigDecimal(r.getDouble(1))).sum
      val demand = rows.filter(_.getInt(2) >= 1998)
        .map(r => BigDecimal(r.getDouble(1))).sum
      (pk, avail, demand)
    }
    val excess = byPart.filter { case (pk, a, d) =>
      a > 0 && a > 2 * d && smallParts.contains(pk)
    }.toSeq
    assert(excess.size.toLong == out.head.getAs[Long]("n_excess_parts"))
    val qty = excess.map(_._2).sum.toDouble
    assert(math.abs(qty - out.head.getAs[Double]("excess_qty")) < 1e-6)
  }

  test("q161: one user's streaks recounted from raw events") {
    val out = EventsOps.userStreaks(spark, sf)
      .filter(col("user_id") === 3L).collect()(0)
    val days = EventsOps.events(spark, sf).filter(col("user_id") === 3L)
      .select(expr("CAST(ts AS LONG) DIV 86400")).distinct()
      .collect().map(_.getLong(0)).sorted
    val runs = days.foldLeft(Vector.empty[Vector[Long]]) { (acc, d) =>
      if (acc.nonEmpty && acc.last.last == d - 1) acc.init :+ (acc.last :+ d)
      else acc :+ Vector(d)
    }
    assert(out.getAs[Long]("n_active_days") == days.length.toLong)
    assert(out.getAs[Long]("n_streaks") == runs.size.toLong)
    assert(out.getAs[Long]("longest_streak") == runs.map(_.size).max.toLong)
  }

  test("q162: one (pair, year) cell recounted; directionality is real") {
    val out = RelationalOps.nationTradeVolume(spark, sfMid).collect()
    assert(out.nonEmpty)
    val r = out.head
    // Driver-side recount of the first cell through an independently
    // shaped plan (filter-first, no broadcast hints).
    val sup = spark.read.parquet(s"$sfMid/supplier.parquet")
      .join(spark.read.parquet(s"$sfMid/nation.parquet"),
        col("s_nationkey") === col("n_nationkey") &&
          col("n_name") === r.getString(0))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val cus = spark.read.parquet(s"$sfMid/customer.parquet")
      .join(spark.read.parquet(s"$sfMid/nation.parquet"),
        col("c_nationkey") === col("n_nationkey") &&
          col("n_name") === r.getString(1))
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val orderCust = spark.read.parquet(s"$sfMid/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val rev = spark.read.parquet(s"$sfMid/lineitem.parquet")
      .filter(year(col("l_shipdate")) === r.getAs[Long]("l_year"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect()
      .filter(x => sup.contains(x.getLong(1)) &&
        cus.contains(orderCust(x.getLong(0))))
      .map(x => BigDecimal(x.getDouble(2) * (1 - x.getDouble(3)))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val expect = math.floor(rev * 1e6 + 0.5) / 1e6
    assert(math.abs(expect - r.getAs[Double]("revenue")) < 1e-9)
  }

  test("q163/q165: share identity and same-nation constraint") {
    val shares = RelationalOps.nationMarketShare(spark, sf).collect()
    shares.foreach { r =>
      val n = r.getAs[Double]("nation_rev")
      val t = r.getAs[Double]("total_rev")
      assert(n >= 0 && n <= t)
    }
    // q163 rows are a subset of q03-style revenue: every listed nation is
    // in the declared region.
    val asiaNations = spark.read.parquet(s"$sf/nation.parquet")
      .join(spark.read.parquet(s"$sf/region.parquet"),
        col("n_regionkey") === col("r_regionkey") &&
          col("r_name") === RelationalOps.LocalVolumeRegion)
      .select("n_name").collect().map(_.getString(0)).toSet
    val local = RelationalOps.localSupplierVolume(spark, sf).collect()
    assert(local.nonEmpty)
    local.foreach(r => assert(asiaNations.contains(r.getString(0))))
  }

  test("q164: one customer's returned revenue recounted") {
    val out = RelationalOps.returnedRevenueCustomers(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    val ck = out.head.getAs[Long]("c_custkey")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_custkey") === ck &&
        col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val rev = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .filter(x => orders.contains(x.getLong(0)))
      .map(x => BigDecimal(x.getDouble(1) * (1 - x.getDouble(2)))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val expect = math.floor(rev * 1e6 + 0.5) / 1e6
    assert(math.abs(expect - out.head.getAs[Double]("returned_rev")) < 1e-9)
  }

  test("q166 ties to the fixpoint: bounded labels at ConvergenceProfileRounds equal fixpoint labels") {
    val prof = DedupOps.propagationConvergence(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Convergence on testdata happens within the profile's horizon, so
    // the tail rounds must read zero...
    assert(prof(DedupOps.ConvergenceProfileRounds.toLong) == 0L)
    // ...and the profile's total change mass is exactly the number of
    // label decrements the fixpoint path performed: bounded propagation
    // run to the profile horizon lands on the SAME frame as the
    // converged loop.
    val pairsCount = prof.values.sum
    assert(pairsCount > 0L) // something clustered, the profile is not vacuous
    val bounded = DedupOps.dupClusters(spark, sf)
      .select(col("doc_id"), col("cluster_id"))
    val fix = DedupOps.dupClustersFixpoint(spark, sf)
      .select(col("doc_id"), col("cluster_id"))
    assert(fix.exceptAll(bounded).isEmpty && bounded.exceptAll(fix).isEmpty)
  }

  test("q167: one priority class recounted via EXISTS semantics") {
    val out = RelationalOps.orderPriorityCensus(spark, sf).collect()
    assert(out.nonEmpty)
    val pri = out.head.getString(0)
    val rOrders = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    val n = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === pri &&
        col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-04-01").cast("timestamp"))
      .select("o_orderkey").collect().map(_.getLong(0))
      .count(rOrders.contains)
    assert(n.toLong == out.head.getAs[Long]("order_count"))
  }

  test("fixpoint labels equal union-find components on seeded random graphs") {
    // Deterministic random graphs (including long chains and forests far
    // past diameter 3): the distributed fixpoint must agree with a
    // driver-side union-find on every node.
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 30
      val edges = (1 to 25)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val ra = find(a.toInt); val rb = find(b.toInt)
        if (ra != rb) parent(ra) = rb
      }
      val expect = (0 until n).map { i =>
        i.toLong -> (0 until n).filter(j => find(j) == find(i)).min.toLong
      }.toMap
      val nodes = (0 until n).map(_.toLong).toDF("doc_id")
      val pairs = edges.toDF("src", "dst")
      val fix = DedupOps.fixpointLabels(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fix == expect)
    }
  }

  test("q169: one day's DAU/WAU/MAU recounted from raw user-days") {
    val out = EventsOps.activeUserRatios(spark, sf).collect()
    assert(out.nonEmpty)
    val userDays = EventsOps.events(spark, sf)
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // A mid-stream day with full windows behind it.
    val r = out(out.length / 2)
    val d = r.getAs[Long]("day")
    def active(w: Int) =
      userDays.filter(ud => ud._2 <= d && ud._2 > d - w).map(_._1).distinct.length.toLong
    assert(active(1) == r.getAs[Long]("dau"))
    assert(active(EventsOps.WauDays) == r.getAs[Long]("wau"))
    assert(active(EventsOps.MauDays) == r.getAs[Long]("mau"))
    // Windows nest: dau <= wau <= mau on every row.
    out.foreach { x =>
      assert(x.getAs[Long]("dau") <= x.getAs[Long]("wau"))
      assert(x.getAs[Long]("wau") <= x.getAs[Long]("mau"))
    }
  }

  test("q168: one (cluster, term) lift recounted from raw tokens") {
    val out = SimilarityOps.clusterTopicTerms(spark, sf).collect()
    assert(out.nonEmpty)
    val r = out.head
    val asg = SimilarityOps.kmeansModel(spark, sf)._2.collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("cluster")).toMap
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        explode(graft.textops.TextOps.tokenize(col("text"))).as("term"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val n = toks.length.toLong
    val nC = toks.count(t => asg(t._1) == r.getAs[Long]("cluster")).toLong
    val nT = toks.count(_._2 == r.getString(2)).toLong
    val nCT = toks.count(t =>
      asg(t._1) == r.getAs[Long]("cluster") && t._2 == r.getString(2)).toLong
    assert(nCT == r.getAs[Long]("n_ct"))
    val lift = math.floor((nCT * n).toDouble / (nC * nT).toDouble * 1e6 + 0.5) / 1e6
    assert(lift == r.getAs[Double]("lift"))
    // The reported rank-1 term really is the argmax for its cluster.
    assert(r.getAs[Long]("rank") == 1L)
  }

  test("q160 restricted to qid 0 equals q51") {
    val panel = SimilarityOps.annIvfPanel(spark, sf)
      .filter(col("qid") === 0L).select("vec_id", "rank", "cos")
    val single = SimilarityOps.annIvf(spark, sf)
      .select("vec_id", "rank", "cos")
    assert(panel.exceptAll(single).isEmpty && single.exceptAll(panel).isEmpty)
  }
}
