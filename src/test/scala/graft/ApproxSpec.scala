package graft

import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** approx_count_distinct has no cross-engine oracle (sketch values are
  * implementation-specific); pin the relative-error envelope instead.
  */
class ApproxSpec extends SparkSpec {

  test("approx distinct counts are within 10% of exact at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val approx = RelationalOps.approxDistinctParts(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("p"), countDistinct("l_suppkey").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p, s)) =>
      val (ap, as_) = approx(k)
      assert(math.abs(ap - p).toDouble / p < 0.10, s"$k parts: $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s < 0.10, s"$k supps: $as_ vs $s")
    }
  }

  test("approx quantiles sit within a 2% value envelope of exact at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    // approx_percentile at accuracy 10000 bounds RANK error by n/10000
    // (< 1 rank per sf0.001 group); a 2% VALUE envelope vs the exact
    // type-7 quartiles comfortably absorbs both that and the
    // nearest-rank-vs-interpolated convention gap.
    val approx = RelationalOps.approxPriceQuantiles(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val exact = RelationalOps.priceQuantiles(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(k)
      Seq(("p25", a25, e25), ("p50", a50, e50), ("p75", a75, e75)).foreach {
        case (q, a, e) =>
          assert(math.abs(a - e) / e < 0.02, s"$k $q: approx $a vs exact $e")
      }
    }
  }
}
