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
}
