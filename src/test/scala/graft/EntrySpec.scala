package graft

/** The driver's smoke contract: SparkEntry.entry must return rows > 0 on
  * sf0.001, and every declared query must run with a matching oracle key.
  */
class EntrySpec extends SparkSpec {

  test("entry() returns a non-empty flagship result") {
    val out = SparkEntry.entry(spark)
    val rows = out.collect()
    assert(rows.length == 10)
    assert(rows.head.getAs[Int]("rank") == 1)
  }

  test("every oracle key has a query; every query runs at sf0.001") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // Queries without an oracle are the documented rows-only set: sketch
    // outputs are engine-specific, so q12's HLL and q15's approx
    // quantiles have no cross-engine twin — their error envelopes are
    // pinned by ApproxSpec instead.
    assert((qs.keySet -- SparkEntry.oracleSql.keySet) ==
      Set("q12_approx_distinct_parts", "q15_approx_price_quantiles"))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
