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

  // ---- Bench self-defense -------------------------------------------------

  test("bench defense: suspects are irreproducible timings, not slow queries") {
    val passes = Seq(
      "steady_fast" -> Vector(0.2, 0.21),
      "steady_slow" -> Vector(1.9, 2.0),             // genuinely slow: not suspect
      "recovered" -> Vector(9.0, 8.5, 0.5, 0.52),    // re-time found the floor: suspect spread
      "polluted" -> Vector(5.0, 1.2),                // passes disagree >3x: suspect
      "failed" -> Vector(0.3, -1.0))
    assert(Bench.suspectsOf(passes) == Seq("recovered", "polluted"))
    assert(Bench.minOf(passes.toMap.apply("failed")) == -1.0)
    assert(Bench.minOf(passes.toMap.apply("recovered")) == 0.5)
  }

  test("bench defense: median of mins ignores failures") {
    val m = Bench.medianOfMins(Seq(Vector(0.1, 0.2), Vector(-1.0, 0.4), Vector(0.3, 0.9)))
    // valid mins are (0.1, 0.3): median picks index 1 of the sorted vector
    assert(m == 0.3)
  }
}
