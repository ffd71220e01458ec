package graft

import org.apache.spark.sql.functions._

/** Pins the IVF scale contract (SimilarityOps.annIvf doc): when the
  * embeddings table is PARTITIONED BY the cluster label, the probe filter
  * reaches the scan as a PartitionFilter — cluster probing IS partition
  * pruning, reading only the probed clusters' files, not a post-scan
  * filter over the full table.
  */
class PartitionPruningSpec extends SparkSpec {

  test("label-partitioned embeddings scan prunes to the probed clusters") {
    val src = "/root/testdata/sf0.001/embeddings.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.read.parquet(src).write.mode("overwrite").partitionBy("label").parquet(dir)

    val probed = Seq(1, 3)
    val scan = spark.read.parquet(dir).filter(col("label").isin(probed: _*))
    val plan = scan.queryExecution.executedPlan.toString

    // The label predicate must appear as a PartitionFilter on the scan
    // node (file-level pruning), not merely as a post-scan Filter.
    val partFilterLine = plan.linesIterator
      .find(_.contains("PartitionFilters"))
      .getOrElse(fail("no PartitionFilters in plan:\n" + plan))
    assert(partFilterLine.contains("label"),
      s"label missing from partition filters: $partFilterLine")

    // Pruned read returns exactly the rows a full-scan filter would.
    val expected = spark.read.parquet(src)
      .filter(col("label").isin(probed: _*)).count()
    assert(scan.count() == expected && expected > 0)
  }
}
