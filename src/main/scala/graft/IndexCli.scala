package graft

import org.apache.spark.sql.functions._

import graft.stats.{GramIndex, IndexStore, TokenIndex}

/** `sbt "runMain graft.BuildIndex <sfDir> [prefix]"` — build the token AND
  * gram indexes over a documents table and persist both as key-bucketed
  * tables, then reload and report: the offline index-build job of the
  * engine.
  */
object BuildIndex {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val prefix = if (args.length > 1) args(1) else "graft_idx"
    val spark = Cli.session()

    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("doc_id").as("doc_idx"), col("text"))
    val idx = TokenIndex.build(corpus, col("text"))
    IndexStore.save(spark, idx, prefix)
    val gidx = GramIndex.build(corpus, col("text"))
    IndexStore.saveGram(spark, gidx, s"${prefix}_gram")

    val loaded = IndexStore.load(spark, prefix)
    val gloaded = IndexStore.loadGram(spark, s"${prefix}_gram")
    println(s"[index] prefix=$prefix docs=${loaded.nDocs} " +
      s"terms=${loaded.termStats.count()} avg_dl=${loaded.avgDl} " +
      s"term_join_shuffle_free=${IndexStore.termJoinIsShuffleFree(spark, prefix)} " +
      s"grams=${gloaded.gramStats.count()} " +
      s"gram_join_shuffle_free=${IndexStore.gramJoinIsShuffleFree(spark, s"${prefix}_gram")}")
    spark.stop()
  }
}

/** `sbt "runMain graft.BuildVectorIndex <sfDir> [outDir]"` — the offline
  * vector-index build job: train the IVF coarse quantizer
  * (SimilarityOps.kmeansModel — fixed-iteration Lloyd k-means), write the
  * embeddings `partitionBy(cluster)` with the learned centroids alongside,
  * then reload and prove the probe read path: filtering on probed clusters
  * must plan as file-level partition pruning (the 100 TB serving shape —
  * the unprobed partitions are never read). KmeansIvfSpec pins the same
  * contract in-test; this is the user-facing job.
  */
object BuildVectorIndex {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "target/graft_ivf_index"
    val spark = Cli.session()
    val (cent, asg) = graft.operators.SimilarityOps.kmeansModel(spark, dir)

    spark.read.parquet(s"$dir/embeddings.parquet")
      .join(asg, "vec_id")
      .write.mode("overwrite").partitionBy("cluster").parquet(out)
    cent.write.mode("overwrite").parquet(s"$out.centroids")

    val reread = spark.read.parquet(out)
    val sizes = reread.groupBy("cluster").count().orderBy("cluster").collect()
    val probe = reread.filter(col("cluster").isin(0, 1))
    val pruned = probe.queryExecution.executedPlan.toString
      .linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("cluster"))
    println(s"[vindex] out=$out clusters=${sizes.length} " +
      s"sizes=${sizes.map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(",")} " +
      s"probe_partition_pruned=$pruned probe_rows=${probe.count()}")
    spark.stop()
  }
}
