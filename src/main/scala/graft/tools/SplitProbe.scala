package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** `runMain graft.tools.SplitProbe [sfDir]` — the hot-cell split's
  * before/after measurement (VERDICT r14 #2's done-criterion): build an
  * index, DELIBERATELY skew one coarse cell by appending copies of its
  * own rows (the offline-append recipe — assign against persisted
  * centroids, quantize, fold the size artifact), measure probe-path
  * serve latency and the q202 imbalance stats on the skewed index, run
  * [[SimilarityOps.splitHotCells]] until no cell exceeds the ratio, and
  * measure again. Each latency is a min of 5 after a warmup pass (the
  * ServeProbe discipline). Prints one `[splitprobe]` line per reading so
  * the numbers can be pasted into SCALE.md verbatim.
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val skew = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Cli.session()
    graft.Cli.quietBoundedWindowWarnings()
    import spark.implicits._

    val idx = java.nio.file.Files.createTempDirectory("graft_split_probe").toString
    SimilarityOps.writeIndex(spark, dir, idx)

    // ---- deliberately skewed ingest: append `skew` copies of the
    // biggest cell's own rows (new vec_ids, same embeddings — they
    // re-assign to the same cell by construction), via the offline
    // append path so the size artifact tracks the skew.
    val vdir = SimilarityOps.vectorsPath(spark, idx)
    val hot = spark.read.parquet(vdir).groupBy("cluster").count()
      .orderBy(col("count").desc, col("cluster").asc).collect()(0)
    val hotCluster = hot.getAs[Number]("cluster").longValue()
    val hotRows = spark.read.parquet(vdir)
      .filter(col("cluster") === hotCluster)
      .select("vec_id", "embedding").localCheckpoint(true)
    val maxId = spark.read.parquet(vdir).agg(max("vec_id")).collect()(0).getLong(0)
    (1 to skew).foreach { k =>
      // (maxId+1)·k keeps the per-round id ranges disjoint (a maxId*k+1
      // offset would collide round k's id=maxId with round k+1's id=0).
      val delta = hotRows.select(
        (col("vec_id") + lit((maxId + 1) * k)).as("vec_id"), col("embedding"))
      val art = SimilarityOps.appendArtifacts(spark, idx, delta)
        .withColumn("ingest_batch", lit(-1L))
        .localCheckpoint(true)
      art.write.mode("append").partitionBy("cluster", "ingest_batch").parquet(vdir)
      val deltaCounts = art.groupBy("cluster").count().collect()
        .map(r => r.getAs[Number]("cluster").longValue() -> r.getLong(1)).toMap
      SimilarityOps.bumpBaseClusterSizes(spark, idx, deltaCounts)
      art.unpersist(true)
    }
    graft.operators.Memos.release(idx)

    val panel = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < SimilarityOps.NPanel)
      .orderBy("vec_id")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qdf = panel.toSeq.toDF("query_id", "embedding")
    // A query AT the (pre-split) hot cell's centroid, so the hot cell is
    // always probed — the worst-case probe the imbalance card is about.
    // Materialized as a LITERAL once: the query vector must stay
    // constant across the split (fair before/after), and a frame built
    // over the centroids dir would pin the pre-swap file listing.
    val hotVec: Array[Float] = SimilarityOps.artifactDf(spark, idx, "centroids")
      .filter(col("cluster") === hotCluster)
      .orderBy("pos").select("c").collect().map(_.getDouble(0).toFloat)
    val hotQ = Seq((0L, hotVec)).toDF("query_id", "embedding")

    def imbalance(tag: String): Unit = {
      val (sizes, _) = SimilarityOps.indexClusterSizes(spark, idx)
      println(f"""[splitprobe] "${tag}_K": ${sizes.size}""")
      println(f"""[splitprobe] "${tag}_max_over_mean": ${
        SimilarityOps.indexImbalance(spark, idx)}%.3f""")
    }
    def time(tag: String)(run: => Unit): Unit = {
      run
      val ms = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e6
      }.min
      println(f"""[splitprobe] "$tag": $ms%.1f""")
    }
    def measure(phase: String): Unit = {
      imbalance(phase)
      time(s"${phase}_float_batch20_ms") {
        SimilarityOps.annIvfServeMany(spark, idx, qdf).collect()
      }
      time(s"${phase}_float_hotq_ms") {
        SimilarityOps.annIvfServeMany(spark, idx, hotQ).collect()
      }
      time(s"${phase}_pq_rerank_batch20_ms") {
        SimilarityOps.annPqRerankServeMany(spark, idx, qdf).collect()
      }
    }

    measure("skewed")
    var rounds = 0
    var splits = Seq.empty[(Long, Long)]
    var more = true
    while (more && rounds < 6) {
      val done = SimilarityOps.splitHotCells(spark, idx, ratio = 2.0, maxCells = 8)
      splits ++= done
      rounds += 1
      more = done.nonEmpty
    }
    println(s"""[splitprobe] "split_rounds": $rounds""")
    println(s"""[splitprobe] "cells_split": ${splits.length}""")
    measure("split")
    spark.stop()
  }
}
