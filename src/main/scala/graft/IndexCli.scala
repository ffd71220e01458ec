package graft

import org.apache.spark.sql.functions._

import graft.stats.{IndexStore, TokenIndex}

/** `sbt "runMain graft.BuildIndex <sfDir> [prefix]"` — build the token
  * index over a documents table and persist it as term-bucketed tables,
  * then reload and report: the offline index-build job of the engine.
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

    val loaded = IndexStore.load(spark, prefix)
    println(s"[index] prefix=$prefix docs=${loaded.nDocs} " +
      s"terms=${loaded.termStats.count()} avg_dl=${loaded.avgDl} " +
      s"term_join_shuffle_free=${IndexStore.termJoinIsShuffleFree(spark, prefix)}")
    spark.stop()
  }
}
