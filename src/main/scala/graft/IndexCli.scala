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
