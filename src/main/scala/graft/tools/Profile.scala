package graft.tools

import org.apache.spark.sql.functions._

import graft.operators._
import graft.textops.TextOps

/** Dev micro-profiler: times the hot sub-plans twice each (cold/warm) to
  * separate real operator cost from first-touch cache builds and JIT.
  * `sbt "runMain graft.tools.Profile [sfDir]"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Cli.session()

    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $name%-34s run$i: ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      }
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.cache().count()

    time("tokenize explode")(
      docs.select(explode(TextOps.tokenize(col("text"))).as("t")).count())
    val corpus = docs.select(col("doc_id"), col("doc_id").as("doc_idx"), col("text"))
    time("explodedNgrams(4) [codegen path]")(
      graft.stats.GramIndex.explodedNgrams(corpus, col("text"), 4).count())
    time("charNgrams(4) array-HOF [legacy]")(
      docs.select(explode(TextOps.charNgrams(col("text"), 4)).as("g")).count())
    time("shingles explode")(
      docs.select(explode(DedupOps.shingles(col("text"))).as("s")).count())
    time("shingle x16 md5 min-agg")(
      docs.select(col("doc_id"), explode(DedupOps.shingles(col("text"))).as("s"))
        .crossJoin(spark.range(16).select(col("id").as("j")))
        .groupBy("doc_id", "j")
        .agg(min(md5(concat(col("j"), lit(":"), col("s"))))).count())
    time("gram: explode+groupBy tf")(
      graft.stats.GramIndex.explodedNgrams(corpus, col("text"), 4)
        .groupBy("doc_id", "gram").count().count())
    time("gram: full GramIndex.build")({
      val g = graft.stats.GramIndex.build(corpus, col("text"))
      g.docGramVec.count() + g.docNorm.count() + g.gramStats.count()
    })
    time("q41_minhash_bands")(DedupOps.minhashBands(spark, dir).count())
    time("q24_cosine_topk")(RetrievalOps.cosineTopK(spark, dir).count())
    time("q33_langid")(TextAnalysisOps.langId(spark, dir).count())
    time("q25_hybrid_topk")(RetrievalOps.hybridTopK(spark, dir).count())

    spark.stop()
  }
}
