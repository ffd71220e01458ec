package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: makes the engine's native expressions
  * addressable from SQL, so a cluster enables the library with
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * and then `SELECT cosine_similarity(emb_a, emb_b)` plans the codegen'd
  * Catalyst expression directly — no Column-API import needed, and the
  * function participates in whole-stage codegen like any builtin.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarityFn)
    ext.injectFunction(GraftExtensions.charEntropyFn)
    ext.injectFunction(GraftExtensions.charDistinctFn)
  }
}

object GraftExtensions {

  private def build(children: Seq[Expression]): Expression = {
    require(children.size == 2, "cosine_similarity(a, b) takes exactly 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  private def buildEntropy(children: Seq[Expression]): Expression = {
    require(children.size == 1, "char_entropy_nats_neg(s) takes exactly 1 argument")
    CharEntropyNatsNeg(children.head)
  }

  private def buildDistinct(children: Seq[Expression]): Expression = {
    require(children.size == 1, "char_distinct(s) takes exactly 1 argument")
    CharDistinct(children.head)
  }

  private[functions] val charEntropyFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_entropy_nats_neg"),
    new ExpressionInfo(
      classOf[CharEntropyNatsNeg].getName, null, "char_entropy_nats_neg",
      "char_entropy_nats_neg(s) - negated Shannon entropy (nats) of the " +
        "character histogram of s, DECIMAL(30,8)-accumulated.",
      "", "", "", "", "", "", "scala_udf"),
    buildEntropy _)

  private[functions] val charDistinctFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_distinct"),
    new ExpressionInfo(
      classOf[CharDistinct].getName, null, "char_distinct",
      "char_distinct(s) - distinct character count of s.",
      "", "", "", "", "", "", "scala_udf"),
    buildDistinct _)

  private[functions] val cosineSimilarityFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(
      classOf[CosineSimilarity].getName, null, "cosine_similarity",
      "cosine_similarity(a, b) - cosine of two ARRAY<FLOAT> embeddings " +
        "(double accumulation; 0.0 on zero norms).",
      "", "", "", "", "", "", "scala_udf"),
    build _)

  /** Late registration on an already-running session (the extensions conf
    * only applies at session construction). Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cosine_similarity", build, "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("char_entropy_nats_neg", buildEntropy, "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("char_distinct", buildDistinct, "scala_udf")
  }
}
