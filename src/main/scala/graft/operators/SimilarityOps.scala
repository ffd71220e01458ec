package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT> (64-dim), label INT).
  *
  * Three tiers, mirroring how a 100 TB similarity pipeline scales:
  *   - brute force: one codegen'd cosine scan — the correctness baseline,
  *     O(N) per query, embarrassingly parallel, no shuffle;
  *   - IVF: coarse-quantize by cluster (here: the provided `label` as the
  *     cluster id, centroids = per-cluster mean), probe the nprobe nearest
  *     clusters only — at scale the table is PARTITIONED BY cluster so the
  *     probe is partition pruning, not a filter;
  *   - LSH: sign-random-projection bucketing against fixed anchor vectors —
  *     bucket ids are computable row-local (map-side), candidates co-group
  *     by bucket key, so the candidate join is a hash join on a short key.
  *
  * The query vector is embeddings[vec_id = QueryVecId] so both engines
  * derive it from the same table.
  */
object SimilarityOps {

  val QueryVecId = 0L
  val TopK = 50
  val NProbe = 2
  val LshAnchors = 5

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Double-precision cosine between two array columns of any numeric
    * element type, via higher-order functions (used where one side is a
    * double-typed centroid; the float-float hot path uses the native
    * expression instead).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
  }

  // ---- q50: brute-force cosine top-k --------------------------------------

  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("embedding").as("q_embedding"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), cosineSim(col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"),
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc))
          .cast("long").as("rank"),
        r6(col("cos")).as("cos"))
      .orderBy("rank")
  }

  /** Explicit double-precision cosine in SQL (not list_cosine_similarity,
    * whose internal precision is unspecified). */
  private def sqlCos(a: String, b: String): String =
    s"""(CASE WHEN sqrt(list_sum([($a[i])::DOUBLE * ($a[i])::DOUBLE FOR i IN range(1, len($a) + 1)])) = 0
       |       OR sqrt(list_sum([($b[i])::DOUBLE * ($b[i])::DOUBLE FOR i IN range(1, len($b) + 1)])) = 0
       |  THEN 0.0
       |  ELSE list_sum([($a[i])::DOUBLE * ($b[i])::DOUBLE FOR i IN range(1, len($a) + 1)]) /
       |    (sqrt(list_sum([($a[i])::DOUBLE * ($a[i])::DOUBLE FOR i IN range(1, len($a) + 1)])) *
       |     sqrt(list_sum([($b[i])::DOUBLE * ($b[i])::DOUBLE FOR i IN range(1, len($b) + 1)])))
       |END)""".stripMargin

  val annBruteForceSql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $QueryVecId),
       |sc AS (SELECT vec_id, ${sqlCos("embedding", "qe")} AS cos FROM embeddings, q),
       |rk AS (SELECT vec_id, cos,
       |         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank FROM sc)
       |SELECT vec_id, rank, floor((cos) * 1000000 + 0.5) / 1000000 AS cos FROM rk
       |WHERE rank <= $TopK ORDER BY rank""".stripMargin

  // ---- q51: IVF (coarse clusters = label, probe nearest centroids) --------

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)

    // Per-cluster mean centroid (double), rebuilt as an array ordered by pos.
    val centroids = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("embedding").as("q_embedding"))

    // Probe the NProbe clusters whose centroids are nearest to the query.
    val probed = centroids.crossJoin(broadcast(q))
      .select(col("label"), cosineHof(col("centroid"), col("q_embedding")).as("ccos"))
      .orderBy(col("ccos").desc, col("label").asc)
      .limit(NProbe)
      .select("label")

    // At scale `e` is partitioned by cluster id: this join IS partition
    // pruning. Search only within probed clusters.
    e.join(broadcast(probed), "label")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), cosineSim(col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"),
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc))
          .cast("long").as("rank"),
        r6(col("cos")).as("cos"))
      .orderBy("rank")
  }

  val annIvfSql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $QueryVecId),
       |cpos AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
       |                unnest(embedding) AS v FROM embeddings),
       |cmean AS (SELECT label, pos, avg(v::DOUBLE) AS m FROM cpos GROUP BY 1, 2),
       |cent AS (SELECT label, list(m ORDER BY pos) AS centroid FROM cmean GROUP BY label),
       |probe AS (SELECT label FROM
       |            (SELECT label, ${sqlCos("centroid", "qe")} AS ccos FROM cent, q)
       |          ORDER BY ccos DESC, label ASC LIMIT $NProbe),
       |sc AS (SELECT vec_id, ${sqlCos("embedding", "qe")} AS cos
       |       FROM embeddings JOIN probe USING (label), q),
       |rk AS (SELECT vec_id, cos,
       |         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank FROM sc)
       |SELECT vec_id, rank, floor((cos) * 1000000 + 0.5) / 1000000 AS cos FROM rk
       |WHERE rank <= $TopK ORDER BY rank""".stripMargin

  // ---- q52: LSH sign-projection buckets -----------------------------------

  /** Bucket signature: sign bits of the dot products against the anchor
    * embeddings (vec_id 1..LshAnchors) — row-local, map-side computable. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val anchors = e.filter(col("vec_id").between(1, LshAnchors))
      .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor"))

    val dots = e.crossJoin(broadcast(anchors))
      .select(col("vec_id"),
        col("anchor_id"),
        when(cosineSim(col("embedding"), col("anchor")) >= 0.0, lit(1)).otherwise(lit(0))
          .as("bit"))
    val buckets = dots.groupBy("vec_id")
      .agg(sum(col("bit") * pow(lit(2.0), col("anchor_id") - 1)).cast("long").as("bucket"))

    val qBucket = buckets.filter(col("vec_id") === QueryVecId)
      .select(col("bucket").as("q_bucket"))
    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("embedding").as("q_embedding"))

    e.join(buckets, "vec_id")
      .join(broadcast(qBucket), col("bucket") === col("q_bucket"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("bucket"),
        cosineSim(col("embedding"), col("q_embedding")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(TopK)
      .select(col("vec_id"), col("bucket"),
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc))
          .cast("long").as("rank"),
        r6(col("cos")).as("cos"))
      .orderBy("rank")
  }

  val annLshSql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $QueryVecId),
       |anch AS (SELECT vec_id AS anchor_id, embedding AS anchor FROM embeddings
       |         WHERE vec_id BETWEEN 1 AND $LshAnchors),
       |dots AS (SELECT e.vec_id, a.anchor_id,
       |           CASE WHEN ${sqlCos("e.embedding", "a.anchor")} >= 0.0 THEN 1 ELSE 0 END AS bit
       |         FROM embeddings e, anch a),
       |bk AS (SELECT vec_id, CAST(sum(bit * (2 ** (anchor_id - 1))) AS BIGINT) AS bucket
       |       FROM dots GROUP BY vec_id),
       |qb AS (SELECT bucket AS q_bucket FROM bk WHERE vec_id = $QueryVecId),
       |sc AS (SELECT e.vec_id, bk.bucket, ${sqlCos("e.embedding", "qe")} AS cos
       |       FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id
       |       JOIN qb ON bk.bucket = qb.q_bucket, q),
       |rk AS (SELECT vec_id, bucket, cos,
       |         row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank FROM sc)
       |SELECT vec_id, bucket, rank, floor((cos) * 1000000 + 0.5) / 1000000 AS cos FROM rk
       |WHERE rank <= $TopK ORDER BY rank""".stripMargin

  // ---- q53: int8 symmetric quantization + reconstruction error ------------

  /** Per-vector int8 quantization audit — the compression pass an ANN
    * serving tier runs before shipping embeddings: symmetric scale
    * amax/127, qv = floor(v/scale + 0.5) ∈ [−127, 127], and the
    * reconstruction-error stats (MSE, max abs error) that decide whether
    * int8 is acceptable for a given corpus.
    *
    * Long-form posexplode keeps everything in whole-stage codegen (array
    * HOFs run interpreted); per-vector sums are map-side partial. The
    * rounding is floor(x + 0.5) — pure double arithmetic, identical in
    * both engines (`round()` is not portable) — and the MSE accumulates in
    * DECIMAL(38,18) so partition sum order can't move the 6th decimal. */
  def embeddingQuantization(spark: SparkSession, dir: String): DataFrame = {
    val ex = emb(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v0")))
      .select(col("vec_id"), col("v0").cast("double").as("v"))
    val amax = ex.groupBy("vec_id").agg(max(abs(col("v"))).as("amax"))
    val er = ex.join(amax, "vec_id")
      .withColumn("scale", when(col("amax") === 0.0, 1.0).otherwise(col("amax") / 127.0))
      .withColumn("err", col("v") - floor(col("v") / col("scale") + 0.5) * col("scale"))
    er.groupBy("vec_id")
      .agg(
        count(lit(1)).as("dims"),
        r6(min(col("scale"))).as("scale"),
        r6(sum((col("err") * col("err")).cast("decimal(38,18)")).cast("double") /
          count(lit(1))).as("mse"),
        r6(max(abs(col("err")))).as("max_abs_err"))
      .orderBy("vec_id")
  }

  val embeddingQuantizationSql: String =
    """WITH ex AS (SELECT vec_id, (unnest(embedding))::DOUBLE AS v FROM embeddings),
      |mx AS (SELECT vec_id, max(abs(v)) AS amax FROM ex GROUP BY vec_id),
      |er AS (SELECT ex.vec_id, v,
      |         CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END AS scale,
      |         v - floor(v / (CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END) + 0.5)
      |             * (CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END) AS err
      |       FROM ex JOIN mx ON ex.vec_id = mx.vec_id)
      |SELECT vec_id, count(*) AS dims,
      |  floor((min(scale)) * 1000000 + 0.5) / 1000000 AS scale,
      |  floor((CAST(sum(CAST(err * err AS DECIMAL(38,18))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mse,
      |  floor((max(abs(err))) * 1000000 + 0.5) / 1000000 AS max_abs_err
      |FROM er GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---- q58: per-cluster centroid quality audit ----------------------------

  /** IVF index-health stats per cluster: member count, centroid L2 norm,
    * and the mean / worst member-to-centroid cosine — the numbers that
    * decide when a partition needs re-clustering (low mean cohesion) or
    * splitting (fat clusters). Centroid means accumulate per (label, pos)
    * in DECIMAL(38,18) (parallel double sums are order-dependent); the
    * member cosines then re-use the q51 centroid-vs-float HOF path, and
    * per-label cosine means ride dsum. Shuffles: one long-form aggregate
    * keyed (label, pos), one per-label aggregate — both partial-agg
    * friendly; centroids are cluster-count-sized and broadcast back. */
  def centroidStats(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val ex = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v0")))
      .select(col("label"), col("pos"), col("v0").cast("double").as("v"))
    val cent = ex.groupBy("label", "pos")
      .agg((sum(col("v").cast("decimal(38,18)")).cast("double") / count(lit(1))).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))
      .withColumn("cnorm",
        sqrt(aggregate(transform(col("centroid"), x => x * x), lit(0.0), (a, v) => a + v)))
    e.join(broadcast(cent), "label")
      .select(col("label"), col("cnorm"),
        cosineHof(col("embedding"), col("centroid")).as("cos"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        r6(first(col("cnorm"))).as("centroid_norm"),
        r6(davg(col("cos"))).as("mean_cos"),
        r6(min(col("cos"))).as("min_cos"))
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        col("centroid_norm"), col("mean_cos"), col("min_cos"))
      .orderBy("label")
  }

  val centroidStatsSql: String =
    s"""WITH ex AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
       |                   (unnest(embedding))::DOUBLE AS v FROM embeddings),
       |cm AS (SELECT label, pos,
       |         CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS m
       |       FROM ex GROUP BY 1, 2),
       |cent AS (SELECT label, list(m ORDER BY pos) AS centroid FROM cm GROUP BY label),
       |cn AS (SELECT label, centroid,
       |         sqrt(list_sum([centroid[i] * centroid[i]
       |                        FOR i IN range(1, len(centroid) + 1)])) AS cnorm
       |       FROM cent),
       |sc AS (SELECT e.label, cnorm, ${sqlCos("e.embedding", "centroid")} AS cos
       |       FROM embeddings e JOIN cn ON e.label = cn.label)
       |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
       |  floor((any_value(cnorm)) * 1000000 + 0.5) / 1000000 AS centroid_norm,
       |  floor((CAST(sum(CAST(cos AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_cos,
       |  floor((min(cos)) * 1000000 + 0.5) / 1000000 AS min_cos
       |FROM sc GROUP BY label ORDER BY label""".stripMargin

  // -------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_centroid_stats" -> (centroidStats _),
    "q50_ann_bruteforce" -> (annBruteForce _),
    "q51_ann_ivf" -> (annIvf _),
    "q52_ann_lsh" -> (annLsh _),
    "q53_embedding_quantization" -> (embeddingQuantization _))

  val oracles: Map[String, String] = Map(
    "q58_centroid_stats" -> centroidStatsSql,
    "q50_ann_bruteforce" -> annBruteForceSql,
    "q51_ann_ivf" -> annIvfSql,
    "q52_ann_lsh" -> annLshSql,
    "q53_embedding_quantization" -> embeddingQuantizationSql)
}
