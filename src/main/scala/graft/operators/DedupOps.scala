package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim
import graft.textops.TextOps

/** Deduplication operators over `documents` — the core of any large-scale
  * training-data pipeline: exact (content hash), MinHash+LSH banding,
  * SimHash, shingle-set Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (see SCALE.md): signatures (fingerprint, minhash, band
  * hashes) are computed map-side inside whole-stage codegen, with map-side
  * partial aggregation collapsing to O(signature) rows per doc before any
  * shuffle. Candidate generation is always a hash join on a compact key
  * (df-bounded shingle, band hash, cluster label), never an all-pairs
  * cross join; verification runs only on candidates. MD5 is the hash
  * family so the DuckDB oracle can recompute identical signatures.
  */
object DedupOps {

  val NumHashes = 16
  val BandSize = 4 // → 4 bands
  val ShingleSize = 3
  val JaccardThreshold = 0.30
  /** Blocking bound: only shingles appearing in <= MaxBlockDf docs generate
    * candidate pairs. No-op at the test scale factors (max shingle df ~25)
    * but caps the Σ df² join blowup on a real corpus; near-dup pairs always
    * share rare shingles, so recall loss is negligible (standard prefix/
    * frequency filtering for set-similarity joins). */
  val MaxBlockDf = 100
  val EmbCosineThreshold = 0.35

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Canonical content fingerprint: md5 of the case/whitespace-normalized
    * text. */
  def fingerprint(c: Column): Column = md5(TextOps.emKey(c))

  /** 3-token shingles as space-joined strings; whole token string when the
    * doc has 1..2 tokens; empty array for empty docs. */
  def shingles(textCol: Column, n: Int = ShingleSize): Column = {
    val toks = TextOps.tokenize(textCol)
    when(size(toks) === 0, array().cast("array<string>"))
      .when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Exploded (doc_id, s) shingle rows — codegen formulation (explode the
    * position sequence, assemble each shingle with element_at) instead of
    * exploding the array-HOF result, which runs interpreted and ~7× slower.
    * Same output as explode(shingles(text)). */
  def explodedShingles(d: DataFrame, n: Int = ShingleSize): DataFrame = {
    val withToks = d.select(col("doc_id"), TextOps.tokenize(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), greatest(lit(1), size(col("t")) - (n - 1)))).as("i"))
    withToks.select(col("doc_id"),
      when(size(col("t")) < n, concat_ws(" ", col("t")))
        .otherwise(concat_ws(" ",
          (0 until n).map(k => element_at(col("t"), col("i") + k)): _*)).as("s"))
  }

  private val TokRe = "[a-z0-9]+(?:[-_][a-z0-9]+)*"

  /** DuckDB twin of `shingles` ending in sh(doc_id, shingles). */
  private val shinglesCte =
    s"""tk AS (SELECT doc_id, regexp_extract_all(lower(text), '$TokRe') AS t FROM documents),
       |sh AS (SELECT doc_id,
       |         CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
       |              WHEN len(t) < $ShingleSize THEN [array_to_string(t, ' ')]
       |              ELSE [array_to_string(t[i:i+${ShingleSize - 1}], ' ')
       |                    FOR i IN range(1, len(t) - ${ShingleSize - 2})]
       |         END AS shingles
       |       FROM tk)""".stripMargin

  // ---- q40: exact duplicate groups ----------------------------------------

  def exactDupGroups(spark: SparkSession, dir: String): DataFrame = {
    val withFp = docs(spark, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val groups = withFp.groupBy("fp")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("group_size"))
    withFp.join(groups, "fp")
      .select(col("doc_id"), col("fp"), col("canonical_id"), col("group_size"))
      .orderBy("doc_id")
  }

  private[operators] val emKeySql =
    s"""regexp_replace(regexp_replace(lower(text), '^${graft.textops.TextOps.WsClass}+|${graft.textops.TextOps.WsClass}+$$', '', 'g'), '${graft.textops.TextOps.WsClass}+', ' ', 'g')"""

  val exactDupGroupsSql: String =
    s"""WITH fp AS (SELECT doc_id, md5($emKeySql) AS fp FROM documents),
       |g AS (SELECT fp, min(doc_id) AS canonical_id, count(*) AS group_size
       |      FROM fp GROUP BY fp)
       |SELECT doc_id, fp.fp, canonical_id, group_size
       |FROM fp JOIN g USING (fp) ORDER BY doc_id""".stripMargin

  // ---- q41: MinHash band signatures ---------------------------------------

  /** MinHash permutation family: each distinct (doc, shingle) is hashed
    * ONCE (md5 → 60-bit int → mod p), then the NumHashes signatures derive
    * arithmetically as sig_j = min over shingles of (a_j + b_j·h) mod p —
    * the classic universal-hash MinHash. This replaces the round-1/2
    * formulation (md5(j ∥ ':' ∥ s) per permutation), which evaluated a
    * full-string md5 per (shingle occurrence × j): ~16× more hashing for
    * identical collision behavior. a_j/b_j are fixed multiplicative-hash
    * constants derived from j, so the DuckDB oracle reproduces them
    * verbatim; p = 2^31−1 keeps b_j·h < 2^62 (no BIGINT overflow in either
    * engine), and all operands are non-negative so `%` agrees across
    * engines. */
  val MinHashP = 2147483647L // 2^31 − 1 (prime)
  /** a_j = (2654435761·(j+1)) mod p, b_j = (2246822519·(j+1)) mod p —
    * Knuth/xxhash multiplicative constants; b_j ≠ 0 for all j < p.
    * private[graft]: the streaming LSH gate derives its row-local band
    * hashes from the SAME family (StreamingOps.bandHashes) — one
    * definition, no drift surface. */
  private[graft] def permA(j: Column): Column = pmod(lit(2654435761L) * (j + 1), lit(MinHashP))
  private[graft] def permB(j: Column): Column = pmod(lit(2246822519L) * (j + 1), lit(MinHashP))

  /** The per-shingle hash h = md5 → 60-bit int → mod p, shared verbatim by
    * the batch signature build and the streaming gate. */
  private[graft] def shingleHash(s: Column): Column =
    pmod(conv(substring(md5(s), 1, 15), 16, 10).cast("long"), lit(MinHashP))

  /** Shape: hash once per distinct (doc_id, s) row inside whole-stage
    * codegen, explode only the 16-way permutation index over the already-
    * hashed rows, and let the `min` aggregate's map-side partial combine
    * collapse to NumHashes rows per doc before the shuffle — exchanged
    * volume is 16 longs per document regardless of document length. */
  // Signature tables are memoized per corpus dir (like the retrieval
  // indexes): q41/q42 and repeated calls share one build.
  private val bandCache = Memo.frame()
  private val shingleCache = Memo.frame()

  /** Distinct (doc_id, s) shingle sets, cached per dir. */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    shingleCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir",
      explodedShingles(docs(spark, dir)).distinct().cache())

  /** (doc_id, j, m) minhash signature components — the one derivation
    * behind the band build AND q138's estimation audit. Memoized per
    * (appId, dir) since r18: the comment above promised "signature
    * tables are memoized" but only shingles and BANDS were — q138 and
    * q141 each re-ran the 16-way permutation aggregate
    * (|distinct shingles| × NumHashes rows) per invocation to rebuild a
    * NumHashes-rows-per-doc table the band build had already derived.
    * Eager localCheckpoint so consumers see a leaf, not the permutation
    * lineage. */
  private val componentCache = Memo.frame()

  private[graft] def minhashComponents(spark: SparkSession, dir: String): DataFrame =
    componentCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      val hashed = shingleSets(spark, dir).select(col("doc_id"),
        shingleHash(col("s")).as("h"))
      hashed
        .select(col("doc_id"), col("h"),
          explode(sequence(lit(0L), lit(NumHashes - 1L))).as("j"))
        .groupBy("doc_id", "j")
        .agg(min(pmod(permA(col("j")) + permB(col("j")) * col("h"), lit(MinHashP))).as("m"))
        .localCheckpoint(true)
    })

  def minhashBands(spark: SparkSession, dir: String): DataFrame = {
    val bands = bandCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      val mh = minhashComponents(spark, dir)
      val sigs = mh.groupBy("doc_id")
        .agg(transform(array_sort(collect_list(struct(col("j"), col("m")))),
          s => s.getField("m")).as("sigs"))
      sigs.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(NumHashes / BandSize - 1)),
            b => md5(array_join(
              transform(slice(col("sigs"), b * BandSize + 1, lit(BandSize)),
                m => m.cast("string")), ":"))))
            .as(Seq("band_id", "band_hash")))
        .select(col("doc_id"), col("band_id").cast("long").as("band_id"), col("band_hash"))
        .cache()
    })
    bands.orderBy("doc_id", "band_id")
  }

  /** Shared q41/q42 oracle CTEs: distinct shingles → h → permuted mins →
    * ordered signature vector. Mirrors minhashBands exactly. */
  private val minhashCtes =
    s"""ex AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
       |hx AS (SELECT doc_id, CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) % $MinHashP AS h
       |       FROM ex),
       |mh AS (SELECT doc_id, j,
       |         min(((2654435761 * (j + 1)) % $MinHashP +
       |              ((2246822519 * (j + 1)) % $MinHashP) * h) % $MinHashP) AS m
       |       FROM hx, (SELECT unnest(range(0, $NumHashes)) AS j) GROUP BY doc_id, j),
       |sig AS (SELECT doc_id, list(m ORDER BY j) AS sigs FROM mh GROUP BY doc_id),
       |bands AS (SELECT doc_id, b AS band_id,
       |            md5(array_to_string(sigs[b * $BandSize + 1 : b * $BandSize + $BandSize], ':')) AS band_hash
       |          FROM sig, (SELECT unnest(range(0, ${NumHashes / BandSize})) AS b))""".stripMargin

  val minhashBandsSql: String =
    s"""WITH $shinglesCte,
       |$minhashCtes
       |SELECT doc_id, band_id, band_hash FROM bands
       |ORDER BY doc_id, band_id""".stripMargin

  // ---- q42: MinHash-LSH candidate pairs + verified Jaccard ----------------

  // Candidate pairs memoize per dir (shared by q42's Jaccard verification
  // and q49's cluster consolidation; a per-call .cache() would leak a
  // fresh cached frame per invocation).
  private val pairCache = Memo.frame()

  /** Distinct LSH candidate (doc_a, doc_b) pairs — docs sharing any band
    * hash — cached per dir. */
  private def lshCandidatePairs(spark: SparkSession, dir: String): DataFrame =
    pairCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      val bands = minhashBands(spark, dir)
      bands.as("a")
        .join(bands.as("b"),
          col("a.band_id") === col("b.band_id") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .cache()
    })

  /** Candidates = pairs sharing any band hash; verified with exact
    * shingle-set Jaccard (no threshold — banding is the filter). */
  def minhashDupPairs(spark: SparkSession, dir: String): DataFrame =
    withJaccard(spark, dir, lshCandidatePairs(spark, dir))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Join exact shingle-set Jaccard onto a (doc_a, doc_b) pair frame. */
  private def withJaccard(spark: SparkSession, dir: String, pairs: DataFrame): DataFrame = {
    val ds = shingleSets(spark, dir)
    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(ds.as("x"), col("x.doc_id") === col("doc_a"))
      .join(ds.as("y"), col("y.doc_id") === col("doc_b") && col("y.s") === col("x.s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        r6(coalesce(col("inter"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("inter"), lit(0L)))))
  }

  private val jaccardCtes =
    s"""ds AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
       |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
       |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS i
       |          FROM pairs p
       |          JOIN ds x ON x.doc_id = p.doc_a
       |          JOIN ds y ON y.doc_id = p.doc_b AND y.s = x.s
       |          GROUP BY p.doc_a, p.doc_b),
       |jac AS (SELECT p.doc_a, p.doc_b,
       |          floor((coalesce(i, 0)::DOUBLE /
       |            (sa.n + sb.n - coalesce(i, 0))) * 1000000 + 0.5) / 1000000 AS jaccard
       |        FROM pairs p
       |        LEFT JOIN inter ON p.doc_a = inter.doc_a AND p.doc_b = inter.doc_b
       |        JOIN sz sa ON sa.doc_id = p.doc_a
       |        JOIN sz sb ON sb.doc_id = p.doc_b)""".stripMargin

  /** Shared q42/q49 oracle CTE: the LSH candidate pair set. */
  private val lshPairsCte =
    """pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |          FROM bands a JOIN bands b
      |            ON a.band_id = b.band_id AND a.band_hash = b.band_hash
      |           AND a.doc_id < b.doc_id)""".stripMargin

  val minhashDupPairsSql: String =
    s"""WITH $shinglesCte,
       |$minhashCtes,
       |$lshPairsCte,
       |$jaccardCtes
       |SELECT doc_a, doc_b, jaccard FROM jac ORDER BY doc_a, doc_b""".stripMargin

  // ---- q43: exact shingle-Jaccard pairs above a threshold -----------------

  /** Pairs sharing ≥1 shingle with Jaccard ≥ threshold. The shared-shingle
    * join is the blocking step (never all-pairs); at 100 TB you'd block on
    * rarer shingles (df-bounded) — here df-unbounded is fine because the
    * synthetic vocabulary keeps candidate counts quadratic-safe. */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val ds = shingleSets(spark, dir)
    val blockable = ds.join(
      ds.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= MaxBlockDf)
        .select("s"), "s")
    // One self-join yields candidates AND their intersection counts — a
    // pairs-then-rejoin formulation materializes |pairs| × |shingles/doc|
    // intermediate rows (tens of millions at sf0.1) for the same answer.
    val inter = blockable.as("x").join(blockable.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))), "doc_a")
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))), "doc_b")
      .withColumn("jaccard",
        r6(col("inter").cast("double") / (col("na") + col("nb") - col("inter"))))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val jaccardPairsSql: String =
    s"""WITH $shinglesCte,
       |ds0 AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
       |blk AS (SELECT ds0.doc_id, ds0.s FROM ds0
       |        JOIN (SELECT s FROM (SELECT s, count(*) AS df FROM ds0 GROUP BY s)
       |              WHERE df <= $MaxBlockDf) f ON ds0.s = f.s),
       |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
       |          FROM blk x JOIN blk y ON x.s = y.s AND x.doc_id < y.doc_id
       |          GROUP BY 1, 2),
       |sz AS (SELECT doc_id, count(*) AS n FROM ds0 GROUP BY doc_id),
       |jac AS (SELECT doc_a, doc_b,
       |          floor((i::DOUBLE / (sa.n + sb.n - i)) * 1000000 + 0.5) / 1000000 AS jaccard
       |        FROM inter
       |        JOIN sz sa ON sa.doc_id = doc_a
       |        JOIN sz sb ON sb.doc_id = doc_b)
       |SELECT doc_a, doc_b, jaccard FROM jac
       |WHERE jaccard >= $JaccardThreshold ORDER BY doc_a, doc_b""".stripMargin

  // ---- q44: embedding-cosine near-dup pairs (blocked by label) ------------

  /** Same-cluster pairs with cosine ≥ threshold. The `label` column is the
    * blocking key (at scale: the coarse-quantizer cell / partition key), so
    * the pair join is per-block, never global. */
  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select("vec_id", "label", "embedding")
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        cosineSim(col("a.embedding"), col("b.embedding")).as("cos"))
      .filter(col("cos") >= EmbCosineThreshold)
      .select(col("vec_a"), col("vec_b"), col("label").cast("long").as("label"),
        r6(col("cos")).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  private def sqlCosAb: String =
    """(CASE WHEN sqrt(list_sum([(a.embedding[i])::DOUBLE * (a.embedding[i])::DOUBLE FOR i IN range(1, len(a.embedding) + 1)])) = 0
      |       OR sqrt(list_sum([(b.embedding[i])::DOUBLE * (b.embedding[i])::DOUBLE FOR i IN range(1, len(b.embedding) + 1)])) = 0
      |  THEN 0.0
      |  ELSE list_sum([(a.embedding[i])::DOUBLE * (b.embedding[i])::DOUBLE FOR i IN range(1, len(a.embedding) + 1)]) /
      |    (sqrt(list_sum([(a.embedding[i])::DOUBLE * (a.embedding[i])::DOUBLE FOR i IN range(1, len(a.embedding) + 1)])) *
      |     sqrt(list_sum([(b.embedding[i])::DOUBLE * (b.embedding[i])::DOUBLE FOR i IN range(1, len(b.embedding) + 1)])))
      |END)""".stripMargin

  val embeddingNearDupsSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  CAST(a.label AS BIGINT) AS label, floor(($sqlCosAb) * 1000000 + 0.5) / 1000000 AS cos
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $sqlCosAb >= $EmbCosineThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---- q45: benchmark decontamination (shingle-overlap flagging) ----------

  /** Pseudo-benchmark membership: a deterministic 1/97 slice of the corpus
    * stands in for an eval set (real pipelines read a separate benchmark
    * table; the overlap machinery is identical). */
  final val DecontamMod = 97L  // final literal: constant-folded at use sites (object-init-cycle-proof)
  val DecontamMinOverlap = 3L

  /** Flag training docs sharing ≥ MinOverlap distinct 3-token shingles
    * with any benchmark document — the standard eval-set decontamination
    * pass of a pre-training pipeline. Per flagged doc: how many distinct
    * shingles overlap and how many benchmark docs they touch.
    *
    * Scale shape: the benchmark shingle set is tiny relative to the corpus
    * (it's an eval set), so the join broadcasts; the corpus side streams
    * through it map-side with partial aggregation on doc_id — no all-pairs
    * step anywhere. */
  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    val ds = shingleSets(spark, dir)
    val bench = ds.filter(pmod(col("doc_id"), lit(DecontamMod)) === 0)
      .select(col("s"), col("doc_id").as("bench_id"))
    ds.filter(pmod(col("doc_id"), lit(DecontamMod)) =!= 0)
      // explicit hint: the bench side filters the cached corpus-wide
      // shingle frame, whose pre-runtime size ESTIMATE is the full
      // child's — without the hint the planner can pick a sort-merge join
      // and shuffle the whole corpus shingle set, the exact cost the
      // broadcast design avoids.
      .join(broadcast(bench), "s")
      .groupBy("doc_id")
      .agg(countDistinct("s").as("n_overlap"),
        countDistinct("bench_id").as("n_bench_docs"))
      .filter(col("n_overlap") >= DecontamMinOverlap)
      .orderBy("doc_id")
  }

  val decontaminationSql: String =
    s"""WITH $shinglesCte,
       |ds AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
       |bench AS (SELECT s, doc_id AS bench_id FROM ds WHERE doc_id % $DecontamMod = 0)
       |SELECT ds.doc_id, count(DISTINCT ds.s) AS n_overlap,
       |  count(DISTINCT bench_id) AS n_bench_docs
       |FROM ds JOIN bench ON ds.s = bench.s
       |WHERE ds.doc_id % $DecontamMod <> 0
       |GROUP BY ds.doc_id
       |HAVING count(DISTINCT ds.s) >= $DecontamMinOverlap
       |ORDER BY ds.doc_id""".stripMargin

  // ---- q49: dup-cluster consolidation (bounded label propagation) ---------

  final val ClusterIterations = 3  // final literal: constant-folded at use sites (object-init-cycle-proof)

  /** Consolidate the q42 LSH dup pairs into clusters: every doc starts
    * labeled with its own id, then ClusterIterations rounds of
    * min-neighbor label propagation over the (undirected) pair graph — the
    * standard Spark connected-components shape (iterative hash join + min
    * aggregate per round; no driver-side graph). The iteration count is
    * FIXED so the DuckDB oracle unrolls the identical rounds; near-dup
    * clusters have tiny diameters, and a production run would loop to
    * fixpoint (labels stop changing) with the same per-round plan. Output
    * is each doc's cluster representative (min doc_id reachable within
    * ClusterIterations hops) and the cluster's size. */
  private val labelCache = Memo.frame()

  /** Bounded min-label frame (doc_id, label) — the cluster representative
    * each doc reaches within ClusterIterations hops: q49's DECLARED
    * semantics (the oracle unrolls the identical rounds). Policy
    * consumers (q75 keep-best, q76 splits, q145 spectrum, q150 balance,
    * the release pipeline) moved to [[dupLabelsFixpoint]] in round 9 —
    * converged labels, no diameter bound — leaving this frame as the
    * bounded diagnostic; memoized + cached per (appId, dir) like every
    * other shared build. */
  private[graft] def dupLabels(spark: SparkSession, dir: String): DataFrame =
    labelCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      // Candidate pairs only — the exact-Jaccard verification q42 layers on
      // top never changes the pair set (no threshold), so clustering over
      // the raw candidates skips the most expensive join in the pipeline.
      val pairs = lshCandidatePairs(spark, dir)
      propagateRounds(docs(spark, dir).select("doc_id"),
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")),
        ClusterIterations).cache()
    })

  /** One bounded run of min-label propagation: `rounds` iterations of the
    * shared round body (the q49 declared semantics when rounds =
    * ClusterIterations; the spec's foil for the fixpoint path). */
  private[graft] def propagateRounds(nodes: DataFrame, pairs: DataFrame, rounds: Int): DataFrame = {
    val edges = pairs.select(col("src"), col("dst"))
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    var labels = nodes.select(col("doc_id"), col("doc_id").as("label"))
    for (_ <- 1 to rounds) {
      val neighborMin = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy("src").agg(min("label").as("nlabel"))
      labels = labels.join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
    }
    labels
  }

  def dupClusters(spark: SparkSession, dir: String): DataFrame =
    dupLabels(spark, dir)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("label")))
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")

  // ---- q159: fixpoint connected components (production path) --------------

  /** Safety bound on fixpoint rounds — far above any plausible component
    * diameter (min-label propagation converges in diameter rounds; LSH
    * near-dup clusters are near-cliques, and even a pure chain of 50
    * drifting mirrors converges in 49). Hitting it is a data bug worth a
    * loud failure, not silent truncation. */
  final val FixpointMaxRounds = 50

  private val fixLabelCache = Memo.frame()

  /** PRODUCTION cluster labels (VERDICT r8 #2): the same min-label
    * propagation round as [[dupLabels]], looped to FIXPOINT — the loop
    * exits when a round changes zero labels, so a chain-shaped cluster of
    * ANY diameter (mirrors with drifting headers) collapses to one
    * component, where the fixed 3-hop unroll would tear a diameter-≥4
    * chain in two (Round9Spec plants exactly that chain and pins the
    * difference). Downstream policy operators — keep-best (q75), splits
    * (q76), the release pipeline, the spectrum/balance audits — consume
    * THESE labels: a torn chain there means retained duplicates and
    * train/holdout leakage across the torn halves. q49 keeps the bounded
    * 3-hop frame as its DECLARED oracle semantics (the unrolled CTE);
    * q159 oracle-gates this path with a recursive-CTE closure. */
  private[graft] def dupLabelsFixpoint(spark: SparkSession, dir: String): DataFrame =
    fixLabelCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      val pairs = lshCandidatePairs(spark, dir)
      fixpointLabels(docs(spark, dir).select("doc_id"),
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))).cache()
    })

  /** The fixpoint loop, graph-agnostic so the diameter spec can plant a
    * chain: nodes (doc_id), undirected edges given in one direction.
    * Per round: one hash join edges⋈labels + a min aggregate (identical
    * to a dupLabels round), then a changed-label count — the convergence
    * test — on the doc_id-keyed join of consecutive label frames. Each
    * round's labels are RELIABLY checkpointed (same rationale as the PCA
    * squarings, SimilarityOps: Catalyst re-walks trees, so an unchecked
    * loop doubles the plan per round; blocks on executors alone would
    * make a late round unrecoverable under executor loss). Labels only
    * decrease, so `label < prev` counts every change. At 100 TB the
    * round count is the component diameter — near-cliques converge in
    * 2–3 rounds; large-star/small-star would cut worst-case chains to
    * O(log n) rounds, but the worst case here is bounded by how many
    * drifting mirrors LSH can chain, and each round is two shuffles on
    * the same key. */
  private[graft] def fixpointLabels(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    Ckpt.ensure(spark)
    val edges = pairs.select(col("src"), col("dst"))
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    var labels = nodes.select(col("doc_id"), col("doc_id").as("label"))
      .checkpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < FixpointMaxRounds) {
      val neighborMin = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy("src").agg(min("label").as("nlabel"))
      val next = labels.join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .checkpoint(true)
      changed = next
        .join(labels.select(col("doc_id"), col("label").as("prev")), "doc_id")
        .filter(col("label") < col("prev")).count()
      labels = next
      rounds += 1
    }
    require(changed == 0,
      s"fixpointLabels: no convergence within $FixpointMaxRounds rounds")
    edges.unpersist()
    labels
  }

  /** Large-star/small-star connected components (VERDICT r9 #5) — the
    * O(log n)-round production alternative to [[fixpointLabels]] for
    * CHAIN-PATHOLOGICAL graphs: min-label propagation pays one round per
    * hop of component diameter (a mirror chain of length L costs L
    * rounds × 2 shuffles), while the alternating star algorithm
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) restructures the edge set itself so components collapse
    * toward their minimum in O(log n) alternating rounds regardless of
    * diameter. Same contract as fixpointLabels: nodes (doc_id),
    * undirected edges in one direction, output (doc_id, label) with
    * label = the component's minimum doc_id — Round10Spec pins label
    * equality on random graphs and plants a 32-node chain that must
    * converge in ≤ 6 alternating rounds (vs 31 propagation rounds).
    *
    * Per alternating round, on canonical edges u > v:
    *   - large-star: every center's STRICTLY LARGER neighbors reconnect
    *     to m = min(N(u) ∪ {u}) — long tails fold in half;
    *   - small-star: every center's smaller-or-equal neighbors (exactly
    *     the canonical edge list) and the center itself reconnect to the
    *     center's minimum neighbor — local stars flatten.
    * Both are one groupBy(center) min + one join per phase — the same
    * two-shuffle round cost as a propagation round, but O(log n) rounds.
    * Edges are distinct-deduped and reliably checkpointed per round
    * (Catalyst re-walks trees; an unchecked loop doubles the plan).
    * Convergence = the canonical edge set reaches a fixpoint (two
    * exceptAll counts — both directions); the converged graph is a star
    * per component, so labels read directly off the edges (min taken
    * defensively; roots label themselves). */
  private[graft] def starLabels(nodes: DataFrame, pairs: DataFrame): DataFrame =
    starLabelsWithRounds(nodes, pairs)._1

  /** [[starLabels]] plus the alternating-round count (spec observability:
    * Round10Spec pins the ≤ 6-round bound on the 32-chain). */
  private[graft] def starLabelsWithRounds(
      nodes: DataFrame, pairs: DataFrame): (DataFrame, Int) = {
    val spark = nodes.sparkSession
    Ckpt.ensure(spark)
    def canon(df: DataFrame): DataFrame = df
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var edges = canon(pairs.select(col("src").as("u"), col("dst").as("v")))
      .checkpoint(true)
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < FixpointMaxRounds) {
      // Large-star over the SYMMETRIC adjacency: center a, neighbor b.
      val sym = edges.select(col("u").as("a"), col("v").as("b"))
        .union(edges.select(col("v").as("a"), col("u").as("b")))
      val mins = sym.groupBy("a").agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("mn"), col("a")).as("m"))
      val large = canon(sym.join(mins, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v")))
      // Small-star over the canonical (u > v) list: center u, its
      // smaller neighbors v, their min m; v→m and u→m.
      val smins = large.groupBy("u").agg(min(col("v")).as("m"))
      val withM = large.join(smins, "u")
      val next = canon(
        withM.select(col("v").as("u"), col("m").as("v"))
          .union(withM.select(col("u"), col("m").as("v"))))
        .checkpoint(true)
      changed = next.exceptAll(edges).count() + edges.exceptAll(next).count()
      edges = next
      rounds += 1
    }
    require(changed == 0,
      s"starLabels: no convergence within $FixpointMaxRounds rounds")
    val labels = nodes.select(col("doc_id"))
      .join(edges.groupBy(col("u").as("doc_id")).agg(min(col("v")).as("lbl")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("label"))
    (labels, rounds)
  }

  /** Incremental connected-component maintenance under ingest (VERDICT
    * r9 #7 / r10 #5): merge one batch of new docs into EXISTING component
    * labels, re-propagating ONLY the affected components.
    *
    * Inputs: `existing` (doc_id, label) with label = component-min doc_id
    * (the dupLabelsFixpoint contract); `newNodes` (doc_id) — the batch;
    * `newPairs` (src, dst) — the batch's band-join candidates, (new ×
    * retained) ∪ (new × new), the q85 asymmetric machinery: the retained
    * corpus is never re-paired with itself.
    *
    * Mechanics: the components touched by any new edge are found with one
    * semi-join on the label key; their members form a mini-graph whose
    * old connectivity is carried by (doc → label) STAR EDGES — label IS
    * the component-min doc, so the star reproduces the old component
    * exactly, in one hop — plus the new edges. [[fixpointLabels]] on that
    * mini-graph converges in ~2–3 rounds (stars have diameter ≤ 2;
    * [[starLabels]] stays the chain-pathology escape hatch). Untouched
    * components pass through untouched: per-batch work is bounded by
    * affected-component mass + batch size, never corpus size.
    *
    * Returns (relabeled, untouched): the freshly labeled affected ∪ new
    * docs, and the existing rows no new edge reached — callers that
    * maintain a persisted label store write ONLY `relabeled` (see
    * StreamingOps.componentMaintenance); [[incrementalLabels]] unions
    * them for the full-frame view. Round11Spec pins incremental ==
    * full-recompute equality across streamed batches. */
  private[graft] def mergeComponents(
      existing: DataFrame, newNodes: DataFrame,
      newPairs: DataFrame): (DataFrame, DataFrame) = {
    val ends = newPairs.select(col("src").as("doc_id"))
      .union(newPairs.select(col("dst").as("doc_id"))).distinct()
    val touched = existing.join(ends, Seq("doc_id"), "left_semi")
      .select(col("label").as("tlabel")).distinct()
    val affected = existing
      .join(touched, existing("label") === touched("tlabel"), "left_semi")
    val starEdges = affected.filter(col("doc_id") =!= col("label"))
      .select(col("doc_id").as("src"), col("label").as("dst"))
    val nodes = affected.select("doc_id")
      .union(newNodes.select("doc_id")).distinct()
    val relabeled = fixpointLabels(nodes,
      newPairs.select(col("src"), col("dst")).unionByName(starEdges))
    val untouched = existing
      .join(touched, existing("label") === touched("tlabel"), "left_anti")
      .select("doc_id", "label")
    (relabeled, untouched)
  }

  /** [[mergeComponents]], unioned to the full updated label frame. */
  private[graft] def incrementalLabels(
      existing: DataFrame, newNodes: DataFrame, newPairs: DataFrame): DataFrame = {
    val (relabeled, untouched) = mergeComponents(existing, newNodes, newPairs)
    untouched.unionByName(relabeled)
  }

  /** q159: the fixpoint clusters, oracle-gated — same output shape as q49
    * but with converged labels. The DuckDB oracle is a RECURSIVE
    * transitive closure (reach accumulates every node reachable from each
    * doc; min over the reach set IS the component minimum — exactly what
    * min-label propagation converges to), so the oracle is
    * hop-count-free: it cannot agree with a torn cluster by accident.
    * Closure cost is Σ|component|² rows — fine for LSH near-dup clusters
    * (q145 spectrum tops out at small sizes); the ENGINE never runs a
    * closure, only diameter-many propagation rounds. */
  def dupClustersFixpoint(spark: SparkSession, dir: String): DataFrame =
    dupLabelsFixpoint(spark, dir)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("label")))
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")

  /** Shared recursive-closure CTE chain ending in fixl(doc_id, label) —
    * the hop-count-free oracle derivation of the FIXPOINT labels, reused
    * by every oracle that consumes the production clusters (q159, q177). */
  private[operators] val fixLabelCtes: String =
    s"""$shinglesCte,
       |$minhashCtes,
       |$lshPairsCte,
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |      UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(doc_id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT reach.doc_id, e.dst FROM reach JOIN e ON reach.r = e.src
       |),
       |fixl AS (SELECT doc_id, min(r) AS label FROM reach GROUP BY doc_id)""".stripMargin

  val dupClustersFixpointSql: String =
    s"""WITH RECURSIVE $fixLabelCtes
       |SELECT doc_id, label AS cluster_id,
       |  CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS cluster_size
       |FROM fixl ORDER BY doc_id""".stripMargin

  // ---- q177: duplication propensity by length decile ----------------------

  /** q177: does duplication concentrate in short or long documents? Per
    * token-count decile (rank-derived — `floor((rk−1)·10/N)`, no ntile,
    * so the bucket boundary is pure integer arithmetic in both engines):
    * the doc count, how many docs sit in a near-dup cluster of size ≥ 2,
    * the dup rate, and the decile's mean token count. The cross-family
    * audit that shapes dedup POLICY: template spam concentrating in one
    * length band means the keep-best tier can be gated by length before
    * paying the pair join for the whole corpus. Consumes the PRODUCTION
    * fixpoint labels (oracle: the recursive closure — hop-count-free).
    *
    * Scale shape: the corpus-wide rank DECOMPOSES through the
    * token-count histogram (the q96/q148 idiom) — the only global window
    * runs over the ≤ |distinct lengths| histogram rows (prefix count),
    * each doc's rank is that prefix plus a row_number PARTITIONED by its
    * own length (bounded groups) — so no corpus-grain global sort
    * anywhere; then one label join and a 10-key aggregate. */
  def dupLengthDeciles(spark: SparkSession, dir: String): DataFrame = {
    val lens = docs(spark, dir).select(col("doc_id"),
      size(graft.textops.TextOps.tokenize(col("text"))).cast("long").as("n_tokens"))
    val nF = lens.agg(count(lit(1)).as("n"))
    val cum = lens.groupBy("n_tokens").agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before", coalesce(sum("cnt").over(
        Window.orderBy("n_tokens")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("n_tokens", "cum_before")
    val sizes = dupLabelsFixpoint(spark, dir)
      .groupBy("label").agg(count(lit(1)).as("csize"))
    val flagged = dupLabelsFixpoint(spark, dir)
      .join(sizes, "label")
      .select(col("doc_id"), (col("csize") >= 2).cast("long").as("is_dup"))
    lens
      .withColumn("rin", row_number().over(
        Window.partitionBy("n_tokens").orderBy("doc_id")))
      .join(cum, "n_tokens")
      .withColumn("rk", col("cum_before") + col("rin"))
      .crossJoin(broadcast(nF))
      .withColumn("decile", expr("(rk - 1) * 10 DIV n"))
      .join(flagged, "doc_id")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_dup")).as("n_dup_docs"),
        r6(sum(col("is_dup")).cast("double") / count(lit(1))).as("dup_rate"),
        r6(davg(col("n_tokens"))).as("mean_tokens"))
      .orderBy("decile")
  }

  lazy val dupLengthDecilesSql: String =
    s"""WITH RECURSIVE $fixLabelCtes,
       |dlt AS (SELECT doc_id,
       |          CAST(len(regexp_extract_all(lower(text), '$TokRe')) AS BIGINT) AS n_tokens
       |        FROM documents),
       |dln AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dlt),
       |dlsz AS (SELECT label, count(*) AS csize FROM fixl GROUP BY label),
       |dlf AS (SELECT fixl.doc_id,
       |          CASE WHEN csize >= 2 THEN 1 ELSE 0 END AS is_dup
       |        FROM fixl JOIN dlsz USING (label)),
       |dlr AS (SELECT doc_id, n_tokens,
       |          row_number() OVER (ORDER BY n_tokens ASC, doc_id ASC) AS rk
       |        FROM dlt)
       |SELECT CAST((rk - 1) * 10 // n AS BIGINT) AS decile,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
       |  floor((sum(is_dup)::DOUBLE / count(*)) * 1000000 + 0.5) / 1000000 AS dup_rate,
       |  floor((CAST(sum(CAST(n_tokens AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_tokens
       |FROM dlr JOIN dlf USING (doc_id), dln
       |GROUP BY decile, n ORDER BY decile""".stripMargin

  // ---- q172: shingle document-frequency spectrum (blocking-cap audit) -----

  /** q172: the df histogram of the shingle space, bucketed around the
    * declared MaxBlockDf blocking bound — per bucket the shingle-type
    * count, the (doc, shingle) occurrence mass, the PAIR mass
    * Σ df·(df−1)/2 (the all-pairs work a join keyed on those shingles
    * would generate), and each bucket's share of total pair mass. The
    * audit of the engine's single most load-bearing scale constant: the
    * `> MaxBlockDf` row is exactly the candidate-generation work the
    * df cap DROPS (boilerplate shingles that would quadratically
    * dominate the q43 join), and its pair share quantifies what the cap
    * buys. All counters exact integers; shares one exact division.
    *
    * Scale shape: one shingle-keyed count over the memoized distinct
    * (doc, shingle) frame, then a 5-key bucket aggregate with the 1-row
    * total broadcast back — metadata past the df aggregate. */
  def shingleDfSpectrum(spark: SparkSession, dir: String): DataFrame = {
    val df = shingleSets(spark, dir).groupBy("s").agg(count(lit(1)).as("df"))
    val bucketed = df.select(
      when(col("df") === 1, 0L).when(col("df") === 2, 1L)
        .when(col("df") <= 10, 2L).when(col("df") <= MaxBlockDf, 3L)
        .otherwise(4L).as("bin_order"),
      when(col("df") === 1, "1").when(col("df") === 2, "2")
        .when(col("df") <= 10, "3-10").when(col("df") <= MaxBlockDf, s"11-$MaxBlockDf")
        .otherwise(s">$MaxBlockDf").as("df_bin"),
      col("df"))
    val spec = bucketed.groupBy("bin_order", "df_bin")
      .agg(count(lit(1)).as("n_shingles"),
        sum(col("df")).as("occurrence_mass"),
        // Integer DIV: `/` on long columns is double division in Spark.
        sum(expr("df * (df - 1) DIV 2")).as("pair_mass"))
    val tot = spec.agg(sum("pair_mass").as("total_pairs"))
    spec.crossJoin(broadcast(tot))
      .select(col("bin_order"), col("df_bin"), col("n_shingles"),
        col("occurrence_mass"), col("pair_mass"),
        r6(when(col("total_pairs") === 0, 0.0)
          .otherwise(col("pair_mass").cast("double") / col("total_pairs")))
          .as("pair_share"))
      .orderBy("bin_order")
  }

  val shingleDfSpectrumSql: String =
    s"""WITH $shinglesCte,
       |sds AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM sh),
       |sdf AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sds GROUP BY s),
       |sbk AS (SELECT CASE WHEN df = 1 THEN 0 WHEN df = 2 THEN 1
       |                    WHEN df <= 10 THEN 2 WHEN df <= $MaxBlockDf THEN 3
       |                    ELSE 4 END AS bin_order,
       |          CASE WHEN df = 1 THEN '1' WHEN df = 2 THEN '2'
       |               WHEN df <= 10 THEN '3-10' WHEN df <= $MaxBlockDf THEN '11-$MaxBlockDf'
       |               ELSE '>$MaxBlockDf' END AS df_bin,
       |          df
       |        FROM sdf),
       |sspec AS (SELECT bin_order, df_bin, CAST(count(*) AS BIGINT) AS n_shingles,
       |            CAST(sum(df) AS BIGINT) AS occurrence_mass,
       |            CAST(sum(df * (df - 1) // 2) AS BIGINT) AS pair_mass
       |          FROM sbk GROUP BY 1, 2),
       |stot AS (SELECT CAST(sum(pair_mass) AS BIGINT) AS total_pairs FROM sspec)
       |SELECT CAST(bin_order AS BIGINT) AS bin_order, df_bin, n_shingles,
       |  occurrence_mass, pair_mass,
       |  CASE WHEN total_pairs = 0 THEN 0.0
       |       ELSE floor((pair_mass::DOUBLE / total_pairs) * 1000000 + 0.5) / 1000000
       |  END AS pair_share
       |FROM sspec, stot ORDER BY bin_order""".stripMargin

  // ---- q166: propagation convergence profile ------------------------------

  /** Rounds the q166 profile unrolls — chosen past any diameter the
    * corpus plausibly holds, so the trailing zeros PROVE convergence
    * rather than assume it. final literal: constant-folded at use sites
    * (object-init-cycle-proof). */
  final val ConvergenceProfileRounds = 6

  /** q166: per propagation round, how many labels changed — the
    * convergence profile of the connected-components loop. The first
    * zero row IS the measured component-diameter bound of the corpus:
    * on this testdata rounds 4–6 are zero, which is the oracle-gated
    * fact behind q75/q76's 3-hop-unrolled oracles staying exact for the
    * fixpoint labels they now consume (Round9Spec pins the same fact as
    * frame equality; this pins it cross-engine, every round). The audit
    * a 100 TB dedup run reads before trusting any bounded-hop shortcut.
    *
    * Scale shape: the same per-round join + min-aggregate as the
    * fixpoint loop, plus one doc_id-keyed join per round for the changed
    * count; each round's labels reliably checkpointed (tree doubling —
    * the PCA rationale). Output is ConvergenceProfileRounds rows. */
  def propagationConvergence(spark: SparkSession, dir: String): DataFrame = {
    Ckpt.ensure(spark)
    val pairs = lshCandidatePairs(spark, dir)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = docs(spark, dir)
      .select(col("doc_id"), col("doc_id").as("label")).checkpoint(true)
    val parts = (1 to ConvergenceProfileRounds).map { i =>
      val neighborMin = edges.join(labels, edges("dst") === labels("doc_id"))
        .groupBy("src").agg(min("label").as("nlabel"))
      val next = labels.join(neighborMin, labels("doc_id") === neighborMin("src"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .checkpoint(true)
      val changed = next
        .join(labels.select(col("doc_id"), col("label").as("prev")), "doc_id")
        .filter(col("label") < col("prev"))
        .agg(count(lit(1)).as("n_changed"))
        .select(lit(i.toLong).as("round"), col("n_changed"))
      labels = next
      changed
    }
    parts.reduce(_.union(_)).orderBy("round")
  }

  private def convRoundSql(i: Int): String =
    s"""cn$i AS MATERIALIZED (SELECT src, min(label) AS nlabel
       |        FROM e JOIN cl${i - 1} ON e.dst = cl${i - 1}.doc_id GROUP BY src),
       |cl$i AS MATERIALIZED (SELECT cl${i - 1}.doc_id,
       |          least(cl${i - 1}.label, coalesce(cn$i.nlabel, cl${i - 1}.label)) AS label
       |        FROM cl${i - 1} LEFT JOIN cn$i ON cl${i - 1}.doc_id = cn$i.src)""".stripMargin

  val propagationConvergenceSql: String =
    s"""WITH $shinglesCte,
       |$minhashCtes,
       |$lshPairsCte,
       |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |      UNION ALL SELECT doc_b, doc_a FROM pairs),
       |cl0 AS MATERIALIZED (SELECT doc_id, doc_id AS label FROM documents),
       |${(1 to ConvergenceProfileRounds).map(convRoundSql).mkString(",\n")}
       |SELECT * FROM (
       |${(1 to ConvergenceProfileRounds).map(i =>
        s"SELECT CAST($i AS BIGINT) AS round, CAST((SELECT count(*) FROM cl$i a " +
          s"JOIN cl${i - 1} b ON a.doc_id = b.doc_id WHERE a.label < b.label) AS BIGINT) AS n_changed")
        .mkString("\nUNION ALL\n")}
       |) ORDER BY round""".stripMargin

  // ---- q149: dedup-threshold sensitivity curve ----------------------------

  /** Jaccard thresholds the q149 sensitivity curve sweeps — brackets
    * the declared JaccardThreshold = 0.30 operating point. */
  val ThresholdSweep: Seq[Double] = Seq(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)

  /** q149: what each candidate Jaccard threshold would do — per
    * threshold, the surviving verified-pair count and the number of
    * distinct documents touched by at least one such pair (the
    * upper bound on what a dedup pass at that threshold can delete).
    * The tuning table behind the declared 0.30 operating point: q141
    * prices the SIGNATURE budget at a fixed threshold, this prices the
    * THRESHOLD itself on exact Jaccards. A cliff between two rows means
    * the corpus has a near-dup tier right at that similarity — exactly
    * where the threshold should not sit.
    *
    * Scale shape: one |sweep|× explode over the already-verified pair
    * frame (candidate volume, never corpus²), then a |sweep|-key
    * count + distinct-doc count; thresholds compare against exact
    * r6-rounded Jaccards identically in both engines. */
  def thresholdSensitivity(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashDupPairs(spark, dir)
    pairs
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(array(ThresholdSweep.map(lit): _*)).as("threshold"))
      .filter(col("jaccard") >= col("threshold"))
      .select(col("threshold"), col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc"))
      .groupBy("threshold")
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        countDistinct("doc").as("n_flagged_docs"))
      .orderBy("threshold")
  }

  val thresholdSensitivitySql: String =
    s"""WITH $shinglesCte,
       |$minhashCtes,
       |$lshPairsCte,
       |$jaccardCtes,
       |thr AS (SELECT CAST(unnest([${ThresholdSweep.mkString(", ")}]) AS DOUBLE) AS threshold),
       |surv AS (SELECT threshold, doc_a, doc_b FROM jac, thr
       |         WHERE jaccard >= threshold),
       |sd AS (SELECT threshold, doc_a, doc_b, unnest([doc_a, doc_b]) AS doc
       |       FROM surv)
       |SELECT threshold, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT doc) AS BIGINT) AS n_flagged_docs
       |FROM sd GROUP BY threshold ORDER BY threshold""".stripMargin

  // ---- q145: duplicate-cluster size spectrum ------------------------------

  /** q145: how duplication mass distributes — for each cluster size,
    * how many clusters have that size, how many documents they hold,
    * and the document share; plus the corpus duplication factor
    * (docs per cluster) as the headline scalar. The standard
    * corpus-report histogram: a corpus where the dup mass sits in two
    * mega-clusters (template spam) needs different treatment than one
    * with a long tail of pairs (mirrors), and the keep-best policy's
    * savings are exactly n_docs − n_clusters. Size 1 rows are the
    * unduplicated mass, kept in the table so shares sum to 1.
    *
    * Scale shape: two-level aggregation over the memoized labels —
    * label-keyed count (co-partitioned with the propagation joins that
    * built it), then a tiny size-keyed aggregate; totals broadcast back
    * onto the ≤|distinct sizes| rows. Nothing beyond q49's own work. */
  def clusterSizeSpectrum(spark: SparkSession, dir: String): DataFrame = {
    val sizes = dupLabelsFixpoint(spark, dir)
      .groupBy("label").agg(count(lit(1)).as("cluster_size"))
    val spec = sizes.groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    val tot = spec.agg(sum(col("n_docs")).as("td"), sum(col("n_clusters")).as("tc"))
    spec.crossJoin(broadcast(tot))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        r6(col("n_docs").cast("double") / col("td")).as("doc_share"),
        r6(col("td").cast("double") / col("tc")).as("dup_factor"))
      .orderBy("cluster_size")
  }

  private def clusterRoundSql(i: Int): String =
    s"""n$i AS (SELECT src, min(label) AS nlabel
       |        FROM e JOIN l${i - 1} ON e.dst = l${i - 1}.doc_id GROUP BY src),
       |l$i AS (SELECT l${i - 1}.doc_id,
       |          least(l${i - 1}.label, coalesce(n$i.nlabel, l${i - 1}.label)) AS label
       |        FROM l${i - 1} LEFT JOIN n$i ON l${i - 1}.doc_id = n$i.src)""".stripMargin

  /** Shared label-propagation CTE chain ending in
    * l[ClusterIterations](doc_id, label) — the unrolled derivation behind
    * the q49 oracle, whose DECLARED semantics are the bounded 3-hop frame.
    * Every oracle whose ENGINE side consumes the fixpoint labels
    * (q75/q76/q145/q150/q82/q113/q157/q129) uses [[fixLabelCtes]]'s
    * recursive closure instead (ADVICE r9): the unrolled chain only
    * matched them because this corpus converges within 3 rounds, and a
    * diameter-4 corpus would have made those oracles silently diverge
    * from production semantics. */
  private[operators] val dupLabelCtes: String =
    s"""$shinglesCte,
       |$minhashCtes,
       |$lshPairsCte,
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |      UNION ALL SELECT doc_b, doc_a FROM pairs),
       |l0 AS (SELECT doc_id, doc_id AS label FROM documents),
       |${(1 to ClusterIterations).map(clusterRoundSql).mkString(",\n")}""".stripMargin

  val dupClustersSql: String =
    s"""WITH $dupLabelCtes
       |SELECT doc_id, label AS cluster_id,
       |  CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS cluster_size
       |FROM l$ClusterIterations ORDER BY doc_id""".stripMargin

  val clusterSizeSpectrumSql: String =
    s"""WITH RECURSIVE $fixLabelCtes,
       |csz AS (SELECT label, count(*) AS cluster_size
       |        FROM fixl GROUP BY label),
       |spec AS (SELECT cluster_size, count(*) AS n_clusters,
       |           cluster_size * count(*) AS n_docs
       |         FROM csz GROUP BY cluster_size),
       |ctot AS (SELECT sum(n_docs) AS td, sum(n_clusters) AS tc FROM spec)
       |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       |  CAST(n_clusters AS BIGINT) AS n_clusters,
       |  CAST(n_docs AS BIGINT) AS n_docs,
       |  floor((n_docs::DOUBLE / td) * 1000000 + 0.5) / 1000000 AS doc_share,
       |  floor((td::DOUBLE / tc) * 1000000 + 0.5) / 1000000 AS dup_factor
       |FROM spec, ctot ORDER BY cluster_size""".stripMargin

  // ---- q75: dedup policy — keep the best-quality doc per cluster ----------

  // Winners frame memoized per (appId, dir): q75 and q82 share one
  // labels⋈quality join + cluster window instead of re-deriving it per
  // query per bench pass.
  private val winnersCache = Memo.frame()

  /** Keep-best representatives (doc_id, cluster_id, quality_score,
    * n_tokens, qkey, n_members) — one row per cluster, winner by
    * (qkey DESC, doc_id ASC). The sort key is the INTEGER micro-score
    * qkey = floor(r6(q)·10⁶ + 0.5) (ADVICE r6; TextAnalysisOps.qkeyOf) —
    * integer-derived in both engines, so no double comparison anywhere
    * near the ordering decision. Both window functions share the
    * cluster_id partitioning (one shuffle). */
  private def clusterWinners(spark: SparkSession, dir: String): DataFrame =
    winnersCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      val labeled = dupLabelsFixpoint(spark, dir)
        .select(col("doc_id"), col("label").as("cluster_id"))
        .join(TextAnalysisOps.textQuality(spark, dir)
          .select("doc_id", "quality_score", "n_tokens"), "doc_id")
        .withColumn("qkey", TextAnalysisOps.qkeyOf(col("quality_score")))
      val part = Window.partitionBy("cluster_id")
      labeled
        .withColumn("n_members", count(lit(1)).over(part))
        .withColumn("rk", row_number().over(
          part.orderBy(col("qkey").desc, col("doc_id").asc)))
        .filter(col("rk") === 1)
        .select("doc_id", "cluster_id", "quality_score", "n_tokens", "qkey",
          "n_members")
        .cache()
    })

  /** The pipeline decision q49's clusters exist for: collapse each near-dup
    * cluster to its best representative by q30 quality score, ties to the
    * lowest doc_id. */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame =
    clusterWinners(spark, dir)
      .select(col("cluster_id"), col("n_members"),
        col("doc_id").as("kept_doc_id"), col("quality_score").as("kept_quality"))
      .orderBy("cluster_id")

  val dedupKeepBestSql: String =
    s"""WITH RECURSIVE $fixLabelCtes,
       |${TextAnalysisOps.qualityCtes},
       |lab AS (SELECT doc_id, label AS cluster_id FROM fixl),
       |j AS (SELECT cluster_id, doc_id, quality_score
       |      FROM lab JOIN qual USING (doc_id)),
       |r AS (SELECT cluster_id, doc_id, quality_score,
       |        CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
       |        row_number() OVER (PARTITION BY cluster_id
       |          ORDER BY CAST(floor(quality_score * 1000000 + 0.5) AS BIGINT) DESC,
       |            doc_id) AS rk
       |      FROM j)
       |SELECT cluster_id, n_members, doc_id AS kept_doc_id,
       |  quality_score AS kept_quality
       |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin

  // ---- q76: leakage-safe train/holdout split assignment -------------------

  final val SplitBuckets = 100  // final literal: constant-folded at use sites (object-init-cycle-proof)
  final val TrainBuckets = 90  // final literal: constant-folded at use sites (object-init-cycle-proof)

  /** Contamination-safe split assignment: the split key is the doc's
    * CLUSTER representative, never the doc itself, so every near-dup of a
    * holdout document is held out with it — assigning splits by doc hash
    * would leak paraphrases of the eval set into training. Deterministic
    * md5 bucketing (reproducible in any engine), TrainBuckets/SplitBuckets
    * to train. Row-local after the label join — no extra shuffle. */
  def leakageSafeSplits(spark: SparkSession, dir: String): DataFrame =
    dupLabelsFixpoint(spark, dir)
      .select(col("doc_id"), col("label").as("cluster_id"))
      .withColumn("bucket", TextAnalysisOps.shardOf(col("cluster_id"), SplitBuckets))
      .withColumn("split",
        when(col("bucket") < TrainBuckets, "train").otherwise("holdout"))
      .orderBy("doc_id")

  val leakageSafeSplitsSql: String =
    s"""WITH RECURSIVE $fixLabelCtes,
       |lab AS (SELECT doc_id, label AS cluster_id FROM fixl),
       |b AS (SELECT doc_id, cluster_id,
       |        CAST(('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |          % $SplitBuckets AS bucket
       |      FROM lab)
       |SELECT doc_id, cluster_id, bucket,
       |  CASE WHEN bucket < $TrainBuckets THEN 'train' ELSE 'holdout' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  // ---- q150: split–source balance audit -----------------------------------

  /** q150: is the holdout representative — per source, the train and
    * holdout document counts, the source's corpus share vs its share of
    * the HOLDOUT, and the per-source holdout fraction. q76's
    * cluster-atomic bucketing guarantees leakage-safety, not balance: a
    * source whose docs cluster heavily can land lopsided in one split,
    * and then every holdout number (q132's AUC above all) measures that
    * source's quirks instead of generalization. The audit that must be
    * green before anyone reads q132's generalization gap.
    *
    * Scale shape: one doc_id join of the memoized split assignment onto
    * the documents scan, a |sources|-key conditional-sum aggregate, and
    * 1-row totals broadcast back. Shares are integer ratios; zero-size
    * holdouts guard to 0 identically in both engines. */
  def splitBalance(spark: SparkSession, dir: String): DataFrame = {
    val per = docs(spark, dir).select("doc_id", "source")
      .join(leakageSafeSplits(spark, dir).select("doc_id", "split"), "doc_id")
      .groupBy("source")
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "holdout", 1L).otherwise(0L)).as("n_holdout"))
    val tot = per.agg(sum(col("n_train")).as("tt"), sum(col("n_holdout")).as("th"))
    per.crossJoin(broadcast(tot))
      .withColumn("cs", (col("n_train") + col("n_holdout")).cast("double") /
        (col("tt") + col("th")))
      .withColumn("hs", when(col("th") === 0, lit(0.0))
        .otherwise(col("n_holdout").cast("double") / col("th")))
      .select(col("source"), col("n_train"), col("n_holdout"),
        r6(col("cs")).as("corpus_share"), r6(col("hs")).as("holdout_share"),
        r6(col("n_holdout").cast("double") /
          (col("n_train") + col("n_holdout"))).as("holdout_frac"),
        r6(abs(col("cs") - col("hs"))).as("abs_share_diff"))
      .orderBy("source")
  }

  val splitBalanceSql: String =
    s"""WITH RECURSIVE $fixLabelCtes,
       |slab AS (SELECT doc_id,
       |           CASE WHEN CAST(('0x' || substring(md5(CAST(label AS VARCHAR)), 1, 15)) AS BIGINT)
       |                  % $SplitBuckets < $TrainBuckets
       |                THEN 'train' ELSE 'holdout' END AS split
       |         FROM fixl),
       |sper AS (SELECT source,
       |           sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
       |           sum(CASE WHEN split = 'holdout' THEN 1 ELSE 0 END) AS n_holdout
       |         FROM documents d JOIN slab USING (doc_id) GROUP BY source),
       |stot AS (SELECT sum(n_train) AS tt, sum(n_holdout) AS th FROM sper),
       |sfin AS (SELECT source, n_train, n_holdout,
       |           (n_train + n_holdout)::DOUBLE / (tt + th) AS cs,
       |           CASE WHEN th = 0 THEN 0.0 ELSE n_holdout::DOUBLE / th END AS hs
       |         FROM sper, stot)
       |SELECT source, CAST(n_train AS BIGINT) AS n_train,
       |  CAST(n_holdout AS BIGINT) AS n_holdout,
       |  floor(cs * 1000000 + 0.5) / 1000000 AS corpus_share,
       |  floor(hs * 1000000 + 0.5) / 1000000 AS holdout_share,
       |  floor((n_holdout::DOUBLE / (n_train + n_holdout)) * 1000000 + 0.5) / 1000000 AS holdout_frac,
       |  floor(abs(cs - hs) * 1000000 + 0.5) / 1000000 AS abs_share_diff
       |FROM sfin ORDER BY source""".stripMargin

  // ---- q82: end-to-end curation pipeline (keep-best → splits → budget) ----

  /** The corpus-release artifact (VERDICT r6 #5), composing the three
    * curation operators over one shared cluster/quality build:
    *
    *   1. q75 keep-best — collapse each near-dup cluster to its
    *      best-quality representative;
    *   2. q76 splits — assign train/holdout by CLUSTER representative
    *      (near-dups of holdout docs held out together);
    *   3. q78 budget — greedy token-budget fill (half the train-survivor
    *      total) over the TRAIN survivors in (quality DESC, doc_id ASC)
    *      order, via the same quality-histogram decomposition (bucket
    *      prefix window over ≤ 10⁶ integer micro-score rows + per-doc
    *      window PARTITIONED BY bucket — no single-partition corpus pass).
    *
    * One row per surviving document: (doc_id, cluster_id, split,
    * quality_score, n_tokens, kept, cum_tokens). Holdout survivors are
    * kept unconditionally (eval sets are not budget-cut) with
    * cum_tokens = −1 (sentinel, not NULL — a mixed NULL/BIGINT column
    * breaks cross-engine row-sort comparison); train survivors carry
    * their budget prefix sum and kept = fits-the-budget. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame =
    splitAndBudget(clusterWinners(spark, dir))

  /** The shared q82/q113 tail: cluster-atomic split assignment, then the
    * q78 histogram-decomposed greedy budget fill over train survivors. */
  private def splitAndBudget(winnersIn: DataFrame): DataFrame = {
    val winners = winnersIn
      .withColumn("bucket", TextAnalysisOps.shardOf(col("cluster_id"), SplitBuckets))
      .withColumn("split",
        when(col("bucket") < TrainBuckets, "train").otherwise("holdout"))
      .select("doc_id", "cluster_id", "split", "quality_score", "n_tokens", "qkey")
    val train = winners.filter(col("split") === "train")

    val bt = train.groupBy("qkey").agg(sum("n_tokens").as("btok"))
    val wb = Window.orderBy(col("qkey").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // Grand total rides the same bucket-window pass as the prefix sum
    // (q78's shape) — no separate aggregate + crossJoin jobs.
    val wAll = Window.orderBy(col("qkey").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bk = bt
      .withColumn("cum_before", coalesce(sum("btok").over(wb), lit(0L)))
      .withColumn("tot_all", sum("btok").over(wAll))
      .withColumn("budget", expr("CAST(tot_all DIV 2 AS BIGINT)"))
      .select("qkey", "cum_before", "budget")
    val wd = Window.partitionBy("qkey").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val trainRows = train.join(broadcast(bk), "qkey")
      .withColumn("cum_tokens",
        (col("cum_before") + sum("n_tokens").over(wd)).cast("long"))
      .select(col("doc_id"), col("cluster_id"), col("split"), col("quality_score"),
        col("n_tokens"), (col("cum_tokens") <= col("budget")).as("kept"),
        col("cum_tokens"))
    val holdRows = winners.filter(col("split") === "holdout")
      .select(col("doc_id"), col("cluster_id"), col("split"), col("quality_score"),
        col("n_tokens"), lit(true).as("kept"), lit(-1L).as("cum_tokens"))
    trainRows.unionByName(holdRows).orderBy("doc_id")
  }

  /** q113: the release pipeline with the CONTAMINATION gates in front —
    * what a real corpus release runs, composed from the declared
    * operators over their shared memoized builds:
    *
    *   0. exclusions — the benchmark slice itself (the q45/q83 1/97
    *      pseudo-eval set; a release never ships its eval documents)
    *      and every q83-flagged verbatim-contaminated document;
    *   1–3. q82's keep-best → cluster-atomic splits → token-budget fill
    *      over what remains.
    *
    * Exclusion applies to the keep-best WINNERS: a cluster whose
    * representative is benchmark/contaminated drops entirely — its other
    * members are near-dups of excluded text and have no business in a
    * release (the conservative call, documented rather than silent).
    * Same output shape as q82; budgets re-derive over the surviving
    * train set. One extra broadcast anti-join over q83's flagged ids
    * (eval-set-scale) on top of q82's plan — the scale shape is
    * unchanged. */
  def releasePipeline(spark: SparkSession, dir: String): DataFrame = {
    val flagged = verbatimDecontamination(spark, dir).select("doc_id")
    splitAndBudget(
      clusterWinners(spark, dir)
        .filter(pmod(col("doc_id"), lit(DecontamMod)) =!= 0)
        .join(broadcast(flagged), Seq("doc_id"), "left_anti"))
  }

  /** Shared q82/q113 oracle generator: the winners → splits → budget
    * chain, with optional extra CTE blocks and a filter applied to the
    * keep-best winners (q113's exclusion gates). */
  private def pipelineSqlFrom(extraCtes: String, winFilter: String): String =
    s"""WITH RECURSIVE $fixLabelCtes,
       |${TextAnalysisOps.qualityCtes},$extraCtes
       |lab AS (SELECT doc_id, label AS cluster_id FROM fixl),
       |cj AS (SELECT cluster_id, doc_id, quality_score, n_tokens,
       |         CAST(floor(quality_score * 1000000 + 0.5) AS BIGINT) AS qkey
       |       FROM lab JOIN qual USING (doc_id)),
       |win AS (SELECT cluster_id, doc_id, quality_score, n_tokens, qkey FROM (
       |          SELECT *, row_number() OVER (PARTITION BY cluster_id
       |            ORDER BY qkey DESC, doc_id) AS rk FROM cj) WHERE rk = 1
       |        $winFilter),
       |sp AS (SELECT doc_id, cluster_id, quality_score, n_tokens, qkey,
       |         CASE WHEN CAST(('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |                   % $SplitBuckets < $TrainBuckets
       |              THEN 'train' ELSE 'holdout' END AS split
       |       FROM win),
       |tr AS (SELECT *, CAST(sum(n_tokens) OVER (ORDER BY qkey DESC, doc_id
       |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       |         CAST(sum(n_tokens) OVER () // 2 AS BIGINT) AS budget
       |       FROM sp WHERE split = 'train')
       |SELECT doc_id, cluster_id, split, quality_score,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  cum_tokens <= budget AS kept, cum_tokens
       |FROM tr
       |UNION ALL
       |SELECT doc_id, cluster_id, split, quality_score,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  true AS kept, CAST(-1 AS BIGINT) AS cum_tokens
       |FROM sp WHERE split = 'holdout'
       |ORDER BY doc_id""".stripMargin

  val curationPipelineSql: String = pipelineSqlFrom("", "")

  // lazy: wtkCte is declared later in the object body (q83 section).
  lazy val releasePipelineSql: String = pipelineSqlFrom(
    s"\n$wtkCte,\n${verbatimCtes(VerbatimWindow)},",
    s"""AND doc_id % $DecontamMod <> 0
       |          AND doc_id NOT IN (SELECT doc_id FROM out$VerbatimWindow)""".stripMargin)

  // ---- q157: curation funnel attrition table -------------------------------

  /** q157: the release report every curated-corpus paper prints — the
    * attrition funnel. Per stage of the q113 gated release, the
    * surviving document and token mass plus fractions of raw:
    *   0 raw → 1 keep_best (near-dup collapse, subsumes exact dups)
    *   → 2 bench_excluded (the 1/97 eval slice out)
    *   → 3 decontaminated (q83 verbatim-flagged docs out)
    *   → 4 train_split (the cluster-atomic q76 train side)
    *   → 5 budget_kept (the q78 quality-greedy token budget).
    * q113 ships the artifact; this is the one-page accounting of WHERE
    * the mass went — a funnel that loses 40% at one stage is a
    * misconfigured gate, and the stage framing makes that visible
    * before release. Stages derive from the SAME memoized frames and
    * shared SQL blocks as q113, so report and artifact cannot drift.
    *
    * Scale shape: six 1-row aggregates over frames the pipeline already
    * builds; the raw totals broadcast back onto 6 rows. Monotone
    * non-increasing by construction (spec-pinned). */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val raw = TextAnalysisOps.textQuality(spark, dir).select("doc_id", "n_tokens")
    val winners = clusterWinners(spark, dir).select("doc_id", "n_tokens")
    val bench = winners.filter(pmod(col("doc_id"), lit(DecontamMod)) =!= 0)
    val decon = bench.join(
      broadcast(verbatimDecontamination(spark, dir).select("doc_id")),
      Seq("doc_id"), "left_anti")
    val rel = releasePipeline(spark, dir)
    val train = rel.filter(col("split") === "train").select("doc_id", "n_tokens")
    val kept = rel.filter(col("split") === "train" && col("kept"))
      .select("doc_id", "n_tokens")
    def stage(id: Long, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(id).as("stage_id"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    val stages = Seq(
      stage(0L, "raw", raw), stage(1L, "keep_best", winners),
      stage(2L, "bench_excluded", bench), stage(3L, "decontaminated", decon),
      stage(4L, "train_split", train), stage(5L, "budget_kept", kept))
      .reduce(_.unionByName(_))
    val base = raw.agg(count(lit(1)).as("d0"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("t0"))
    stages.crossJoin(broadcast(base))
      .select(col("stage_id"), col("stage"), col("n_docs"), col("n_tokens"),
        r6(col("n_docs").cast("double") / col("d0")).as("docs_frac"),
        r6(col("n_tokens").cast("double") / col("t0")).as("tokens_frac"))
      .orderBy("stage_id")
  }

  lazy val curationFunnelSql: String =
    s"""WITH RECURSIVE $fixLabelCtes,
       |${TextAnalysisOps.qualityCtes},
       |$wtkCte,
       |${verbatimCtes(VerbatimWindow)},
       |lab AS (SELECT doc_id, label AS cluster_id FROM fixl),
       |cj AS (SELECT cluster_id, doc_id, quality_score, n_tokens,
       |         CAST(floor(quality_score * 1000000 + 0.5) AS BIGINT) AS qkey
       |       FROM lab JOIN qual USING (doc_id)),
       |win AS (SELECT cluster_id, doc_id, quality_score, n_tokens, qkey FROM (
       |          SELECT *, row_number() OVER (PARTITION BY cluster_id
       |            ORDER BY qkey DESC, doc_id) AS rk FROM cj) WHERE rk = 1),
       |fwb AS (SELECT * FROM win WHERE doc_id % $DecontamMod <> 0),
       |fwd AS (SELECT * FROM fwb
       |        WHERE doc_id NOT IN (SELECT doc_id FROM out$VerbatimWindow)),
       |fsp AS (SELECT *,
       |          CASE WHEN CAST(('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |                    % $SplitBuckets < $TrainBuckets
       |               THEN 'train' ELSE 'holdout' END AS split
       |        FROM fwd),
       |ftr AS (SELECT *, CAST(sum(n_tokens) OVER (ORDER BY qkey DESC, doc_id
       |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       |          CAST(sum(n_tokens) OVER () // 2 AS BIGINT) AS budget
       |        FROM fsp WHERE split = 'train'),
       |fsx AS (
       |  SELECT 0 AS stage_id, 'raw' AS stage, count(*) AS n_docs,
       |    coalesce(sum(n_tokens), 0) AS n_tokens FROM qual
       |  UNION ALL SELECT 1, 'keep_best', count(*), coalesce(sum(n_tokens), 0) FROM win
       |  UNION ALL SELECT 2, 'bench_excluded', count(*), coalesce(sum(n_tokens), 0) FROM fwb
       |  UNION ALL SELECT 3, 'decontaminated', count(*), coalesce(sum(n_tokens), 0) FROM fwd
       |  UNION ALL SELECT 4, 'train_split', count(*), coalesce(sum(n_tokens), 0)
       |    FROM fsp WHERE split = 'train'
       |  UNION ALL SELECT 5, 'budget_kept', count(*), coalesce(sum(n_tokens), 0)
       |    FROM ftr WHERE cum_tokens <= budget),
       |fb AS (SELECT count(*) AS d0, coalesce(sum(n_tokens), 0) AS t0 FROM qual)
       |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage,
       |  CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  floor((n_docs::DOUBLE / d0) * 1000000 + 0.5) / 1000000 AS docs_frac,
       |  floor((n_tokens::DOUBLE / t0) * 1000000 + 0.5) / 1000000 AS tokens_frac
       |FROM fsx, fb ORDER BY stage_id""".stripMargin

  // ---- q83: verbatim-window decontamination (contiguous containment) ------

  /** Contiguous-window size in tokens — the Dolma/CCNet-style
    * contamination test: a training doc is contaminated if it contains a
    * VERBATIM run of VerbatimWindow consecutive benchmark tokens. Compare
    * q45 (≥3 distinct 3-shingles ANYWHERE — scattered coincidental shares
    * can flag) and q43 (set Jaccard ≥ 0.30 — a short quote inside a long
    * doc has tiny Jaccard and is MISSED); contiguity is exactly the
    * verbatim-quote signal both of those blur. Round7OpsSpec separates
    * the three on planted contamination. */
  val VerbatimWindow = 8

  /** Window lengths the multi-n sweep (q107) reports. Contamination
    * practice sweeps n rather than trusting one floor: 13 tokens is the
    * common published standard (GPT-3/Dolma-style 13-gram checks) — at
    * n = 13 a truly verbatim quote still matches while borderline
    * 8-token coincidences (idioms, boilerplate phrases) drop out; n = 8
    * is the aggressive floor q83 declares. Round8OpsSpec plants a quote
    * of each length and pins the separation. */
  val VerbatimWindows: Seq[Int] = Seq(VerbatimWindow, 13)

  /** Flag training docs sharing ≥1 exact n-token contiguous window with
    * any pseudo-benchmark doc (the q45 1/97 slice), keyed by md5 so the
    * join exchanges a 16-byte key instead of a ~50-char string. n is the
    * MINIMUM detectable span: docs with fewer tokens are excluded from
    * BOTH sides (a shorter-than-window doc's whole-string "window" could
    * only ever match a token-identical short doc, never its verbatim
    * quotation inside a longer one — a false promise of coverage), so
    * sub-window benchmark docs are the overlap tier's (q45) job, as in
    * Dolma-style pipelines where the contamination n-gram length is a
    * declared floor. Same scale shape as q45: the benchmark side is
    * eval-set-sized and broadcast; the corpus side streams map-side into
    * a per-doc partial aggregate. An 8-token window is far more
    * selective than a 3-shingle, so candidate volume is strictly below
    * q45's; 13-token windows are more selective still. */
  /** The (doc_id, w, bench_id) hit frame behind q83/q107/q143: every
    * (corpus doc, n-token window, benchmark doc) verbatim coincidence.
    * Grouping by doc_id gives the training-side verdict (q83/q107);
    * grouping by bench_id gives the benchmark-side report (q143). */
  /** Distinct (doc_id, window-md5) membership rows at window length n —
    * the verbatim tier's shingleSets twin, memoized per (appId, dir, n)
    * since r18: q83, q107, q113, q119, q143 and q157 each re-tokenized
    * the corpus and re-hashed every n-window per invocation (q107/q143
    * three times each, once per swept n) to rebuild the same index-like
    * membership table. */
  private val windowCache = Memo.frame()

  private def windowSets(spark: SparkSession, dir: String, n: Int): DataFrame =
    windowCache.getOrElseUpdate(
      s"w$n:${spark.sparkContext.applicationId}:$dir", {
        val eligible = docs(spark, dir)
          .filter(size(TextOps.tokenize(col("text"))) >= n)
        explodedShingles(eligible, n)
          .select(col("doc_id"), md5(col("s")).as("w")).distinct()
          .cache()
      })

  private def verbatimHitsAt(spark: SparkSession, dir: String, n: Int): DataFrame = {
    val ws = windowSets(spark, dir, n)
    val bench = ws.filter(pmod(col("doc_id"), lit(DecontamMod)) === 0)
      .select(col("w"), col("doc_id").as("bench_id"))
    ws.filter(pmod(col("doc_id"), lit(DecontamMod)) =!= 0)
      .join(broadcast(bench), "w")
  }

  private def verbatimAt(spark: SparkSession, dir: String, n: Int): DataFrame =
    verbatimHitsAt(spark, dir, n)
      .groupBy("doc_id")
      .agg(countDistinct("w").as("n_windows"),
        countDistinct("bench_id").as("n_bench_docs"))
      .orderBy("doc_id")

  /** q83: the declared operating point (n = VerbatimWindow). */
  def verbatimDecontamination(spark: SparkSession, dir: String): DataFrame =
    verbatimAt(spark, dir, VerbatimWindow)

  /** The benchmark side's window keys, collected — the eval-set-scale
    * artifact the STREAMING decontamination gate inlines as a literal
    * (same driver-scale argument as the frozen quality model and the
    * sign-LSH anchors: an eval set is thousands of windows, not a
    * corpus). Batch-derived with the exact q83 derivation so the gate
    * and the declared query cannot drift. */
  def benchWindowKeys(spark: SparkSession, dir: String,
      n: Int = VerbatimWindow): Array[String] = {
    val eligible = docs(spark, dir)
      .filter(pmod(col("doc_id"), lit(DecontamMod)) === 0)
      .filter(size(TextOps.tokenize(col("text"))) >= n)
    explodedShingles(eligible, n)
      .select(md5(col("s")).as("w")).distinct()
      .collect().map(_.getString(0))
  }

  /** q107: the multi-n containment sweep — the same test at every
    * declared window length, one (n, doc, windows, bench_docs) row per
    * flagged doc per n. The n = 13 rows are definitionally a subset of
    * the n = 8 rows (a 13-window contains an 8-window), so the report
    * reads as a precision ladder: docs present only at n = 8 are the
    * borderline tier a release reviews by hand, docs surviving at n = 13
    * are contamination by the published standard. Each n is an
    * independent broadcast join over its own shingle pass — no shared
    * state, so the sweep is embarrassingly parallel and 100 TB cost is
    * |sweep| × the q83 shape. */
  def verbatimMultiN(spark: SparkSession, dir: String): DataFrame =
    VerbatimWindows.map { n =>
      verbatimAt(spark, dir, n)
        .select(lit(n.toLong).as("n"), col("doc_id"),
          col("n_windows"), col("n_bench_docs"))
    }.reduce(_.unionByName(_)).orderBy("n", "doc_id")

  /** Shared q83/q107 oracle block generator: the full derivation for one
    * window length with suffixed CTE names, ending in out$n(n, doc_id,
    * n_windows, n_bench_docs). */
  private def verbatimCtes(n: Int): String =
    s"""wsh$n AS (SELECT doc_id,
       |          [array_to_string(t[i:i+${n - 1}], ' ')
       |           FOR i IN range(1, len(t) - ${n - 2})] AS ws
       |        FROM wtk WHERE len(t) >= $n),
       |wx$n AS (SELECT doc_id, unnest(ws) AS s FROM wsh$n),
       |wd$n AS (SELECT DISTINCT doc_id, md5(s) AS w FROM wx$n),
       |bench$n AS (SELECT w, doc_id AS bench_id FROM wd$n WHERE doc_id % $DecontamMod = 0),
       |out$n AS (SELECT CAST($n AS BIGINT) AS n, wd$n.doc_id,
       |    count(DISTINCT wd$n.w) AS n_windows,
       |    count(DISTINCT bench_id) AS n_bench_docs
       |  FROM wd$n JOIN bench$n ON wd$n.w = bench$n.w
       |  WHERE wd$n.doc_id % $DecontamMod <> 0
       |  GROUP BY wd$n.doc_id)""".stripMargin

  // ---- q143: benchmark-side contamination report --------------------------

  /** q143: the q83/q107 test read from the BENCHMARK's side — for each
    * window length n and each benchmark item, how many corpus documents
    * quote it verbatim and how many of its distinct n-windows leak. q83
    * answers "which training docs do I drop"; this answers the question
    * an eval owner asks FIRST: "which of my eval items are burned, and
    * how badly" — an item quoted by thousands of docs is memorized
    * boilerplate and belongs out of the benchmark, independent of any
    * training-side filtering. Same broadcast-join shape as q83 (the hit
    * frame is shared code), re-aggregated on the eval-set-sized
    * bench_id key — output is benchmark-scale, never corpus-scale. */
  def benchContamination(spark: SparkSession, dir: String): DataFrame =
    VerbatimWindows.map { n =>
      verbatimHitsAt(spark, dir, n)
        .groupBy("bench_id")
        .agg(countDistinct("doc_id").as("n_contaminating_docs"),
          countDistinct("w").as("n_leaked_windows"))
        .select(lit(n.toLong).as("n"), col("bench_id"),
          col("n_contaminating_docs"), col("n_leaked_windows"))
    }.reduce(_.unionByName(_)).orderBy("n", "bench_id")

  /** Benchmark-side aggregation of the verbatimCtes($n) hit join, ending
    * in bout$n(n, bench_id, n_contaminating_docs, n_leaked_windows). */
  private def benchContamCtes(n: Int): String =
    s"""bout$n AS (SELECT CAST($n AS BIGINT) AS n, bench_id,
       |    count(DISTINCT wd$n.doc_id) AS n_contaminating_docs,
       |    count(DISTINCT wd$n.w) AS n_leaked_windows
       |  FROM wd$n JOIN bench$n ON wd$n.w = bench$n.w
       |  WHERE wd$n.doc_id % $DecontamMod <> 0
       |  GROUP BY bench_id)""".stripMargin

  private val wtkCte: String =
    s"""wtk AS (SELECT doc_id, regexp_extract_all(lower(text), '$TokRe') AS t
       |        FROM documents)""".stripMargin

  val verbatimDecontaminationSql: String =
    s"""WITH $wtkCte,
       |${verbatimCtes(VerbatimWindow)}
       |SELECT doc_id, n_windows, n_bench_docs FROM out$VerbatimWindow
       |ORDER BY doc_id""".stripMargin

  val verbatimMultiNSql: String =
    s"""WITH $wtkCte,
       |${VerbatimWindows.map(verbatimCtes).mkString(",\n")}
       |${VerbatimWindows.map(n => s"SELECT * FROM out$n").mkString("\nUNION ALL\n")}
       |ORDER BY n, doc_id""".stripMargin

  val benchContaminationSql: String =
    s"""WITH $wtkCte,
       |${VerbatimWindows.map(n => s"${verbatimCtes(n)},\n${benchContamCtes(n)}").mkString(",\n")}
       |${VerbatimWindows.map(n => s"SELECT * FROM bout$n").mkString("\nUNION ALL\n")}
       |ORDER BY n, bench_id""".stripMargin

  // ---- q48: SimHash near-dup pairs (Hamming-LSH banding) ------------------

  val SimhashBandBits = 15
  val SimhashNumBands = 4 // covers the 60-bit simhash
  val HammingThreshold = 12

  /** Hamming-LSH candidate pairs over ANY 60-bit fingerprint frame
    * (doc_id, <hashCol>): candidates share at least one 15-bit band
    * (any pair within Hamming distance SimhashNumBands−1 is guaranteed
    * caught; more distant pairs probabilistically), verified with the
    * exact popcount distance. Shared by q48 (text SimHash) and q81
    * (image dHash) — the machinery is fingerprint-agnostic: band
    * extraction (shift/mask) and verification (`bit_count(a ^ b)`) are
    * built-in codegen'd integer ops, the band join keys on a short int. */
  private[operators] def hammingBandPairs(sh: DataFrame, hashCol: String): DataFrame = {
    val bands = sh.select(col("doc_id"), col(hashCol).as("h"),
        explode(sequence(lit(0), lit(SimhashNumBands - 1))).as("b"))
      .withColumn("band_val",
        expr(s"shiftright(h, CAST($SimhashBandBits * b AS INT)) & ${(1 << SimhashBandBits) - 1}"))
    bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.h").as("h_a"), col("b.h").as("h_b"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(h_a ^ h_b) AS BIGINT)"))
  }

  /** Near-dup pairs over the q35 SimHash fingerprints — the cheap
    * complement to the shingle-MinHash pipeline: no shingling, one 8-byte
    * key per doc, band join on a short int key (see hammingBandPairs). */
  def simhashNearDups(spark: SparkSession, dir: String): DataFrame =
    hammingBandPairs(TextAnalysisOps.simhashFrame(spark, dir), "simhash")
      .filter(col("hamming") <= HammingThreshold)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")

  val simhashNearDupsSql: String =
    s"""WITH ${TextAnalysisOps.simhashCtes},
       |sbands AS (SELECT doc_id, simhash, b,
       |             (simhash >> ($SimhashBandBits * b)) & ${(1 << SimhashBandBits) - 1} AS band_val
       |           FROM shf, (SELECT unnest(range(0, $SimhashNumBands)) AS b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           a.simhash AS sh_a, b.simhash AS sh_b
       |         FROM sbands a JOIN sbands b
       |           ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= $HammingThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- q84: repeated-span self-dedup (corpus-internal verbatim runs) ------

  /** Span length in tokens for corpus-internal repeated-span detection.
    * 5 tokens is long enough that shares are verbatim reuse, short enough
    * to catch partial overlap the whole-doc tiers miss. */
  val SpanK = 5

  /** Per-document repeated-span coverage — the span-level complement to
    * the whole-document dedup tiers (reference dedups whole docs;
    * suffix-array pipelines remove repeated SPANS: boilerplate, quoted
    * headers, licence blocks). A span is a SpanK-token contiguous window
    * occurring in ≥ 2 distinct documents; per doc, overlapping dup spans
    * are interval-merged with one ordered window pass so each token is
    * counted once. Output: token count, merged dup-token coverage,
    * merged span-run count, covered fraction.
    *
    * Scale shape: positioned windows are assembled inside whole-stage
    * codegen (the explodedShingles formulation, position kept) and keyed
    * by md5 so the df join exchanges 16-byte keys; the df aggregate has a
    * map-side partial combine; the merge window partitions BY DOC over
    * only the duplicated positions (dup spans are a small fraction of any
    * healthy corpus). Nothing global, no all-pairs step — at 100 TB this
    * is two hash shuffles (span df, per-doc merge) over span-sized rows. */
  def repeatedSpans(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), TextOps.tokenize(col("text")).as("t"))
    val base = d.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
    val grams = d.filter(size(col("t")) >= SpanK)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - (SpanK - 1))).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("i"),
        md5(concat_ws(" ",
          (0 until SpanK).map(k => element_at(col("t"), col("i") + k)): _*)).as("g"))
    val dupGrams = grams.groupBy("g").agg(countDistinct("doc_id").as("gdf"))
      .filter(col("gdf") >= 2).select("g")
    val hits = grams.join(dupGrams, "g").select("doc_id", "i")
    // Interval union: spans cover [i, i+SpanK-1]; sorted by i, each row's
    // marginal contribution is its end minus the running max end (prev
    // ends are always < this row's end because SpanK is constant).
    val w = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    val merged = hits
      .withColumn("prev_end", max(col("i") + (SpanK - 1)).over(w))
      .select(col("doc_id"),
        when(col("prev_end").isNull, lit(SpanK.toLong))
          .otherwise(least(lit(SpanK.toLong), col("i") + (SpanK - 1) - col("prev_end")))
          .as("marginal"),
        when(col("prev_end").isNull || col("i") > col("prev_end") + 1, 1L)
          .otherwise(0L).as("run_start"))
      .groupBy("doc_id")
      .agg(sum("marginal").as("dup_tokens"), sum("run_start").as("n_runs"))
    base.join(merged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        r6(when(col("n_tokens") === 0, lit(0.0))
          .otherwise(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens"))).as("dup_span_frac"))
      .orderBy("doc_id")
  }

  val repeatedSpansSql: String =
    s"""WITH stk AS (SELECT doc_id, regexp_extract_all(lower(text), '$TokRe') AS t
       |             FROM documents),
       |sg AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
       |         md5(array_to_string(t[i:i+${SpanK - 1}], ' ')) AS g
       |       FROM stk, LATERAL (SELECT unnest(range(1, len(t) - ${SpanK - 2})) AS i) u
       |       WHERE len(t) >= $SpanK),
       |dupg AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS gdf FROM sg GROUP BY g)
       |         WHERE gdf >= 2),
       |hits AS (SELECT doc_id, i FROM sg JOIN dupg USING (g)),
       |mrk AS (SELECT doc_id, i,
       |          max(i + ${SpanK - 1}) OVER (PARTITION BY doc_id ORDER BY i
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |        FROM hits),
       |agg AS (SELECT doc_id,
       |          sum(CASE WHEN prev_end IS NULL THEN $SpanK
       |                   ELSE least($SpanK, i + ${SpanK - 1} - prev_end) END) AS dup_tokens,
       |          sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1 THEN 1 ELSE 0 END) AS n_runs
       |        FROM mrk GROUP BY doc_id)
       |SELECT d.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CAST(coalesce(n_runs, 0) AS BIGINT) AS n_runs,
       |  floor((CASE WHEN len(t) = 0 THEN 0.0
       |              ELSE coalesce(dup_tokens, 0)::DOUBLE / len(t) END) * 1000000 + 0.5)
       |    / 1000000 AS dup_span_frac
       |FROM stk d LEFT JOIN agg ON d.doc_id = agg.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---- q85: incremental dedup (incoming snapshot vs retained corpus) ------

  /** The incoming "crawl snapshot" for the incremental-dedup query: one of
    * the 20 synthetic sources stands in for the newest ingest batch. */
  val IncomingSource = "src19"

  /** Dedup an incoming batch AGAINST the retained corpus — the production
    * ingest shape (the batch variant of the streaming LSH gate): never
    * re-pair the retained corpus with itself, only (new × retained)
    * band-hash matches, verified with exact shingle Jaccard. One row per
    * incoming doc: candidate count, best retained match (highest Jaccard,
    * ties to the lowest doc_id; −1 when no candidate) and the keep/drop
    * verdict at JaccardThreshold.
    *
    * Scale shape: the band join keys on (band_id, band_hash) and is
    * asymmetric — candidates are bounded by the incoming batch's bands,
    * not the corpus pair count. The incoming side is broadcast here
    * (a snapshot is small next to the retained corpus; the cached corpus
    * band frame also defeats size estimation, as at q45); at a scale
    * where the batch outgrows broadcast it becomes a plain hash join on
    * the same key — the shape is unchanged. Verification touches only
    * candidate pairs, and the argmax is a map-side-combined min(struct). */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val src = docs(spark, dir).select("doc_id", "source")
    val bands = minhashBands(spark, dir).join(src, "doc_id")
    val newB = bands.filter(col("source") === IncomingSource)
      .select(col("doc_id").as("doc_a"), col("band_id"), col("band_hash"))
    val oldB = bands.filter(col("source") =!= IncomingSource)
      .select(col("doc_id").as("doc_b"), col("band_id"), col("band_hash"))
    val cand = oldB.join(broadcast(newB), Seq("band_id", "band_hash"))
      .select("doc_a", "doc_b").distinct()
    val best = withJaccard(spark, dir, cand)
      .groupBy("doc_a")
      .agg(count(lit(1)).as("n_candidates"),
        min(struct((-col("jaccard")).as("nj"), col("doc_b"))).as("best"))
      .select(col("doc_a"), col("n_candidates"),
        col("best.doc_b").as("best_match"), (-col("best.nj")).as("best_jaccard"))
    src.filter(col("source") === IncomingSource)
      .join(best, col("doc_id") === col("doc_a"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("best_match"), lit(-1L)).as("best_match"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
        coalesce(col("best_jaccard") >= JaccardThreshold, lit(false)).as("is_dup"))
      .orderBy("doc_id")
  }

  val incrementalDedupSql: String =
    s"""WITH $shinglesCte,
       |$minhashCtes,
       |srcs AS (SELECT doc_id, source FROM documents),
       |nb AS (SELECT doc_id AS doc_a, band_id, band_hash FROM bands
       |       JOIN srcs USING (doc_id) WHERE source = '$IncomingSource'),
       |ob AS (SELECT doc_id AS doc_b, band_id, band_hash FROM bands
       |       JOIN srcs USING (doc_id) WHERE source <> '$IncomingSource'),
       |pairs AS (SELECT DISTINCT doc_a, doc_b FROM nb JOIN ob USING (band_id, band_hash)),
       |$jaccardCtes,
       |best AS (SELECT doc_a, cnt AS n_candidates, doc_b AS best_match,
       |           jaccard AS best_jaccard
       |         FROM (SELECT *, row_number() OVER (PARTITION BY doc_a
       |                 ORDER BY jaccard DESC, doc_b ASC) AS rn,
       |                 count(*) OVER (PARTITION BY doc_a) AS cnt
       |               FROM jac)
       |         WHERE rn = 1),
       |newdocs AS (SELECT doc_id FROM srcs WHERE source = '$IncomingSource')
       |SELECT n.doc_id,
       |  CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
       |  coalesce(best_match, -1) AS best_match,
       |  coalesce(best_jaccard, 0.0) AS best_jaccard,
       |  coalesce(best_jaccard >= $JaccardThreshold, false) AS is_dup
       |FROM newdocs n LEFT JOIN best ON best.doc_a = n.doc_id
       |ORDER BY n.doc_id""".stripMargin

  // ---- q88: cross-source duplication matrix -------------------------------

  /** Which sources duplicate each other — the corpus-health diagnostic a
    * multi-crawl pipeline runs before choosing mixture weights (two crawls
    * of the same site double-count unless one is dropped). Consumes the
    * memoized q42 candidate pairs + verified Jaccard, keeps verified dups
    * (≥ JaccardThreshold), maps both endpoints to their sources (order-
    * normalized so (a,b) and (b,a) accumulate together), and aggregates a
    * source-pair matrix: dup-pair count + DECIMAL-stable mean Jaccard.
    *
    * Scale shape: everything after the (already scale-safe) pair build is
    * two broadcast-able joins on doc_id against a 2-column source map and
    * one aggregate over a key space bounded by sources² — metadata scale. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val src = docs(spark, dir).select("doc_id", "source")
    val dups = withJaccard(spark, dir, lshCandidatePairs(spark, dir))
      .filter(col("jaccard") >= JaccardThreshold)
    dups
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"), col("jaccard"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_dup_pairs"),
        r6(davg(col("jaccard"))).as("mean_jaccard"))
      .orderBy("source_a", "source_b")
  }

  val sourceOverlapSql: String =
    s"""WITH $shinglesCte,
       |$minhashCtes,
       |$lshPairsCte,
       |$jaccardCtes,
       |lbl AS (SELECT least(sa.source, sb.source) AS source_a,
       |          greatest(sa.source, sb.source) AS source_b, jaccard
       |        FROM jac
       |        JOIN documents sa ON sa.doc_id = jac.doc_a
       |        JOIN documents sb ON sb.doc_id = jac.doc_b
       |        WHERE jaccard >= $JaccardThreshold)
       |SELECT source_a, source_b, count(*) AS n_dup_pairs,
       |  floor((CAST(sum(CAST(jaccard AS DECIMAL(30,8))) AS DOUBLE) / count(*))
       |    * 1000000 + 0.5) / 1000000 AS mean_jaccard
       |FROM lbl GROUP BY source_a, source_b
       |ORDER BY source_a, source_b""".stripMargin

  // ---- q106: blocked fuzzy (edit-distance) join ---------------------------

  /** Normalized-prefix length compared by levenshtein. */
  val FuzzyPrefixLen = 80
  /** Max edit distance for a pair to qualify (¼ of the prefix). */
  val FuzzyMaxDist = 20
  /** Blocking-key df cap — the q43 discipline: a first-3-token key shared
    * by thousands of docs is boilerplate, and capping it bounds the Σdf²
    * pair blowup on power-law corpora. */
  val FuzzyBlockCap = 100

  /** q106: spelling-tolerant near-title matching — the curation join the
    * hash tiers can't express: exact/MinHash/SimHash all need token or
    * bit identity somewhere, while a typo'd near-reissue ("teh" for
    * "the") slides past every one of them but sits at edit distance 1.
    * Candidates block on the md5 of the first 3 tokens (df-capped), then
    * verify with levenshtein over the FuzzyPrefixLen-char
    * whitespace-normalized prefix — an integer DP, bit-identical in both
    * engines.
    *
    * Scale shape: the block key is computed map-side and 16 bytes; pairs
    * come from a hash self-join on it (never a cross join) with volume
    * ≤ cap · N; the edit-distance verify is O(prefix²) row-local work in
    * codegen. At 100 TB the dials are key width (more tokens = smaller
    * blocks) and the df cap, exactly like q43's shingle blocking. */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"), TextOps.tokenize(col("text")).as("t"),
        substring(trim(regexp_replace(lower(col("text")), s"${TextOps.WsClass}+", " ")),
          1, FuzzyPrefixLen).as("pfx"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("pfx"),
        md5(concat_ws(" ", slice(col("t"), 1, 3))).as("bkey"))
    val keep = base.groupBy("bkey").agg(count(lit(1)).as("df"))
      .filter(col("df") <= FuzzyBlockCap).select("bkey")
    val capped = base.join(keep, "bkey")
    capped.select(col("bkey"), col("doc_id").as("doc_a"), col("pfx").as("pfx_a"))
      .join(capped.select(col("bkey"), col("doc_id").as("doc_b"), col("pfx").as("pfx_b")),
        "bkey")
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist", levenshtein(col("pfx_a"), col("pfx_b")).cast("long"))
      .filter(col("dist") <= FuzzyMaxDist)
      .select("doc_a", "doc_b", "dist")
      .orderBy("doc_a", "doc_b")
  }

  val fuzzyJoinSql: String = {
    val ws = s"${TextOps.WsClass}+"
    s"""WITH fb AS (
       |  SELECT doc_id,
       |    substring(trim(regexp_replace(lower(text), '$ws', ' ', 'g')), 1, $FuzzyPrefixLen) AS pfx,
       |    md5(array_to_string((regexp_extract_all(lower(text), '$TokRe'))[1:3], ' ')) AS bkey,
       |    len(regexp_extract_all(lower(text), '$TokRe')) AS nt
       |  FROM documents),
       |fe AS (SELECT doc_id, pfx, bkey FROM fb WHERE nt >= 3),
       |fk AS (SELECT bkey FROM fe GROUP BY bkey HAVING count(*) <= $FuzzyBlockCap)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
       |FROM fe a JOIN fk USING (bkey) JOIN fe b USING (bkey)
       |WHERE a.doc_id < b.doc_id AND levenshtein(a.pfx, b.pfx) <= $FuzzyMaxDist
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -------------------------------------------------------------------------

  // ---- q138: MinHash estimation calibration --------------------------------

  /** q138: how good is the 16-permutation MinHash estimate, measured on
    * this corpus — per exact-Jaccard decile over the LSH candidate
    * pairs: pair count, mean signature-match estimate (matches/16), mean
    * exact shingle Jaccard, and the mean absolute estimation error. The
    * audit that justifies (or indicts) the signature budget before
    * anyone trusts q42's candidate tier at 100 TB: if the error
    * concentrates just under the dedup threshold, NumHashes is too
    * small. "Measure, don't guess" applied to the engine's own sketch.
    *
    * Scale shape: estimates ride the memoized signature components
    * (16 rows/doc) through a (pair × 16) equi-join on (doc_id, j) —
    * candidate-volume bounded, like every pair operator here; exact
    * Jaccard reuses q42's verified frame; the decile aggregate is ≤ 11
    * keys. Estimates are exact multiples of 1/16 and exact Jaccards are
    * r6 decimals, so the DECIMAL means are order-free cross-engine. */
  def minhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    val mh = minhashComponents(spark, dir)
    val pairs = minhashDupPairs(spark, dir)
    val est = pairs.select("doc_a", "doc_b")
      .join(mh.select(col("doc_id").as("doc_a"), col("j"), col("m").as("ma")), "doc_a")
      .join(mh.select(col("doc_id").as("doc_b"), col("j"), col("m").as("mb")),
        Seq("doc_b", "j"))
      .groupBy("doc_a", "doc_b")
      .agg((sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).cast("double") /
        NumHashes).as("est"))
    pairs.join(est, Seq("doc_a", "doc_b"))
      .select(floor(col("jaccard") * 10).cast("long").as("bucket"),
        col("est"), col("jaccard"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_pairs"),
        r6(dsum(col("est")) / count(lit(1))).as("mean_est"),
        r6(dsum(col("jaccard")) / count(lit(1))).as("mean_exact"),
        r6(dsum(abs(col("est") - col("jaccard"))) / count(lit(1))).as("mean_abs_err"))
      .orderBy("bucket")
  }

  val minhashCalibrationSql: String =
    s"""WITH $shinglesCte,
       |$minhashCtes,
       |$lshPairsCte,
       |$jaccardCtes,
       |mest AS (SELECT p.doc_a, p.doc_b,
       |           sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END)::DOUBLE / $NumHashes AS est
       |         FROM pairs p
       |         JOIN mh x ON x.doc_id = p.doc_a
       |         JOIN mh y ON y.doc_id = p.doc_b AND y.j = x.j
       |         GROUP BY p.doc_a, p.doc_b),
       |mcal AS (SELECT CAST(floor(jaccard * 10) AS BIGINT) AS bucket, est, jaccard
       |         FROM jac JOIN mest USING (doc_a, doc_b))
       |SELECT bucket,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  floor((CAST(sum(CAST(est AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_est,
       |  floor((CAST(sum(CAST(jaccard AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_exact,
       |  floor((CAST(sum(CAST(abs(est - jaccard) AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_abs_err
       |FROM mcal GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---- q141: signature-budget sweep ---------------------------------------

  /** Signature budgets swept by q141 — prefixes of the full 16-hash
    * signature, so the sweep prices SHRINKING the budget without
    * recomputing anything. */
  val SweepBudgets: Seq[Long] = Seq(4L, 8L, 16L)

  /** q141: what would a smaller signature cost — for each budget
    * H ∈ {4, 8, 16}, the estimate uses only the FIRST H signature
    * components, and the sweep reports the mean absolute estimation
    * error plus the operational number a dedup pipeline actually cares
    * about: the THRESHOLD FLIP RATE, the fraction of candidate pairs
    * where thresholding the H-hash estimate at JaccardThreshold
    * disagrees with thresholding the exact Jaccard. q138 measures how
    * good the current budget is; this is the tuning curve that says
    * whether 16 is the right number (at 100 TB, signature width is a
    * direct multiplier on the dedup tier's shuffle volume, so the flip
    * rate per budget is the cost/accuracy trade stated in one table).
    *
    * Scale shape: identical to q138 — one (pair × 16) equi-join on the
    * memoized components with all three budget counters accumulated in
    * ONE pair-keyed aggregate (conditional sums on j < H), then a 3×
    * explode on the pair frame and a 3-key aggregate. The threshold
    * test is pure integer arithmetic (10·m ≥ 3·H ⟺ m/H ≥ 0.3), so both
    * engines decide flips identically — no float comparison sits on the
    * decision boundary. */
  def signatureBudgetSweep(spark: SparkSession, dir: String): DataFrame = {
    val mh = minhashComponents(spark, dir)
    val pairs = minhashDupPairs(spark, dir)
    val counters = SweepBudgets.map(h =>
      sum(when(col("j") < h && col("ma") === col("mb"), 1L).otherwise(0L))
        .as(s"m$h"))
    val per = pairs.select("doc_a", "doc_b")
      .join(mh.select(col("doc_id").as("doc_a"), col("j"), col("m").as("ma")), "doc_a")
      .join(mh.select(col("doc_id").as("doc_b"), col("j"), col("m").as("mb")),
        Seq("doc_b", "j"))
      .groupBy("doc_a", "doc_b")
      .agg(counters.head, counters.tail: _*)
    val long = pairs.join(per, Seq("doc_a", "doc_b"))
      .select(col("jaccard"), explode(array(SweepBudgets.map(h =>
        struct(lit(h).as("n_hashes"), col(s"m$h").as("matches"))): _*)).as("x"))
      .select(col("x.n_hashes").as("n_hashes"), col("x.matches").as("matches"),
        col("jaccard"))
    long
      .withColumn("flip",
        (col("matches") * 10L >= col("n_hashes") * 3L) =!=
          (col("jaccard") >= JaccardThreshold))
      .groupBy("n_hashes")
      .agg(
        count(lit(1)).as("n_pairs"),
        r6(dsum(abs(col("matches").cast("double") / col("n_hashes") -
          col("jaccard"))) / count(lit(1))).as("mean_abs_err"),
        sum(when(col("flip"), 1L).otherwise(0L)).as("n_flips"),
        r6(sum(when(col("flip"), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("flip_rate"))
      .orderBy("n_hashes")
  }

  val signatureBudgetSweepSql: String =
    s"""WITH $shinglesCte,
       |$minhashCtes,
       |$lshPairsCte,
       |$jaccardCtes,
       |mm AS (SELECT p.doc_a, p.doc_b,
       |         sum(CASE WHEN x.j < 4 AND x.m = y.m THEN 1 ELSE 0 END) AS m4,
       |         sum(CASE WHEN x.j < 8 AND x.m = y.m THEN 1 ELSE 0 END) AS m8,
       |         sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) AS m16
       |       FROM pairs p
       |       JOIN mh x ON x.doc_id = p.doc_a
       |       JOIN mh y ON y.doc_id = p.doc_b AND y.j = x.j
       |       GROUP BY p.doc_a, p.doc_b),
       |lg AS (SELECT hh.n_hashes,
       |         CASE hh.n_hashes WHEN 4 THEN m4 WHEN 8 THEN m8 ELSE m16 END AS matches,
       |         jaccard
       |       FROM jac JOIN mm USING (doc_a, doc_b),
       |            (SELECT unnest([4, 8, 16]) AS n_hashes) hh),
       |fl AS (SELECT n_hashes, matches, jaccard,
       |         CASE WHEN (matches * 10 >= n_hashes * 3) <>
       |                   (jaccard >= $JaccardThreshold) THEN 1 ELSE 0 END AS flip
       |       FROM lg)
       |SELECT CAST(n_hashes AS BIGINT) AS n_hashes,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  floor((CAST(sum(CAST(abs(matches::DOUBLE / n_hashes - jaccard) AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_abs_err,
       |  CAST(sum(flip) AS BIGINT) AS n_flips,
       |  floor((CAST(sum(flip) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS flip_rate
       |FROM fl GROUP BY n_hashes ORDER BY n_hashes""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_minhash_calibration" -> (minhashCalibration _),
    "q143_bench_contamination" -> (benchContamination _),
    "q145_cluster_size_spectrum" -> (clusterSizeSpectrum _),
    "q149_threshold_sensitivity" -> (thresholdSensitivity _),
    "q150_split_balance" -> (splitBalance _),
    "q157_curation_funnel" -> (curationFunnel _),
    "q141_signature_budget_sweep" -> (signatureBudgetSweep _),
    "q106_fuzzy_join" -> (fuzzyJoin _),
    "q84_repeated_spans" -> (repeatedSpans _),
    "q85_incremental_dedup" -> (incrementalDedup _),
    "q88_source_overlap" -> (sourceOverlap _),
    "q48_simhash_neardups" -> (simhashNearDups _),
    "q49_dup_clusters" -> (dupClusters _),
    "q159_dup_clusters_fixpoint" -> (dupClustersFixpoint _),
    "q166_propagation_convergence" -> (propagationConvergence _),
    "q172_shingle_df_spectrum" -> (shingleDfSpectrum _),
    "q177_dup_length_deciles" -> (dupLengthDeciles _),
    "q75_dedup_keep_best" -> (dedupKeepBest _),
    "q76_leakage_safe_splits" -> (leakageSafeSplits _),
    "q82_curation_pipeline" -> (curationPipeline _),
    "q83_verbatim_decontam" -> (verbatimDecontamination _),
    "q107_verbatim_multi_n" -> (verbatimMultiN _),
    "q113_release_pipeline" -> (releasePipeline _),
    "q40_exact_dup_groups" -> (exactDupGroups _),
    "q41_minhash_bands" -> (minhashBands _),
    "q42_minhash_dup_pairs" -> (minhashDupPairs _),
    "q43_jaccard_pairs" -> (jaccardPairs _),
    "q44_embedding_neardups" -> (embeddingNearDups _),
    "q45_decontamination" -> (decontamination _))

  val oracles: Map[String, String] = Map(
    "q138_minhash_calibration" -> minhashCalibrationSql,
    "q141_signature_budget_sweep" -> signatureBudgetSweepSql,
    "q143_bench_contamination" -> benchContaminationSql,
    "q145_cluster_size_spectrum" -> clusterSizeSpectrumSql,
    "q149_threshold_sensitivity" -> thresholdSensitivitySql,
    "q150_split_balance" -> splitBalanceSql,
    "q157_curation_funnel" -> curationFunnelSql,
    "q106_fuzzy_join" -> fuzzyJoinSql,
    "q84_repeated_spans" -> repeatedSpansSql,
    "q85_incremental_dedup" -> incrementalDedupSql,
    "q88_source_overlap" -> sourceOverlapSql,
    "q48_simhash_neardups" -> simhashNearDupsSql,
    "q49_dup_clusters" -> dupClustersSql,
    "q159_dup_clusters_fixpoint" -> dupClustersFixpointSql,
    "q166_propagation_convergence" -> propagationConvergenceSql,
    "q172_shingle_df_spectrum" -> shingleDfSpectrumSql,
    "q177_dup_length_deciles" -> dupLengthDecilesSql,
    "q75_dedup_keep_best" -> dedupKeepBestSql,
    "q76_leakage_safe_splits" -> leakageSafeSplitsSql,
    "q82_curation_pipeline" -> curationPipelineSql,
    "q83_verbatim_decontam" -> verbatimDecontaminationSql,
    "q107_verbatim_multi_n" -> verbatimMultiNSql,
    "q113_release_pipeline" -> releasePipelineSql,
    "q40_exact_dup_groups" -> exactDupGroupsSql,
    "q41_minhash_bands" -> minhashBandsSql,
    "q42_minhash_dup_pairs" -> minhashDupPairsSql,
    "q43_jaccard_pairs" -> jaccardPairsSql,
    "q44_embedding_neardups" -> embeddingNearDupsSql,
    "q45_decontamination" -> decontaminationSql)
}
