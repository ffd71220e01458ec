package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque BINARY columns
  * next to typed metadata; decode/feature-extraction runs batched per
  * partition. The actual codecs (image/audio libs) are NOT in this
  * environment, so the decoder is a clearly-marked deterministic STUB —
  * the Spark-side contract (schema, binary batching, partition-local
  * decode, feature schema) is real and tested.
  *
  * At scale the payload column lives in its own parquet column chunk:
  * metadata-only queries never read the bytes (column pruning), and decode
  * fans out per-partition with no shuffle.
  */
object MultimodalOps {

  /** A media row: payload bytes + metadata. Here payloads are synthesized
    * from document text (the container has no real media files). */
  final case class MediaRecord(
      doc_id: Long, payload: Array[Byte], mime: String, width: Int, height: Int)

  /** Extracted features: everything derivable without a real codec. */
  final case class MediaFeatures(
      doc_id: Long, byte_len: Long, checksum: Long, avg_byte: Double,
      mime: String, pixels: Long)

  /** STUB DECODER — stands in for an image/audio decode. Deterministic,
    * pure function of the bytes; replace with a real codec binding in a
    * production build. */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = r.doc_id,
      byte_len = r.payload.length.toLong,
      checksum = sum % 65521, // Adler-style modulus
      avg_byte = if (r.payload.length == 0) 0.0
        else sum.toDouble / r.payload.length,
      mime = r.mime,
      pixels = r.width.toLong * r.height.toLong)
  }

  /** documents → media table with a BINARY payload column (utf-8 bytes of
    * the text standing in for encoded media) + stub metadata. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        lit("application/x-graft-text").as("mime"),
        (pmod(col("n_chars"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(32)) + 1).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** Batched partition-local decode: the mapPartitions boundary is where a
    * real pipeline would amortize codec/session init per batch. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(stubDecode) }
  }

  // ---- q70: metadata-only query (payload column pruned) -------------------

  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        octet_length(encode(col("text"), "utf-8")).cast("long").as("byte_len"),
        md5(encode(col("text"), "utf-8")).as("content_md5"),
        substring(col("text"), 1, 8).as("header"))
      .orderBy("doc_id")

  val mediaMetaSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |  md5(text) AS content_md5, substring(text, 1, 8) AS header
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- q71: full decode via mapPartitions ---------------------------------

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("byte_len"), col("checksum"),
        r6(col("avg_byte")).as("avg_byte"), col("mime"), col("pixels"))
      .orderBy("doc_id")

  /** DuckDB twin of the stub decode (VERDICT r2 #4). Every emitted column
    * is codec-independent: byte_len/checksum/avg_byte are pure byte
    * arithmetic over the utf-8 payload and mime/pixels are metadata
    * formulas. The byte sum is expressed as an ascii() code-point sum,
    * which equals the byte sum because the corpus is pure ASCII at every
    * scale factor (octet_length(encode(text)) == length(text) — verified);
    * a non-ASCII corpus would need a real utf-8 byte expansion here. */
  val mediaFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id, n_chars, text,
      |    CASE WHEN length(text) = 0 THEN 0
      |         ELSE list_sum([ascii(substring(text, i, 1))
      |                        FOR i IN range(1, length(text) + 1)]) END AS bsum
      |  FROM documents)
      |SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |  CAST(bsum % 65521 AS BIGINT) AS checksum,
      |  CASE WHEN length(text) = 0 THEN 0.0
      |       ELSE floor((bsum::DOUBLE / octet_length(encode(text))) * 1000000 + 0.5) / 1000000
      |  END AS avg_byte,
      |  'application/x-graft-text' AS mime,
      |  CAST((n_chars % 64 + 1) * (doc_id % 32 + 1) AS BIGINT) AS pixels
      |FROM b ORDER BY doc_id""".stripMargin

  // ---- q72: strided frame sampling ----------------------------------------

  val FrameStride = 50

  /** Frame-sampling plumbing: take every FrameStride-th byte offset of the
    * payload as a "frame" anchor and emit (frame_idx, offset, byte value) —
    * the video-frame / audio-window sampling shape. Offsets explode from
    * `sequence(1, len, stride)` (whole-stage codegen, no UDF), and at scale
    * the explode is embarrassingly parallel: no shuffle at all until a
    * downstream aggregate. The byte value reads as ascii() of the char at
    * the offset, which equals the payload byte because the corpus is pure
    * ASCII (same invariant q71 relies on, verified there). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")), lit(FrameStride))).as("pos"))
      .select(col("doc_id"),
        expr(s"CAST((pos - 1) DIV $FrameStride AS LONG)").as("frame_idx"),
        col("pos").cast("long").as("frame_offset"),
        ascii(expr("substr(text, pos, 1)")).cast("long").as("byte_val"))
      .orderBy("doc_id", "frame_idx")

  // `pos`/`frame_offset`, not `offset`: OFFSET is a reserved word in DuckDB.
  val frameSampleSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, unnest(range(1, length(text) + 1, $FrameStride)) AS pos, text
       |  FROM documents WHERE length(text) > 0)
       |SELECT doc_id, CAST((pos - 1) // $FrameStride AS BIGINT) AS frame_idx,
       |  CAST(pos AS BIGINT) AS frame_offset,
       |  CAST(ascii(substring(text, pos, 1)) AS BIGINT) AS byte_val
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ---- q80/q81: perceptual-hash (dHash) image dedup -----------------------

  /** dHash bits: a 61-point nearest-neighbor downsample of the payload
    * yields 60 adjacent-pair gradient bits — 60 rather than the classic
    * 64 so the fingerprint shares q48's proven 4×15-bit Hamming-LSH band
    * geometry AND never touches a BIGINT's sign bit (engine-portable
    * shifts). */
  val DhashBits = 60
  /** Same verification threshold as the text SimHash tier (q48). */
  val DhashHammingThreshold = 12

  /** q80: perceptual hash over the media payload — the 1-D stand-in for
    * image dHash (difference hash): "resize" the payload to DhashBits + 1
    * segments by AREA AVERAGING (char p lands in segment
    * ⌊(p−1)·61/len⌋ — the same integral-image downsample a real dHash
    * uses, not point sampling, so a small insertion shifts every mean a
    * little instead of every sample arbitrarily), then
    * bit i = [mean(seg i) < mean(seg i+1)] (the gradient step). Near-dup
    * variants of the same content land at small Hamming distance — the
    * raw md5 of q70 can never do that (measured on the corpus: the q42
    * token-level near-dups sit ≤ 12 bits apart; point-sampling left them
    * ≥ 13 bits and found nothing below sf0.1).
    *
    * The mean comparison is pure-INTEGER cross-multiplication
    * (s_i·c_{i+1} < s_{i+1}·c_i — exact, no doubles anywhere near a bit
    * decision; |s| < 2⁸·len, c < len/60, so the product is < 2⁵⁸ even at
    * the 2³¹ max document length). Byte values read as ascii() of the
    * char (the pure-ASCII invariant q71 verifies).
    *
    * Scale shape: the char explode is the q56 entropy shape — one
    * partial-agg shuffle carrying a (doc, segment) sum/count pair, i.e.
    * ≤ 61 rows per doc; the adjacent-segment join keys on doc_id against
    * ≤ 61-row groups; one more partial `sum` of distinct powers of two
    * reassembles the fingerprint.
    *
    * Payloads SHORTER THAN THE RESIZE GRID (len ≤ DhashBits) are
    * excluded, exactly as a real dHash cannot fingerprint an image
    * smaller than its resize target: a sub-grid payload leaves segments
    * empty, its missing gradient bits default to 0, and every short
    * payload would collapse toward dhash = 0 — flagging arbitrary short
    * docs as mutual hamming-0 "duplicates" and putting O(m²) false pairs
    * through the q81 band join. Short payloads stay covered by the exact
    * tier (q40's md5). */
  // The fingerprint frame memoizes per (appId, dir) like simhashFrame:
  // q80 emits it and q81's band SELF-join consumes it twice — without the
  // cache the full char explode + segment aggregation runs once per join
  // side per pass.
  private val dhashCache = Memo.frame()

  private def dhashFrame(spark: SparkSession, dir: String): DataFrame =
    dhashCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      val base = spark.read.parquet(s"$dir/documents.parquet")
        .filter(length(col("text")) > DhashBits)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      val segs = base
        .select(col("doc_id"), col("text"), col("len"),
          explode(sequence(lit(1), col("len"))).as("p"))
        .select(col("doc_id"),
          expr(s"CAST((CAST(p AS BIGINT) - 1) * ${DhashBits + 1} DIV len AS INT)").as("seg"),
          ascii(expr("substr(text, p, 1)")).cast("long").as("bv"))
        .groupBy("doc_id", "seg")
        .agg(sum("bv").as("s"), count(lit(1)).as("c"))
      val bits = segs.as("x").join(segs.as("y"),
          col("x.doc_id") === col("y.doc_id") && col("y.seg") === col("x.seg") + 1)
        .select(col("x.doc_id").as("doc_id"),
          when(col("x.s") * col("y.c") < col("y.s") * col("x.c"),
            expr("shiftleft(CAST(1 AS BIGINT), x.seg)")).otherwise(lit(0L)).as("contrib"))
        .groupBy("doc_id")
        .agg(sum("contrib").as("dhash"))
      base.select("doc_id").join(bits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("dhash"), lit(0L)).as("dhash"))
        .cache()
    })

  def imageDhash(spark: SparkSession, dir: String): DataFrame =
    dhashFrame(spark, dir).orderBy("doc_id")

  /** Shared q80/q81 oracle CTE ending in dh(doc_id, dhash). */
  private val dhashCte: String =
    s"""dch AS (SELECT doc_id, CAST((i - 1) * ${DhashBits + 1} // length(text) AS INT) AS seg,
       |          ascii(substring(text, i, 1)) AS bv
       |        FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
       |              FROM documents WHERE length(text) > $DhashBits)),
       |dsg AS (SELECT doc_id, seg, CAST(sum(bv) AS BIGINT) AS s, count(*) AS c
       |        FROM dch GROUP BY 1, 2),
       |dbits AS (SELECT x.doc_id,
       |            CASE WHEN x.s * y.c < y.s * x.c
       |                 THEN CAST(1 AS BIGINT) << x.seg ELSE 0 END AS contrib
       |          FROM dsg x JOIN dsg y ON x.doc_id = y.doc_id AND y.seg = x.seg + 1),
       |dagg AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS dhash
       |         FROM dbits GROUP BY doc_id),
       |dh AS (SELECT d.doc_id, coalesce(dagg.dhash, 0) AS dhash
       |       FROM (SELECT doc_id FROM documents WHERE length(text) > $DhashBits) d
       |       LEFT JOIN dagg ON d.doc_id = dagg.doc_id)""".stripMargin

  val imageDhashSql: String =
    s"""WITH $dhashCte
       |SELECT doc_id, dhash FROM dh ORDER BY doc_id""".stripMargin

  /** q81: image near-dup pairs — the dHash fingerprints fed through the
    * SAME Hamming-LSH machinery as the text tier
    * (DedupOps.hammingBandPairs: 4×15-bit band join, popcount verify), so
    * the dedup story covers both modalities with one candidate-generation
    * shape. A real deployment swaps imageDhash's byte sampler for a
    * decoded-pixel dHash (MultimodalOps.stubDecode's codec boundary);
    * everything downstream — banding, verification, clustering — is
    * unchanged. */
  def imageNearDups(spark: SparkSession, dir: String): DataFrame =
    DedupOps.hammingBandPairs(dhashFrame(spark, dir), "dhash")
      .filter(col("hamming") <= DhashHammingThreshold)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")

  val imageNearDupsSql: String =
    s"""WITH $dhashCte,
       |dbands AS (SELECT doc_id, dhash, b,
       |             (dhash >> (${DedupOps.SimhashBandBits} * b)) & ${(1 << DedupOps.SimhashBandBits) - 1} AS band_val
       |           FROM dh, (SELECT unnest(range(0, ${DedupOps.SimhashNumBands})) AS b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           a.dhash AS h_a, b.dhash AS h_b
       |         FROM dbands a JOIN dbands b
       |           ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(h_a, h_b)) <= $DhashHammingThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- q114: image keep-best (resolution policy over perceptual dups) ----

  /** q114: the image twin of q75's keep-best policy — among perceptually
    * near-duplicate images (the q81 pair graph), an image is kept iff NO
    * neighbor within the Hamming threshold is strictly better by
    * (pixels DESC, doc_id ASC); the report carries its best better
    * neighbor. A local-argmax policy over pair EDGES rather than a
    * transitive-closure cluster pass: perceptual similarity is not
    * transitive (A≈B≈C does not make A≈C at the same threshold), so
    * chaining clusters would discard images no retained image actually
    * resembles — the per-edge tournament is the defensible semantics,
    * and it needs only one aggregate over the (already banded,
    * df-bounded) pair frame — no iterative propagation. Pixels come from
    * the media metadata (the stub formula; a real deployment reads the
    * decoded width×height — the policy and plan are unchanged).
    *
    * Scale shape: q81's band join (never all-pairs) + two broadcast-able
    * metadata joins + one per-image argmax aggregate with map-side
    * combine. */
  def imageKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val px = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) > DhashBits)
      .select(col("doc_id"),
        ((pmod(col("n_chars"), lit(64)) + 1) * (pmod(col("doc_id"), lit(32)) + 1))
          .cast("long").as("pixels"))
    val p0 = DedupOps.hammingBandPairs(dhashFrame(spark, dir), "dhash")
      .filter(col("hamming") <= DhashHammingThreshold)
      .select("doc_a", "doc_b")
    val undirected = p0.unionByName(
      p0.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val beaten = undirected
      .join(px.select(col("doc_id").as("doc_a"), col("pixels").as("px_a")), "doc_a")
      .join(px.select(col("doc_id").as("doc_b"), col("pixels").as("px_b")), "doc_b")
      .filter(col("px_b") > col("px_a") ||
        (col("px_b") === col("px_a") && col("doc_b") < col("doc_a")))
      .groupBy(col("doc_a").as("doc_id"))
      .agg(max(struct(col("px_b").as("px"), (-col("doc_b")).as("nid"))).as("best"))
      .select(col("doc_id"), (-col("best.nid")).cast("long").as("bn"))
    px.join(beaten, Seq("doc_id"), "left")
      .select(col("doc_id"), col("pixels"),
        col("bn").isNull.as("kept"),
        coalesce(col("bn"), lit(-1L)).as("better_neighbor"))
      .orderBy("doc_id")
  }

  val imageKeepBestSql: String =
    s"""WITH $dhashCte,
       |kbx AS (SELECT doc_id, CAST((n_chars % 64 + 1) * (doc_id % 32 + 1) AS BIGINT) AS pixels
       |        FROM documents WHERE length(text) > $DhashBits),
       |kbands AS (SELECT doc_id, dhash, b,
       |             (dhash >> (${DedupOps.SimhashBandBits} * b)) & ${(1 << DedupOps.SimhashBandBits) - 1} AS band_val
       |           FROM dh, (SELECT unnest(range(0, ${DedupOps.SimhashNumBands})) AS b)),
       |kcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |            a.dhash AS h_a, b.dhash AS h_b
       |          FROM kbands a JOIN kbands b
       |            ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
       |kpair AS (SELECT doc_a, doc_b FROM kcand
       |          WHERE bit_count(xor(h_a, h_b)) <= $DhashHammingThreshold),
       |kund AS (SELECT doc_a, doc_b FROM kpair
       |         UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM kpair),
       |kbeat AS (SELECT doc_a AS doc_id, doc_b AS bn FROM (
       |            SELECT u.doc_a, u.doc_b,
       |              row_number() OVER (PARTITION BY u.doc_a
       |                ORDER BY pb.pixels DESC, u.doc_b ASC) AS rn
       |            FROM kund u
       |            JOIN kbx pa ON u.doc_a = pa.doc_id
       |            JOIN kbx pb ON u.doc_b = pb.doc_id
       |            WHERE pb.pixels > pa.pixels
       |               OR (pb.pixels = pa.pixels AND u.doc_b < u.doc_a))
       |          WHERE rn = 1)
       |SELECT kbx.doc_id, pixels, bn IS NULL AS kept,
       |  coalesce(bn, -1) AS better_neighbor
       |FROM kbx LEFT JOIN kbeat ON kbx.doc_id = kbeat.doc_id
       |ORDER BY kbx.doc_id""".stripMargin

  // -------------------------------------------------------------------------

  // ---- q135: strided audio-frame energy (windowed feature extraction) -----

  /** Frame length / hop (bytes) for q135's 50%-overlap framing. */
  val FrameLen = 16
  val FrameHop = 8

  /** RMS "activity" threshold — between the space-heavy (~90) and
    * letter-dense (~105+) frame regimes of ASCII text, so both verdicts
    * occur on the stand-in payload. */
  val ActiveRms = 100.0

  /** q135: the audio-modality shape the image tier (q80) doesn't cover —
    * WINDOWED per-frame feature extraction over an opaque byte payload:
    * 16-byte frames at 8-byte hop (50% overlap, the spectrogram
    * framing), per-frame RMS energy, per-document frame stats + an
    * active-frame count (the voice-activity-detection primitive). The
    * payload is the documents table's utf-8 bytes standing in for PCM
    * samples (same stub contract as q71): byte k of the payload is
    * ascii(char k) on this ASCII corpus, so the whole framing unrolls
    * into exact integer scalar expressions — ord/ascii agree across
    * engines, the sum of 16 squares is exact, and sqrt of identical
    * integers is identical IEEE doubles.
    *
    * Scale shape: frame explosion is explode(sequence) + 16 unrolled
    * scalar terms (whole-stage codegen, the q34 blockwise idiom — no
    * per-byte HOF), carrying (doc_id, frame ss) longs into one map-side
    * combined groupBy; per-frame RMS doubles are bit-identical
    * cross-engine so the DECIMAL mean is order-free. */
  /** Shared (doc_id, j, rms) frame stream behind q135 and q152. */
  private def frameRms(spark: SparkSession, dir: String): DataFrame = {
    val len = length(col("text"))
    val nFrames = when(len >= FrameLen,
      floor((len - FrameLen).cast("double") / FrameHop).cast("long") + 1L)
      .otherwise(0L)
    val framed = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), nFrames.as("nf"))
      .filter(col("nf") > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("nf") - 1L)).as("j"))
    val ss = (0 until FrameLen).map { k =>
      val a = ascii(col("text").substr(col("j") * FrameHop + 1 + k, lit(1)))
      (a * a).cast("long")
    }.reduce(_ + _)
    val rms = sqrt(ss.cast("double") / FrameLen)
    framed.select(col("doc_id"), col("j"), rms.as("rms"))
  }

  def audioFrameEnergy(spark: SparkSession, dir: String): DataFrame =
    frameRms(spark, dir)
      .select(col("doc_id"), col("rms"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        r6(dsum(col("rms")) / count(lit(1))).as("mean_rms"),
        r6(max(col("rms"))).as("max_rms"),
        sum(when(col("rms") > ActiveRms, 1L).otherwise(0L)).as("n_active"))
      .orderBy("doc_id")

  /** Shared q135/q152 oracle block ending in afr(doc_id, j, rms). */
  private val frameRmsCtes: String = {
    val ssTerms = (0 until FrameLen)
      .map(k => s"ord(substring(text, CAST(j * $FrameHop + ${1 + k} AS INTEGER), 1)) ^ 2")
      .mkString(" + ")
    s"""af AS (SELECT doc_id, text,
       |         CAST(floor((length(text) - $FrameLen)::DOUBLE / $FrameHop) AS BIGINT) + 1 AS nf
       |       FROM documents WHERE length(text) >= $FrameLen),
       |afr AS (SELECT doc_id, j, sqrt(CAST($ssTerms AS DOUBLE) / $FrameLen) AS rms
       |        FROM (SELECT doc_id, text, unnest(range(0, nf)) AS j FROM af))""".stripMargin
  }

  val audioFrameEnergySql: String =
    s"""WITH $frameRmsCtes
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_frames,
       |  floor((CAST(sum(CAST(rms AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_rms,
       |  floor((max(rms)) * 1000000 + 0.5) / 1000000 AS max_rms,
       |  CAST(sum(CASE WHEN rms > $ActiveRms THEN 1 ELSE 0 END) AS BIGINT) AS n_active
       |FROM afr GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- q152: activity segments (VAD runs over the frame stream) -----------

  /** q152: the voice-activity-detector OUTPUT shape — maximal runs of
    * consecutive active frames (rms > ActiveRms) per document, found
    * with the gaps-and-islands idiom (j − row_number over active
    * frames is constant exactly within a run): per doc the segment
    * count, longest segment, total active frames, and active fraction.
    * q135 counts active frames; this is what a pipeline actually cuts
    * on — segment boundaries — and the run structure (many short
    * bursts vs few long stretches) is what distinguishes speech-like
    * payloads from noise at the same activity rate.
    *
    * Scale shape: one doc_id-partitioned window over the ACTIVE subset
    * of the frame stream (strictly smaller than q135's aggregate
    * input), then two doc-keyed aggregates; zero-activity docs rejoin
    * via the population frame with zeros so the report covers every
    * framed document. */
  def audioActivitySegments(spark: SparkSession, dir: String): DataFrame = {
    val fr = frameRms(spark, dir)
    val w = Window.partitionBy("doc_id").orderBy("j")
    val segs = fr.filter(col("rms") > ActiveRms)
      .withColumn("grp", col("j") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("seg_frames"))
    val per = segs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        max(col("seg_frames")).as("max_seg_frames"),
        sum(col("seg_frames")).as("n_active"))
    fr.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_seg_frames"), lit(0L)).as("max_seg_frames"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        r6(coalesce(col("n_active"), lit(0L)).cast("double") / col("n_frames"))
          .as("active_frac"))
      .orderBy("doc_id")
  }

  val audioActivitySegmentsSql: String =
    s"""WITH $frameRmsCtes,
       |vact AS (SELECT doc_id, j,
       |           j - row_number() OVER (PARTITION BY doc_id ORDER BY j) AS grp
       |         FROM afr WHERE rms > $ActiveRms),
       |vseg AS (SELECT doc_id, grp, count(*) AS seg_frames
       |         FROM vact GROUP BY 1, 2),
       |vper AS (SELECT doc_id, count(*) AS n_segments,
       |           max(seg_frames) AS max_seg_frames, sum(seg_frames) AS n_active
       |         FROM vseg GROUP BY 1),
       |vpop AS (SELECT doc_id, count(*) AS n_frames FROM afr GROUP BY 1)
       |SELECT vpop.doc_id, CAST(n_frames AS BIGINT) AS n_frames,
       |  CAST(coalesce(n_segments, 0) AS BIGINT) AS n_segments,
       |  CAST(coalesce(max_seg_frames, 0) AS BIGINT) AS max_seg_frames,
       |  CAST(coalesce(n_active, 0) AS BIGINT) AS n_active,
       |  floor((coalesce(n_active, 0)::DOUBLE / n_frames) * 1000000 + 0.5) / 1000000 AS active_frac
       |FROM vpop LEFT JOIN vper ON vpop.doc_id = vper.doc_id
       |ORDER BY vpop.doc_id""".stripMargin

  // ---- q198/q199: fingerprint health audits (the q195/q196 twins) --------

  /** q198: per-bit set fraction of the dHash fingerprints — the image
    * twin of q195's sign-bit balance: a perceptual-hash bit is
    * discriminative only when it splits the corpus near 50/50, and a
    * bit stuck at 0/1 (e.g. a downsample position that never varies)
    * silently shrinks every Hamming threshold's effective resolution.
    * dHash's difference construction should self-balance; this audit
    * MEASURES it over the corpus actually ingested. One pass over the
    * memoized 8-byte fingerprints exploded to 64 bit rows, map-side
    * conditional count — at 100 TB this is free next to the band join
    * it guards. (The arithmetic `>>` on the possibly-negative BIGINT
    * fingerprint is the same both engines already rely on for the q81
    * band keys.) */
  def dhashBitBalance(spark: SparkSession, dir: String): DataFrame = {
    val dh = dhashFrame(spark, dir)
    val n = dh.agg(count(lit(1)).as("ntot"))
    dh.select(explode(sequence(lit(0), lit(DhashBits - 1))).as("bit"), col("dhash"))
      .select(col("bit"), expr("shiftright(dhash, CAST(bit AS INT)) & 1").as("bset"))
      .groupBy("bit").agg(sum(col("bset")).as("n_set"))
      .crossJoin(broadcast(n))
      .select(col("bit").cast("long").as("bit"), col("n_set"),
        r6(col("n_set").cast("double") / col("ntot")).as("set_frac"),
        r6(abs(col("n_set").cast("double") / col("ntot") - lit(0.5))).as("bias"))
      .orderBy("bit")
  }

  val dhashBitBalanceSql: String =
    s"""WITH $dhashCte,
       |hbn AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM dh),
       |hbb AS (SELECT b AS bit, CAST(sum((dhash >> CAST(b AS INT)) & 1) AS BIGINT) AS n_set
       |        FROM dh, (SELECT unnest(range(0, $DhashBits)) AS b)
       |        GROUP BY b)
       |SELECT CAST(bit AS BIGINT) AS bit, n_set,
       |  floor((n_set::DOUBLE / ntot) * 1000000 + 0.5) / 1000000 AS set_frac,
       |  floor(abs(n_set::DOUBLE / ntot - 0.5) * 1000000 + 0.5) / 1000000 AS bias
       |FROM hbb, hbn ORDER BY bit""".stripMargin

  /** q199: dHash Hamming separation — mean Hamming distance within the
    * q81 verified near-dup pairs vs the ALL-PAIRS corpus background, and
    * the gap. The background needs no pair enumeration: over n
    * fingerprints, Σ_pairs popcount(h_a ^ h_b) = Σ_bits n_set·(n −
    * n_set) exactly (each bit contributes one disagreement per
    * set/unset pair), so the O(n²) quantity folds to the q198 bit
    * counts — integer-exact, one corpus pass, the identity that makes
    * this audit runnable at 100 TB where a sampled background would
    * carry noise. A healthy perceptual hash shows dup pairs far below
    * the background mean; separation collapsing toward 0 means the
    * threshold is admitting noise (the image twin of q196). */
  def dhashSeparation(spark: SparkSession, dir: String): DataFrame = {
    val dh = dhashFrame(spark, dir)
    val bits = dh
      .select(explode(sequence(lit(0), lit(DhashBits - 1))).as("bit"), col("dhash"))
      .select(col("bit"), expr("shiftright(dhash, CAST(bit AS INT)) & 1").as("bset"))
      .groupBy("bit").agg(sum(col("bset")).as("ns"))
    val n = dh.agg(count(lit(1)).as("ntot"))
    // 128-bit-exact per-term products: ns*(ntot-ns) wraps 64-bit ints
    // silently past ~1e9 images under non-ANSI Spark; decimal(38,0)
    // keeps the closed-form background integer-exact at 100 TB scale.
    val bg = bits.crossJoin(broadcast(n))
      .agg(sum(col("ns").cast("decimal(38,0)") *
          (col("ntot") - col("ns")).cast("decimal(38,0)")).as("bgnum"),
        max(col("ntot")).as("ntot"))
    val dup = DedupOps.hammingBandPairs(dhashFrame(spark, dir), "dhash")
      .filter(col("hamming") <= DhashHammingThreshold)
      .agg(count(lit(1)).as("n_dup_pairs"), sum(col("hamming")).as("dupsum"))
    dup.crossJoin(broadcast(bg))
      .select(col("ntot").as("n_images"), col("n_dup_pairs"),
        when(col("n_dup_pairs") === 0, 0.0)
          .otherwise(r6(col("dupsum").cast("double") / col("n_dup_pairs")))
          .as("mean_ham_dups"),
        r6(col("bgnum").cast("double") * 2 /
          (col("ntot").cast("double") * (col("ntot").cast("double") - 1)))
          .as("mean_ham_background"),
        r6(col("bgnum").cast("double") * 2 /
          (col("ntot").cast("double") * (col("ntot").cast("double") - 1)) -
          when(col("n_dup_pairs") === 0, 0.0)
            .otherwise(col("dupsum").cast("double") / col("n_dup_pairs")))
          .as("separation"))
  }

  val dhashSeparationSql: String =
    s"""WITH $dhashCte,
       |hsn AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM dh),
       |hsb AS (SELECT b AS bit, CAST(sum((dhash >> CAST(b AS INT)) & 1) AS BIGINT) AS ns
       |        FROM dh, (SELECT unnest(range(0, $DhashBits)) AS b)
       |        GROUP BY b),
       |hsg AS (SELECT sum(CAST(ns AS HUGEINT) * CAST(ntot - ns AS HUGEINT)) AS bgnum,
       |          max(ntot) AS ntot
       |        FROM hsb, hsn),
       |hdb AS (SELECT doc_id, dhash, b,
       |          (dhash >> (${DedupOps.SimhashBandBits} * b)) & ${(1 << DedupOps.SimhashBandBits) - 1} AS band_val
       |        FROM dh, (SELECT unnest(range(0, ${DedupOps.SimhashNumBands})) AS b)),
       |hcd AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |          a.dhash AS h_a, b.dhash AS h_b
       |        FROM hdb a JOIN hdb b
       |          ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
       |hdp AS (SELECT CAST(count(*) AS BIGINT) AS n_dup_pairs,
       |          CAST(coalesce(sum(CAST(bit_count(xor(h_a, h_b)) AS BIGINT)), 0) AS BIGINT) AS dupsum
       |        FROM hcd WHERE bit_count(xor(h_a, h_b)) <= $DhashHammingThreshold)
       |SELECT ntot AS n_images, n_dup_pairs,
       |  CASE WHEN n_dup_pairs = 0 THEN 0.0
       |       ELSE floor((dupsum::DOUBLE / n_dup_pairs) * 1000000 + 0.5) / 1000000 END AS mean_ham_dups,
       |  floor((bgnum::DOUBLE * 2 / (ntot::DOUBLE * (ntot::DOUBLE - 1))) * 1000000 + 0.5) / 1000000 AS mean_ham_background,
       |  floor((bgnum::DOUBLE * 2 / (ntot::DOUBLE * (ntot::DOUBLE - 1)) -
       |         CASE WHEN n_dup_pairs = 0 THEN 0.0 ELSE dupsum::DOUBLE / n_dup_pairs END) * 1000000 + 0.5) / 1000000 AS separation
       |FROM hdp, hsg""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_dhash_bit_balance" -> (dhashBitBalance _),
    "q199_dhash_separation" -> (dhashSeparation _),
    "q135_audio_frame_energy" -> (audioFrameEnergy _),
    "q152_activity_segments" -> (audioActivitySegments _),
    "q70_media_meta" -> (mediaMeta _),
    "q71_media_features" -> (mediaFeatures _),
    "q72_frame_sample" -> (frameSample _),
    "q80_image_dhash" -> (imageDhash _),
    "q81_image_neardups" -> (imageNearDups _),
    "q114_image_keep_best" -> (imageKeepBest _))

  val oracles: Map[String, String] = Map(
    "q198_dhash_bit_balance" -> dhashBitBalanceSql,
    "q199_dhash_separation" -> dhashSeparationSql,
    "q135_audio_frame_energy" -> audioFrameEnergySql,
    "q152_activity_segments" -> audioActivitySegmentsSql,
    "q70_media_meta" -> mediaMetaSql,
    "q71_media_features" -> mediaFeaturesSql,
    "q72_frame_sample" -> frameSampleSql,
    "q80_image_dhash" -> imageDhashSql,
    "q81_image_neardups" -> imageNearDupsSql,
    "q114_image_keep_best" -> imageKeepBestSql)
}
