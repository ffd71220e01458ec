package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  // -------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_media_meta" -> (mediaMeta _),
    "q71_media_features" -> (mediaFeatures _),
    "q72_frame_sample" -> (frameSample _))

  val oracles: Map[String, String] = Map(
    "q70_media_meta" -> mediaMetaSql,
    "q71_media_features" -> mediaFeaturesSql,
    "q72_frame_sample" -> frameSampleSql)
}
