package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.{Memo, Memos, SimilarityOps}

/** Round-15 pins, part 1 — the ADVICE r14 hardening set: the packed-ADC
  * dense-table guard fails loudly, the int8 native expressions skip null
  * array slots (the retired sum()'s semantics) instead of reading unset
  * bytes, streaming annServe refuses a pre-r14 outDir at stream
  * definition, the cluster_sizes artifact's read-modify-write holds a
  * writer lock (single-maintenance-writer contract made loud), and the
  * frame-memo eviction race the tierCache Sync promotion closes.
  */
class Round15Spec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private lazy val idx: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_r15_idx").toString
    SimilarityOps.writeIndex(spark, sf, out)
    out
  }

  // ---- ADC dense-table guard (ADVICE r14 #2) -------------------------------

  private def adcFrame(tblSize: Int): DataFrame = {
    val codes = Seq.fill(SimilarityOps.PqM)(0L)
    val tbl = Seq.fill(tblSize)(BigDecimal(0.5))
    spark.range(1).select(
      typedlit(codes).as("pq_codes"),
      typedlit(tbl).cast("array<decimal(38,18)>").as("adc_tbl"))
  }

  test("adcDistLocal computes the fold on a dense table and raises " +
    "loudly on a non-dense one (never a silent misalign / null promote)") {
    val dense = adcFrame(SimilarityOps.PqM * SimilarityOps.PqK)
      .select(SimilarityOps.adcDistLocal.as("adist")).collect()(0)
    assert(dense.getDecimal(0).doubleValue() == SimilarityOps.PqM * 0.5)
    val e = intercept[Exception] {
      adcFrame(SimilarityOps.PqM * SimilarityOps.PqK - 1)
        .select(SimilarityOps.adcDistLocal.as("adist")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("non-dense ADC table")),
      s"expected the dense-table guard, got: $e")
  }

  // ---- int8 expressions skip null slots (ADVICE r14 #4) --------------------

  test("Int8Dot / Int8NormSq skip null array elements (the retired " +
    "long-form sum()'s null semantics), never reading unset slots") {
    val df = spark.range(1).select(
      typedlit(Seq[Option[Byte]](Some(1.toByte), None, Some(3.toByte)))
        .as("codes"),
      typedlit(Seq[Long](2L, 5L, 4L)).as("qcodes"),
      typedlit(Seq[Option[Long]](Some(2L), None, Some(4L))).as("qnull"))
    val r = df.select(
      graft.functions.Int8Codes.int8Dot(col("codes"), col("qcodes")).as("dot"),
      graft.functions.Int8Codes.int8Dot(
        typedlit(Seq[Byte](1, 2, 3)), col("qnull")).as("dotq"),
      graft.functions.Int8Codes.int8NormSq(col("codes")).as("nn")).collect()(0)
    assert(r.getAs[Long]("dot") == 1L * 2 + 3L * 4, "left-side null not skipped")
    assert(r.getAs[Long]("dotq") == 1L * 2 + 3L * 4, "right-side null not skipped")
    assert(r.getAs[Long]("nn") == 1L + 9L, "norm null not skipped")
  }

  // ---- streaming outDir schema fail-fast (ADVICE r14 #3) -------------------

  test("annServe fails fast at stream definition on a pre-r14 outDir " +
    "(native score column) and passes an absent or unified-schema dir") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val qdf = stream.toDF().toDF("query_id", "embedding")

    val legacy = java.nio.file.Files
      .createTempDirectory("graft_r15_legacy_out").toString
    Seq((0L, 1L, 1L, 0.9)).toDF("query_id", "vec_id", "rank", "cos")
      .coalesce(1).write.mode("overwrite").parquet(legacy)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingOps.annServe(qdf, idx, legacy)
    }
    assert(e.getMessage.contains("pre-r14 outDir"), e.getMessage)

    // Absent dir: passes (the common fresh-stream case).
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_r15_fresh_out").toString + "/sub"
    graft.streaming.StreamingOps.annServe(qdf, idx, fresh)
    // Unified-schema dir: resumable.
    Seq((0L, 1L, 1L, 0.9, "float"))
      .toDF("query_id", "vec_id", "rank", "score", "tier")
      .coalesce(1).write.mode("overwrite").parquet(fresh)
    graft.streaming.StreamingOps.annServe(qdf, idx, fresh)
  }

  // ---- cluster_sizes writer lock (VERDICT r14 #6 / ADVICE r14 #1) ----------

  private def artifactBase(out: String): Map[Long, Long] =
    spark.read.parquet(SimilarityOps.clusterSizesPath(out))
      .filter(col("ingest_batch") === -1L)
      .collect().map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("csz")).toMap

  test("two concurrent cluster_sizes bumps serialize on the writer lock " +
    "— both deltas land (no silent last-writer-wins drop)") {
    val out = java.nio.file.Files.createTempDirectory("graft_r15_lock").toString
    SimilarityOps.writeIndex(spark, sf, out)
    val before = artifactBase(out)
    val c0 = before.keys.min
    val c1 = before.keys.max
    assert(c0 != c1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(Map(c0 -> 5L), Map(c1 -> 7L)).map { d =>
      new Thread(() =>
        try SimilarityOps.bumpBaseClusterSizes(spark, out, d)
        catch { case t: Throwable => errs.add(t) })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"bump failed: ${errs.peek()}")
    val after = artifactBase(out)
    assert(after(c0) == before(c0) + 5L, "first maintainer's delta dropped")
    assert(after(c1) == before(c1) + 7L, "second maintainer's delta dropped")
    assert((after - c0 - c1) == (before - c0 - c1), "unrelated rows changed")
  }

  test("a held foreign lock fails maintenance LOUDLY after the timeout, " +
    "naming the single-maintenance-writer contract; a stale lock (crashed " +
    "holder) is broken and maintenance proceeds") {
    val out = java.nio.file.Files.createTempDirectory("graft_r15_lock2").toString
    SimilarityOps.writeIndex(spark, sf, out)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$out/.cluster_sizes.lock")
    fs.create(lock, false).close()
    spark.conf.set("spark.graft.clusterSizes.lockTimeoutSec", "1")
    try {
      val e = intercept[IllegalStateException] {
        SimilarityOps.refreshClusterSizes(spark, out)
      }
      assert(e.getMessage.contains("single-maintenance-writer"), e.getMessage)
      // Crashed holder: age the lock past lockStaleSec — the next
      // maintainer breaks it and proceeds (and releases it after).
      val old = System.currentTimeMillis() - 700 * 1000L
      fs.setTimes(lock, old, old)
      SimilarityOps.refreshClusterSizes(spark, out)
      assert(!fs.exists(lock), "broken/retaken lock must be released")
    } finally spark.conf.unset("spark.graft.clusterSizes.lockTimeoutSec")
  }

  // ---- frame-memo eviction race (the tierCache Sync promotion) ------------

  test("frame memo: Memos.release racing an in-flight Sync cold compute " +
    "unpersists the cached frame (the tierCache plain->Sync promotion)") {
    val dir = s"/tmp/graft_r15_memo_${System.nanoTime()}"
    val m = Memo.frame()
    val started = new java.util.concurrent.CountDownLatch(1)
    @volatile var frame: DataFrame = null
    val t = new Thread(() => {
      m.getOrElseUpdateSync(s"feats:app:$dir", {
        started.countDown()
        Thread.sleep(300) // eviction arrives mid-compute
        val df = spark.range(5).toDF("x").cache()
        df.count()
        frame = df
        df
      })
      ()
    })
    t.start()
    started.await()
    Memos.release(dir)
    t.join()
    assert(frame != null)
    assert(frame.storageLevel == StorageLevel.NONE,
      "the in-flight compute's cached frame escaped eviction (block leak)")
  }
}
