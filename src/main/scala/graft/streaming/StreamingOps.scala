package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for the stateful operators. */
final case class EventRow(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Evolving per-user state carried across micro-batches. */
final case class UserRunning(
    user_id: Long, n_events: Long, total_value: Double, n_errors: Long)

/** One observed (from → to) step in a user's event stream. */
final case class TransitionEdge(user_id: Long, from_type: String, to_type: String)

/** Per-user cursor for the transition stream: the last event seen, in the
  * same (ts, event_id) total order the batch twin sorts by. */
final case class LastSeen(ts_ms: Long, ts_nanos: Int, event_id: Long, event_type: String)

/** Structured Streaming twins of the batch events operators: the same
  * aggregations expressed over an unbounded stream with event-time
  * watermarks. A micro-batch over a bounded source produces exactly the
  * batch results (tested in StreamingSpec with a memory sink).
  *
  * Scale notes: state stores are keyed by (window, event_type) /
  * (user_id, session) — bounded by the watermark horizon, so state size is
  * O(active keys), not O(stream length); `session_window` merges per-key
  * intervals incrementally, which is the streaming dual of the batch
  * lag+cumsum formulation in EventsOps.userSessions.
  */
object StreamingOps {

  /** Tumbling 1-hour event-time windows per type, 2-hour watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.operators.r6(graft.operators.dsum(col("value"))).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming twin of the batch q59 cross-key interval join
    * (EventsOps.intervalJoin): every purchase matched to site-wide view
    * activity within ±IntervalS, expressed as a watermarked stream-stream
    * self-join with a two-sided event-time range predicate — the Flink
    * interval-join shape on Structured Streaming. One row per
    * (purchase, view) match; the per-purchase aggregate (the batch
    * output's shape) composes downstream of this frame.
    *
    * Scale/state notes: Structured Streaming refuses a stream-stream
    * join without an equality predicate, so the batch q59 bin-bucketing
    * trick is not just an optimization here — it is what makes the
    * streaming formulation EXPRESSIBLE: views key on their one
    * interval-width time bin (micros-exact, so the 3-bin cover proof
    * holds at full timestamp precision), purchases explode to their 3
    * covering bins, and the exact ±interval predicate rides along as the
    * range condition. The range condition plus BOTH watermarks lets
    * Spark bound each side's join state to the watermark horizon +
    * interval; inner-join matches emit eagerly (no watermark wait), and
    * late data inside `delay` still joins.
    *
    * `joinType = "left_outer"` keeps purchases with NO in-horizon view
    * (null view columns) — and the EXPLODE SIDE is what makes that
    * clean: views carry the 3-bin probe copies and purchases stay ONE
    * row each, so an unmatched purchase emits exactly one null-padded
    * row (outer-match state is per left row; had purchases been the
    * exploded side, every purchase would shed a spurious null row for
    * each of its bin copies that individually matched nothing). A view's
    * 3 copies have distinct bins and a purchase has one bin, so no
    * duplicate matches either way. The unmatched row can only emit once
    * the watermark proves no matching view can still arrive — a bounded
    * drain needs a watermark push past the tail (the far-future-sentinel
    * pattern the dedup CLI documents).
    */
  def intervalMatches(
      events: DataFrame, delay: String, joinType: String = "inner"): DataFrame = {
    val w = graft.operators.EventsOps.IntervalS
    val wUs = w * 1000000L
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("ts").as("p_ts"))
      .withColumn("pbin", floor(unix_micros(col("p_ts")) / wUs))
      .withWatermark("p_ts", delay)
    val v = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_event_id"), col("user_id").as("v_user"),
        col("value").as("v_value"), col("ts").as("v_ts"))
      .withColumn("vb", floor(unix_micros(col("v_ts")) / wUs))
      .withColumn("vbin", explode(array(col("vb") - 1, col("vb"), col("vb") + 1)))
      .withWatermark("v_ts", delay)
    p.join(v, expr(
        s"pbin = vbin AND v_ts BETWEEN p_ts - INTERVAL $w SECONDS" +
          s" AND p_ts + INTERVAL $w SECONDS"), joinType)
      .drop("pbin", "vb", "vbin")
  }

  /** Custom cross-batch state via flatMapGroupsWithState: running per-user
    * totals + error counts that survive micro-batch boundaries — the escape
    * hatch for state the built-in windows can't express. Each emission is
    * the user's current snapshot (Update mode).
    *
    * State eviction: pass `idleTimeout = Some("1 hour")` on an unbounded
    * stream — users idle past the timeout are evicted (one final snapshot
    * emitted), keeping state O(users active within the horizon). The
    * default (None) keeps state for every key — correct for bounded inputs
    * and bounded key cardinality, and required for `processAllAvailable`-
    * style drains, which never quiesce while processing-time timeouts keep
    * scheduling wake-up batches.
    */
  def runningUserTotals(
      events: Dataset[EventRow],
      idleTimeout: Option[String] = None): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        (uid: Long, batch: Iterator[EventRow], state: GroupState[UserRunning]) => {
          if (idleTimeout.isDefined && state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(last)
          } else {
            var acc = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0, 0L))
            batch.foreach { e =>
              acc = acc.copy(
                n_events = acc.n_events + 1,
                total_value = acc.total_value + e.value,
                n_errors = acc.n_errors + (if (e.event_type == "error") 1L else 0L))
            }
            state.update(acc)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator(acc)
          }
        })
  }

  /** Streaming twin of EventsOps.eventTransitions' edge extraction: emits
    * every (from_type → to_type) step of each user's stream, carrying the
    * LAST event across micro-batch boundaries as keyed state — so an edge
    * spanning two batches is still observed exactly once. Within a batch
    * the group's events sort by (ts, event_id), the same total order the
    * batch lead() window uses; counting the emitted edges downstream
    * reproduces the batch transition matrix. State is one small record per
    * user (bounded by key cardinality; add a timeout like
    * runningUserTotals' on an unbounded keyspace). */
  def transitionEdges(events: Dataset[EventRow]): Dataset[TransitionEdge] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[EventRow], state: GroupState[LastSeen]) => {
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var prev = state.getOption
          val edges = Seq.newBuilder[TransitionEdge]
          sorted.foreach { e =>
            prev.foreach(p => edges += TransitionEdge(uid, p.event_type, e.event_type))
            prev = Some(LastSeen(e.ts.getTime, e.ts.getNanos, e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          edges.result().iterator
        })
  }

  /** Streaming exact dedup — the streaming twin of DedupOps.exactDupGroups'
    * fingerprint semantics: keeps the first-arriving document per
    * normalized-content fingerprint across micro-batches. State is one
    * 16-byte key per distinct content — correct for bounded corpora; an
    * unbounded stream bounds it by deduping within a watermark horizon
    * instead (`withWatermark` + `dropDuplicatesWithinWatermark`), trading
    * global uniqueness for bounded state exactly like production ingest
    * dedup does. */
  def dedupedDocuments(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", graft.operators.DedupOps.fingerprint(col("text")))
      .dropDuplicates("fp")

  /** Row-local MinHash band hashes — q41's signature computed entirely
    * map-side, as an array column, so a stream can band each arriving
    * document with zero shuffles and zero state. Bit-identical to the
    * batch DedupOps.minhashBands derivation: same shingles, same
    * md5→60-bit→mod-p shingle hash, same universal-hash permutation
    * family (min over a doc's shingles is duplicate-insensitive, so
    * skipping the batch path's `distinct` changes nothing), same
    * ':'-joined md5 band hash. Documents with no shingles yield an empty
    * array, matching their absence from the batch bands frame.
    *
    * The per-shingle lambdas here run interpreted, but over one doc's
    * shingle array at a time on an ingest path whose cost is dominated
    * by state-store I/O — the batch tier (explode + codegen + partial
    * agg) remains the bulk-throughput formulation. */
  def bandHashes(textCol: Column): Column = {
    import graft.operators.DedupOps
    import DedupOps.{BandSize, MinHashP, NumHashes}
    val toks = graft.textops.TextOps.tokenize(textCol)
    val sh = DedupOps.shingles(textCol)
    // One definition of the hash family: the per-shingle hash and the
    // (a_j, b_j) permutation constants come from DedupOps itself, so the
    // batch tier can't drift away from this gate.
    val hs = transform(sh, s => DedupOps.shingleHash(s))
    val sigs = (0 until NumHashes).map { j =>
      val (a, b) = (DedupOps.permA(lit(j.toLong)), DedupOps.permB(lit(j.toLong)))
      array_min(transform(hs, h => pmod(a + b * h, lit(MinHashP))))
    }
    val bands = (0 until NumHashes / BandSize).map { bi =>
      md5(concat_ws(":",
        sigs.slice(bi * BandSize, (bi + 1) * BandSize).map(_.cast("string")): _*))
    }
    // Drop condition mirrors the batch tier's explodedShingles filter
    // (size(tokens) > 0): NULL text must also yield the empty array —
    // shingles(NULL) otherwise evaluates to [""] (concat_ws of a null
    // array), which would give every null-text doc one shared phantom
    // signature and flag them all as mutual near-dups.
    when(coalesce(size(toks), lit(-1)) <= 0, array().cast("array<string>"))
      .otherwise(array(bands: _*))
  }

  /** Streaming MinHash-LSH near-dup gate: each arriving document explodes
    * into its (band_id, band_hash) rows map-side (see bandHashes), and
    * `dropDuplicatesWithinWatermark` keeps only the FIRST claim of each
    * band within the watermark horizon. A later document that near-
    * duplicates an earlier one shares at least one band (the q42
    * candidate condition), so at least one of its band rows is
    * suppressed — downstream, any doc owning fewer than its emitted band
    * count is a near-dup candidate (StreamingSpec ties this to the batch
    * q42 pairs). State is one 16-byte hash per band within the horizon —
    * bounded by the watermark, the production shape for ingest dedup. */
  def lshBandGate(docs: DataFrame, tsCol: String, delay: String): DataFrame = {
    // posexplode of the empty band array drops shingle-less docs, matching
    // their absence from the batch bands frame.
    docs
      .select(col("doc_id"), col(tsCol),
        posexplode(bandHashes(col("text"))).as(Seq("band_id", "band_hash")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("band_id", "band_hash"))
      .select(col("doc_id"), col("band_id").cast("long").as("band_id"), col("band_hash"))
  }

  /** Per-document keep/drop dedup verdict over the LSH band gate
    * (VERDICT r6 #4): a document KEEPS iff it owns (first-claims) every
    * one of its MinHash bands within the watermark horizon; losing any
    * band to an earlier document makes it a near-dup candidate (the q42
    * candidate condition is sharing ≥1 band) and it is DROPPED — the
    * conservative ingest-dedup decision, since the stream cannot run the
    * batch tier's exact-Jaccard verification without holding full
    * shingle sets in state.
    *
    * Two chained stateful operators, both watermark-bounded (the
    * supported append-mode chain): `dropDuplicatesWithinWatermark` keeps
    * each band's first claim, then a tumbling-window count per doc
    * compares owned vs emitted band counts (`n_bands` rides every
    * exploded row, so the comparison is row-local after the count).
    * Verdicts emit when the watermark passes the document's window —
    * the latency/completeness trade every streaming dedup makes.
    *
    * Every document gets a verdict, including FULL duplicates that lose
    * all their bands: a per-doc PRESENCE row ("doc:" + md5(doc_id) — a
    * value space no real 32-hex band hash can collide with) rides the
    * same explode→dedup→count pipeline; its key is unique, so it always
    * survives and anchors the doc's aggregate even when every real band
    * was claimed earlier (without it, exact dups silently vanish instead
    * of reading keep = false). Shingle-less docs carry only the presence
    * row (n_bands = 0) and trivially keep — nothing to collide on.
    * StreamingSpec pins the batch tie: every dropped doc is in a batch
    * q42 candidate pair; no singleton is ever dropped. */
  def lshDedupVerdicts(
      docs: DataFrame, tsCol: String, delay: String,
      windowDur: String = "10 minutes"): DataFrame =
    docs
      .select(col("doc_id"), col(tsCol), bandHashes(col("text")).as("bands"))
      .select(col("doc_id"), col(tsCol), size(col("bands")).as("n_bands"),
        posexplode(concat(col("bands"),
          array(concat(lit("doc:"), md5(col("doc_id").cast("string"))))))
          .as(Seq("band_id", "band_hash")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("band_id", "band_hash"))
      .groupBy(window(col(tsCol), windowDur), col("doc_id"), col("n_bands"))
      .agg((count(lit(1)) - 1).as("n_owned")) // minus the presence row
      .select(col("doc_id"), col("n_bands").cast("long").as("n_bands"),
        col("n_owned"), (col("n_owned") === col("n_bands")).as("keep"))

  /** Row-local sign-LSH bucket id from driver-held anchor vectors — the
    * streaming twin of SimilarityOps.annLsh's bucket derivation. Anchors
    * are inlined as array literals and the sign rule is the SAME
    * codegen'd cosine expression, so an arriving vector lands in exactly
    * the batch tier's bucket (StreamingSpec pins bucket equality). */
  def lshBucket(embCol: Column, anchors: Seq[(Int, Array[Float])]): Column =
    anchors.map { case (aid, a) =>
      when(graft.functions.CosineSimilarity.cosineSim(
          embCol, typedlit(a)) >= 0.0,
        lit(1L << (aid - 1))).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Streaming embedding near-dup gate: each arriving vector computes its
    * sign-LSH bucket row-local (zero shuffles, zero training) and only
    * the FIRST vector claiming a bucket within the watermark horizon
    * passes — a later same-bucket arrival is a near-dup candidate (the
    * q52 candidate condition) and is suppressed. State is one short key
    * per occupied bucket within the horizon; the production embedding-
    * ingest shape, composing with the text LSH gate and the quality gate
    * on the same stream. */
  def embeddingGate(vecs: DataFrame, tsCol: String, delay: String,
      anchors: Seq[(Int, Array[Float])]): DataFrame =
    vecs
      .withColumn("bucket", lshBucket(col("embedding"), anchors))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("bucket"))
      .select(col("vec_id"), col("bucket"))

  /** Streaming verbatim-decontamination gate: each arriving document
    * derives its VerbatimWindow-token md5 windows ROW-LOCAL and counts
    * distinct hits against the benchmark window set inlined as a literal
    * (DedupOps.benchWindowKeys — eval-set-scale, the frozen-model /
    * anchor-literal pattern). Fully STATELESS: no state store, no
    * watermark, no shuffle — it composes with the quality, dedup, and
    * embedding gates on the same ingest stream at zero added state.
    * Documents shorter than the window pass untouched (sub-window quotes
    * are the overlap tier's job, exactly as in batch q83);
    * array_intersect counts DISTINCT shared windows, matching q83's
    * countDistinct semantics. StreamingSpec pins the batch tie on the
    * planted-contamination corpus. */
  def decontamGate(docs: DataFrame, benchWindows: Seq[String]): DataFrame = {
    import graft.operators.DedupOps
    val n = DedupOps.VerbatimWindow
    val toks = graft.textops.TextOps.tokenize(col("text"))
    val ws = when(size(toks) >= n,
        transform(DedupOps.shingles(col("text"), n), s => md5(s)))
      .otherwise(array().cast("array<string>"))
    docs.withColumn("n_hits",
        size(array_intersect(ws, typedlit(benchWindows))).cast("long"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** Production "dedup-then-index" streaming ingest (VERDICT r7 #3): gate
    * arriving vectors with the sign-LSH embedding near-dup gate, then
    * append each surviving micro-batch into the PERSISTED IVF index via
    * the incremental-append path (SimilarityOps.appendArtifacts: assign
    * against the persisted coarse centroids, int8 + residual-PQ encode
    * with the persisted codebooks, land in the owning cluster's partition
    * directory — no retraining anywhere). `foreachBatch` is the right
    * sink shape: the index append is a batch parquet write against index
    * files, and routing each surviving micro-batch through the exact
    * batch-tier derivation means the stream and the offline build cannot
    * drift. Gated duplicates are dropped BEFORE the append, so they
    * never reach the index (StreamingSpec pins it). Returns the
    * configured writer; callers `.start()` it. */
  def indexIngest(
      vecs: DataFrame, tsCol: String, delay: String,
      anchors: Seq[(Int, Array[Float])], indexDir: String,
      autoCompactAt: Int = CompactFilesPerCluster,
      autoSplitImbalance: Double = 0.0,
      autoRetrainTvd: Double = 0.0,
      autoRetrainDeadFrac: Double = 0.0,
      autoUpsertLedgerAt: Int = UpsertLedgerRows)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs
      .withColumn("bucket", lshBucket(col("embedding"), anchors))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("bucket"))
      .select("vec_id", "embedding")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Geometry maintenance BEFORE this batch's data commit, and
        // never on a replay (see maybeSplitForBatch): both verbs fold
        // cell rows to the base with CROSS-CLUSTER re-assignment, so
        // interleaving one between a batch's data commit and its offset
        // commit could leave a replayed row and its folded copy in two
        // different cluster partitions — a duplicate partition-level
        // maintenance can never fold away. Ordered first (acting on the
        // PREVIOUS batches' drift/skew), the replay guards make every
        // crash interleaving land in an already-analyzed window: either
        // the verb is a no-op on retry, or ingestBatch's dynamic
        // overwrite is idempotent. Escalation order mirrors q205:
        // retrain replaces the geometry wholesale, so a batch that
        // retrains skips the split (the fresh quantizer starts
        // balanced; residual skew re-arms the trigger next batch).
        val retrained = maybeRetrainForBatch(batch.sparkSession, indexDir,
          autoRetrainTvd, autoRetrainDeadFrac, batchId)
        if (!retrained)
          maybeSplitForBatch(batch.sparkSession, indexDir,
            autoSplitImbalance, batchId)
        ingestBatch(batch, batchId, indexDir)
        // Ack marker BEFORE compaction (ADVICE r15 #2): compaction can
        // fold this very batch's ingest_batch partitions into the base,
        // erasing the partition signature the replay guard keys on — so
        // the fold must never run before the marker that records the
        // batch as committed. With this ordering every crash
        // interleaving is covered: crash before/inside ingestBatch →
        // partitions (partially) exist, signature guard skips the
        // split; crash after the marker (inside/after compaction) →
        // marker guard skips it; no window erases both.
        writeIngestMarker(batch.sparkSession, indexDir, batchId)
        // Content debt paid like file debt (r18 — VERDICT r17 #4): the
        // upsert ledger is driver-resident and broadcast into every
        // serve's anti-join, so under heavy re-ingest churn between
        // folds it was the one serve-path structure with no bound.
        // After the marker (the partitions the apply rewrites belong to
        // COMMITTED batches), before maybeCompact (a fold's first step
        // applies the ledger anyway — paying it here keeps the fold's
        // own work, and every serve between now and the fold, ledger-
        // free).
        maybeApplyUpserts(batch.sparkSession, indexDir, autoUpsertLedgerAt)
        maybeCompact(batch.sparkSession, indexDir, autoCompactAt)
        ()
      }

  /** Files-per-cluster bound before ingest triggers compaction (VERDICT
    * r8 #6): each ingested micro-batch adds one file per touched cluster
    * (under its own ingest_batch partition), so serve-task count and
    * parquet footer overhead grow with APPEND HISTORY until someone
    * remembers to run CompactVectorIndex. With the trigger, nobody has
    * to remember: ingest pays the debt down automatically once any
    * cluster partition exceeds the bound, and the steady state is
    * files-per-cluster ≤ bound regardless of how long the stream runs. */
  val CompactFilesPerCluster = 8

  /** Post-batch compaction check (VERDICT r10 #1 — partition-level since
    * r11): list the vectors table's cluster partitions (driver-side
    * metadata walk — K directory entries plus their file statuses, the
    * same scale as a metastore listing; never a data read) and trigger
    * [[graft.operators.SimilarityOps.compactHotClusters]] for EXACTLY the
    * clusters over `threshold` data files. Cold clusters' files are never
    * listed, read, or rewritten (Round11Spec pins a byte-identical cold
    * listing), rows are untouched, and the batch that triggered it has
    * already committed its own partitions — so a replay after a crash
    * mid-compaction sees either layout, both serving identical answers
    * (Round9Spec pins served-equality across the swap). At 100 TB this
    * makes steady-state maintenance O(hot partition), not O(index) — one
    * hot cluster no longer forces a full-table rewrite. The full rewrite
    * survives as the OFFLINE CLI (CompactVectorIndex → compactVectors,
    * manifest-swapped). Returns whether any cluster was compacted.
    * `threshold <= 0` disables. */
  def maybeCompact(spark: SparkSession, indexDir: String, threshold: Int): Boolean = {
    if (threshold <= 0) return false
    graft.operators.SimilarityOps
      .compactHotClusters(spark, indexDir, threshold).nonEmpty
  }

  /** Post-batch GEOMETRY check (r15): the compaction trigger above pays
    * down FILE debt; this pays down CELL-SIZE debt. A skewed ingest
    * (one tenant, one topic burst) piles rows into a few coarse cells,
    * and q202's reading — the fattest probed cell bounds every probe's
    * wall time — degrades serving until someone remembers to run
    * SplitVectorIndex. With the trigger armed, nobody has to remember:
    * when the cluster_sizes ARTIFACT (a K-row memoized read — never a
    * corpus pass; ingestBatch just refreshed it) reads
    * max > `imbalance` × mean, the batch runs ONE
    * [[graft.operators.SimilarityOps.splitHotCells]] invocation at
    * ratio = `imbalance` — bounded per-batch work (≤ SplitMaxCells
    * cells, 2-way each, only their rows re-encoded), converging to
    * steady state across batches exactly like the compaction bound.
    * `imbalance <= 0` DISABLES (the default): splitting grows K and
    * rewrites hot-cell artifacts mid-stream, so a deployment arms it
    * per stream where ingest skew is expected. The ingest sink is the
    * index's single maintenance writer in that deployment (the
    * cluster_sizes lock makes a violation loud). Returns whether any
    * cell was split. */
  def maybeSplit(spark: SparkSession, indexDir: String, imbalance: Double): Boolean = {
    if (imbalance <= 0) return false
    val imb = graft.operators.SimilarityOps.indexImbalance(spark, indexDir)
    if (imb <= imbalance) return false
    graft.operators.SimilarityOps
      .splitHotCells(spark, indexDir, ratio = imbalance).nonEmpty
  }

  /** [[maybeSplit]] with the ingest sink's REPLAY GUARD: skip the split
    * when `batchId`'s partitions already exist in the vectors table —
    * that means a prior attempt of this batch committed data but crashed
    * before the offset commit, and this invocation is Structured
    * Streaming's replay. Splitting here would fold the crashed attempt's
    * rows to the base (re-assigned across cluster ids) right before
    * ingestBatch re-appends them — and a boundary row can land in a
    * DIFFERENT cluster than its folded copy, a duplicate the
    * partition-level prefer-base fold can never see in one read. Skipped
    * on replay, the split simply runs at the next clean batch; the
    * detection is one K-directory metadata walk, only paid when the
    * trigger is armed.
    *
    * SECOND GUARD (ADVICE r15 #2): the partition signature alone can be
    * ERASED by the sink's own compaction — maybeCompact runs after
    * ingestBatch in the same foreachBatch and may fold the just-written
    * ingest_batch=<id> partitions into the base before the offset
    * commit, so a crash there replays a batch whose signature is gone.
    * The sink therefore writes an ACK MARKER (last fully-ingested
    * batchId) between ingestBatch and maybeCompact; a batchId at or
    * below the marker is a replay of committed work regardless of what
    * compaction folded. The marker is OVERWRITTEN, not maxed, so a
    * fresh checkpoint reusing an index (batch ids restarting at 0)
    * re-arms the trigger from its second batch. */
  private[graft] def maybeSplitForBatch(
      spark: SparkSession, indexDir: String, imbalance: Double,
      batchId: Long): Boolean = {
    if (imbalance <= 0) return false
    if (readIngestMarker(spark, indexDir).exists(batchId <= _)) return false
    if (batchPartitionsExist(spark, indexDir, batchId)) return false
    maybeSplit(spark, indexDir, imbalance)
  }

  /** Post-batch RETRAIN check (r16 — VERDICT r15 #3): the split trigger
    * pays down CELL-SIZE debt; this pays down GEOMETRY debt — the point
    * where incremental repair stops working because the quantizer itself
    * no longer fits the data the stream delivered. Signals are computed
    * from the LIVE index, not the analytic corpus: occupancy-drift TVD
    * from the cluster_sizes artifact (metadata-scale, checked every
    * armed batch) and, separately armed, the dead-codeword fraction
    * over the index's own pq_codes (one narrow column scan — arm it
    * where that per-batch price is acceptable, or rely on the offline
    * q205 advisor). When either crosses its threshold the batch runs
    * ONE [[graft.operators.SimilarityOps.retrainIndex]] — the
    * single-manifest-commit cutover, so a crash mid-verb leaves the old
    * geometry serving — and the TVD signal resets to zero by
    * construction (everything folds to base). `<= 0` DISABLES each
    * signal (the default): retraining mid-stream replaces the whole
    * geometry, so a deployment arms it per stream, typically at the
    * q205 thresholds (RetrainTvd / RetrainDeadFrac). Returns whether a
    * retrain ran. */
  def maybeRetrain(spark: SparkSession, indexDir: String,
      tvdAt: Double, deadAt: Double): Boolean = {
    import graft.operators.SimilarityOps
    if (tvdAt <= 0 && deadAt <= 0) return false
    val tvdFire =
      tvdAt > 0 && SimilarityOps.indexOccupancyTvd(spark, indexDir) >= tvdAt
    // The dead-codeword signal does NOT self-disarm the way TVD does —
    // a corpus whose residuals structurally use < (1 − deadAt) of the
    // codewords reads over-threshold even right after a retrain, and an
    // unanchored compare would fire a full rebuild on EVERY armed batch.
    // Anchor it to the fraction measured right after the last TRIGGERED
    // retrain (`.dead_frac_baseline`): fire only when the live fraction
    // exceeds both the threshold and that anchor — i.e. the codebook
    // got WORSE than its own fresh state, which a retrain can fix. At
    // most one anchoring retrain per lifecycle on a structurally-dead
    // corpus; manual retrains/rebuilds drop the anchor (writeIndex
    // clears it with the ack marker), so the next armed batch re-derives
    // it from one fresh measurement.
    val deadFire = !tvdFire && deadAt > 0 && {
      val frac = SimilarityOps.indexDeadCodeFrac(spark, indexDir)
      frac >= deadAt && readDeadBaseline(spark, indexDir).forall(frac > _)
    }
    if (!tvdFire && !deadFire) return false
    SimilarityOps.retrainIndex(spark, indexDir)
    if (deadAt > 0)
      writeDeadBaseline(spark, indexDir,
        SimilarityOps.indexDeadCodeFrac(spark, indexDir))
    true
  }

  /** Post-retrain dead-codeword anchor (one line, atomic rename — the
    * marker recipe). Absent = never trigger-retrained: the threshold
    * alone decides. */
  private def deadBaselinePath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/.dead_frac_baseline")

  private[graft] def writeDeadBaseline(
      spark: SparkSession, indexDir: String, frac: Double): Unit = {
    val fs = deadBaselinePath(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/.dead_frac_baseline.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$frac\n".getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri,
      spark.sparkContext.hadoopConfiguration)
      .rename(tmp, deadBaselinePath(indexDir),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private[graft] def readDeadBaseline(
      spark: SparkSession, indexDir: String): Option[Double] = {
    val p = deadBaselinePath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.linesIterator.map(_.trim).find(_.nonEmpty).map(_.toDouble)
    }
  }

  /** [[maybeRetrain]] under the ingest sink's replay guards — the exact
    * pair [[maybeSplitForBatch]] uses (partition signature + ack
    * marker), because a retrain interleaved into a replayed batch has
    * the same cross-cluster duplicate hazard as a split, only
    * index-wide. */
  private[graft] def maybeRetrainForBatch(
      spark: SparkSession, indexDir: String, tvdAt: Double, deadAt: Double,
      batchId: Long): Boolean = {
    if (tvdAt <= 0 && deadAt <= 0) return false
    if (readIngestMarker(spark, indexDir).exists(batchId <= _)) return false
    if (batchPartitionsExist(spark, indexDir, batchId)) return false
    maybeRetrain(spark, indexDir, tvdAt, deadAt)
  }

  /** Ledger-rows bound before ingest triggers the physical upsert apply
    * (r18 — VERDICT r17 #4): the upsert ledger rides the driver and is
    * broadcast into every serve's anti-join, so its size must be
    * bounded by POLICY, not by fold cadence. 256 rows ≈ 4 KB broadcast
    * — comfortably under any driver/broadcast concern, while letting a
    * normal replace trickle ride to the next natural fold for free. */
  val UpsertLedgerRows = 256

  /** Post-batch content-debt check (the [[maybeCompact]] discipline):
    * read the ledger (a driver-side bounded artifact read — the same
    * read every serve already pays), and when it exceeds `threshold`
    * rows force [[graft.operators.SimilarityOps.applyUpsertsPhysically]]
    * — one id-pruned locate scan plus partition-local rewrites of
    * exactly the superseded copies, then the ledger clears. Idempotent
    * on replay twice over: a crash mid-apply leaves the ledger armed
    * (serving still excludes via the anti-join) and the re-run
    * completes; a crash after the clear leaves nothing to re-fire on
    * (the re-ingested batch's recordIngestUpserts probes find no older
    * copies — they were just removed physically). */
  def maybeApplyUpserts(
      spark: SparkSession, indexDir: String,
      threshold: Int = UpsertLedgerRows): Boolean = {
    import graft.operators.SimilarityOps
    if (threshold <= 0) return false
    val n = SimilarityOps.indexUpserts(spark, indexDir).size
    if (n <= threshold) false
    else {
      SimilarityOps.applyUpsertsPhysically(spark, indexDir)
      true
    }
  }

  /** The ingest sink's ack-marker file: one line, the last batchId whose
    * ingestBatch (data + artifact twin) completed. Atomic tmp + rename
    * overwrite (the MANIFEST recipe); a metadata-scale write per
    * micro-batch. The forget sink (r18) keeps its OWN marker — the two
    * streams commit independently. */
  private def ingestMarkerPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/.ingest_acked")

  private def forgetMarkerPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/.forget_acked")

  private def writeMarker(
      spark: SparkSession, p: org.apache.hadoop.fs.Path, batchId: Long): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"${p.toString}.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri,
      spark.sparkContext.hadoopConfiguration)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readMarker(
      spark: SparkSession, p: org.apache.hadoop.fs.Path): Option[Long] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.linesIterator.map(_.trim).find(_.nonEmpty).map(_.toLong)
    }
  }

  private[graft] def writeIngestMarker(
      spark: SparkSession, indexDir: String, batchId: Long): Unit =
    writeMarker(spark, ingestMarkerPath(indexDir), batchId)

  private[graft] def readIngestMarker(
      spark: SparkSession, indexDir: String): Option[Long] =
    readMarker(spark, ingestMarkerPath(indexDir))

  private[graft] def writeForgetMarker(
      spark: SparkSession, indexDir: String, batchId: Long): Unit =
    writeMarker(spark, forgetMarkerPath(indexDir), batchId)

  private[graft] def readForgetMarker(
      spark: SparkSession, indexDir: String): Option[Long] =
    readMarker(spark, forgetMarkerPath(indexDir))

  /** Streaming takedown twin of [[graft.operators.SimilarityOps
    * .deleteVectors]] (r18 — VERDICT r17 #5): at 100 TB, removal
    * requests (takedowns, right-to-be-forgotten) arrive as a STREAM,
    * not a CLI invocation. Each micro-batch of (vec_id) delete requests
    * runs the exact synchronous verb — locate scan bounded by |ids|,
    * partition-local rewrites of every copy, artifact twins decremented
    * — then commits the forget ack marker.
    *
    * Replay discipline: deleteVectors is NATURALLY idempotent (a replay
    * locates no copies — they are gone — so it rewrites nothing and
    * decrements nothing), but the ack marker is still checked first:
    * its job is not idempotency, it is the RE-INGEST RACE — a replayed
    * takedown running after the same vec_id was legitimately
    * re-ingested by a later ingest batch would silently delete the NEW
    * copy. The marker pins each forget batch to fire at most once, so
    * a delete can never reach past its own position in the stream.
    * StreamingSpec drives the crash/replay interleaving. */
  def indexForget(deletes: DataFrame, indexDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deletes
      .select(col("vec_id").cast("long").as("vec_id"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val acked = readForgetMarker(spark, indexDir).exists(_ >= batchId)
        if (!acked) {
          val ids = batch.select("vec_id").distinct()
            .collect().map(_.getLong(0)).toSeq
          if (ids.nonEmpty)
            graft.operators.SimilarityOps.deleteVectors(spark, indexDir, ids)
          writeForgetMarker(spark, indexDir, batchId)
        }
        ()
      }

  /** Whether any cluster partition already holds `ingest_batch=batchId`
    * — the crashed-attempt signature the replay guard keys on. Metadata
    * walk over K cluster directories; never a data read. */
  private[graft] def batchPartitionsExist(
      spark: SparkSession, indexDir: String, batchId: Long): Boolean = {
    import graft.operators.SimilarityOps
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vdir = new org.apache.hadoop.fs.Path(
      SimilarityOps.vectorsPath(spark, indexDir))
    fs.exists(vdir) && fs.listStatus(vdir).exists { c =>
      c.isDirectory && c.getPath.getName.startsWith("cluster=") &&
        fs.exists(new org.apache.hadoop.fs.Path(
          c.getPath, s"ingest_batch=$batchId"))
    }
  }

  // ---- streaming incremental dup components (VERDICT r9 #7 / r10 #5) ------

  /** Streaming incremental component maintenance: each micro-batch of
    * documents (doc_id, text) merges into a persisted component-labels
    * artifact, re-propagating ONLY the components its band matches touch.
    * On-disk state under `labelsDir`:
    *   - `bands/epoch=<id>`  — the batch's (doc_id, band_id, band_hash)
    *     rows: the retained corpus's band index, grown append-only;
    *   - `labels/epoch=<id>` — ONLY the docs this batch re-labeled
    *     (affected components ∪ the batch itself).
    * Both commit via dynamic partition overwrite on their own epoch (the
    * ingestBatch exactly-once contract: a replayed batch rewrites its own
    * partitions, and reads ignore epochs ≥ the replaying batch), and a
    * doc's CURRENT label is its newest-epoch row ([[currentLabels]]).
    *
    * Per batch: band the new docs map-side ([[bandHashes]] —
    * bit-identical to batch minhashBands), candidate pairs =
    * (new × retained) ∪ (new × new) band matches — the q85 asymmetric
    * join, never corpus × corpus — then DedupOps.mergeComponents
    * re-propagates only the affected components and ONLY the relabeled
    * rows are written. Per-batch cost: batch size + affected-component
    * mass + one pruned scan of the band index; never a corpus relabel.
    * The epoch history is folded down to the base epoch −1 on the same
    * trigger discipline as the vector index's compaction
    * ([[maybeFoldDown]] after each merged batch), so the read-side
    * newest-epoch window — standard last-writer-wins resolution — scans
    * a bounded history, never one partition per micro-batch forever.
    * Round11Spec pins: N streamed batches ≡ one full fixpoint recompute
    * on the union. */
  def componentMaintenance(
      docs: DataFrame, labelsDir: String, foldThreshold: Int = FoldThreshold)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          mergeBatchComponents(batch, batchId, labelsDir)
          maybeFoldDown(batch.sparkSession, labelsDir, foldThreshold)
          ()
        }
      }

  /** One micro-batch of component maintenance — the foreachBatch body,
    * callable directly (Round11Spec drives batch and stream twins). */
  def mergeBatchComponents(batch: DataFrame, batchId: Long, labelsDir: String): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(labelsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bandsPath = s"$labelsDir/bands"
    val labelsPath = s"$labelsDir/labels"
    def emptyPairs = spark.range(0)
      .select(col("id").as("doc_id"), col("id").as("label"))
    // Eagerly materialized: the batch's bands are both a JOIN input and
    // this epoch's state write — and state must be read before it is
    // overwritten (Spark refuses to overwrite a read path).
    val newBands = batch
      .select(col("doc_id"),
        posexplode(bandHashes(col("text"))).as(Seq("band_id", "band_hash")))
      .select(col("doc_id"), col("band_id").cast("long").as("band_id"),
        col("band_hash"))
      .localCheckpoint(true)
    val retained =
      if (fs.exists(new org.apache.hadoop.fs.Path(bandsPath)))
        bandsDf(spark, labelsDir).filter(col("epoch") < batchId)
          .select("doc_id", "band_id", "band_hash")
      else newBands.limit(0)
    val existing =
      if (fs.exists(new org.apache.hadoop.fs.Path(labelsPath)))
        currentLabels(spark, labelsDir, beforeEpoch = batchId)
      else emptyPairs
    val cross = retained
      .select(col("doc_id").as("src"), col("band_id"), col("band_hash"))
      .join(newBands.select(col("doc_id").as("dst"), col("band_id"), col("band_hash")),
        Seq("band_id", "band_hash"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val inner = newBands.as("a")
      .join(newBands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst")).distinct()
    val (relabeled, _) = graft.operators.DedupOps.mergeComponents(
      existing, batch.select("doc_id"), cross.unionByName(inner))
    // relabeled exits fixpointLabels reliably checkpointed, so the write
    // below does not re-read the labels path it overwrites.
    newBands.withColumn("epoch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(bandsPath)
    relabeled.withColumn("epoch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(labelsPath)
    newBands.unpersist(true)
  }

  /** Pinned store schemas (the vectorsDf discipline): every maintenance
    * and read-side scan of the label/band stores plans without a
    * footer-inference job — at 100 TB an epoch history is thousands of
    * files, and schema inference would pay a metadata pass per read —
    * and tolerates a concurrently-retired epoch partition
    * (`ignoreMissingFiles`, single maintenance writer + many readers). */
  private[graft] val BandsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, band_id BIGINT, band_hash STRING, epoch BIGINT")
  private[graft] val LabelsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, label BIGINT, epoch BIGINT")

  private def bandsDf(spark: SparkSession, labelsDir: String): DataFrame =
    spark.read.schema(BandsSchema).option("ignoreMissingFiles", "true")
      .parquet(s"$labelsDir/bands")

  private def labelsDf(spark: SparkSession, labelsDir: String): DataFrame =
    spark.read.schema(LabelsSchema).option("ignoreMissingFiles", "true")
      .parquet(s"$labelsDir/labels")

  /** Epoch partitions per store before [[maybeFoldDown]] triggers — the
    * labels twin of StreamingOps' vector-compaction bound: steady-state
    * micro-batching keeps at most this many live epochs plus the folded
    * base, so [[currentLabels]]' newest-epoch window never scans an
    * unbounded history. */
  val FoldThreshold = 16

  /** Trigger wrapper (the `maybeCompact` discipline): fold the epoch
    * history down iff the LABELS store holds more than `threshold` live
    * epoch partitions. `threshold <= 0` disables. */
  def maybeFoldDown(spark: SparkSession, labelsDir: String, threshold: Int): Boolean = {
    if (threshold <= 0) return false
    if (epochPartitions(spark, s"$labelsDir/labels").count(_ >= 0L) <= threshold) false
    else foldDownEpochs(spark, labelsDir)
  }

  /** The epoch ids currently materialized under `<store>/epoch=<id>`. */
  private def epochPartitions(spark: SparkSession, store: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .map(_.getPath.getName.stripPrefix("epoch=").toLong).toSeq.sorted
  }

  /** Fold the label/band epoch history down to the base epoch −1 — the
    * growth seam the scaladoc above has promised since round 10
    * (VERDICT r11 missing #1): without it `bands/epoch=<id>` and
    * `labels/epoch=<id>` grow one partition per micro-batch forever and
    * [[currentLabels]] windows over ALL of it every batch.
    *
    * Two stores, two fold costs — matched to their read semantics:
    *   - BANDS (union semantics, read-side `distinct()`): epoch data
    *     files are RENAMED into `epoch=-1` — a pure metadata fold, zero
    *     bytes rewritten, where a rewrite would re-copy the corpus-sized
    *     band index every FoldThreshold batches. Renames are atomic and
    *     a move can neither lose nor duplicate a row; a crash mid-loop
    *     leaves the remainder for the next fold entry.
    *   - LABELS (last-writer-wins semantics — the base must hold
    *     RESOLVED values, so renaming is semantically wrong): a prior
    *     fold's surviving `.retired_batches` marker is swept first, the
    *     resolved snapshot ([[currentLabels]] over the FULL history) is
    *     staged under `.fold_tmp` — OUTSIDE the read path, so no
    *     read-overwrite conflict and no corpus-sized localCheckpoint
    *     pinned in the block manager — then committed to `epoch=-1` via
    *     dynamic partition overwrite (only the base partition is
    *     replaced), and the superseded epochs are recorded in the
    *     atomically-renamed marker BEFORE deletion, so a crash anywhere
    *     leaves either harmless shadowed duplicates (−1 sorts below
    *     every real epoch, and it holds exactly what the live epochs
    *     resolve to) or a marker whose sweep is re-runnable. The
    *     snapshot is one slim row per doc — the same magnitude
    *     [[currentLabels]] already scans per batch, so the fold never
    *     dominates steady-state cost.
    *
    * A batch REPLAYED after a fold (its epoch partition deleted, its
    * rows in the base) re-derives the same labels: its band rows are in
    * the folded band index, so its candidate pairs regenerate, and
    * mergeComponents over already-merged state is a fixpoint no-op
    * (Round12Spec pins replay-after-fold idempotency). */
  def foldDownEpochs(spark: SparkSession, labelsDir: String): Boolean = {
    import graft.operators.SimilarityOps
    SimilarityOps.recoverRetiredBatches(spark, labelsDir)
    recoverBandsDedup(spark, labelsDir)
    val labelEpochs = epochPartitions(spark, s"$labelsDir/labels").filter(_ >= 0L)
    val bandEpochs = epochPartitions(spark, s"$labelsDir/bands").filter(_ >= 0L)
    if (labelEpochs.isEmpty && bandEpochs.isEmpty) return false
    val tmp = s"$labelsDir/.fold_tmp"
    val fs = new org.apache.hadoop.fs.Path(labelsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // BANDS fold is METADATA-ONLY: bands are an append-only union (the
    // pair generation dedups by construction), so epoch files MOVE into
    // the base partition — zero data rewritten, where a rewrite fold
    // would re-copy the corpus-sized band index every FoldThreshold
    // batches. Each rename is atomic and a move can never duplicate or
    // lose a row, so a crash mid-loop just leaves the remainder for the
    // next fold entry; the epoch prefix keeps file names unique across
    // source epochs. (Replay-after-crash CAN leave a duplicate band row
    // between the base and a rewritten batch epoch — the read-side
    // `distinct()` absorbs it, documented at the call sites.)
    val bandsBase = new org.apache.hadoop.fs.Path(s"$labelsDir/bands/epoch=-1")
    fs.mkdirs(bandsBase)
    // A batch epoch folded ONCE and then replayed (crash between the sink
    // ack and the checkpoint commit) re-materializes under the same epoch
    // id with fresh file names; moving it again would plant literal
    // duplicate band rows in the base, which every later maintenance
    // batch re-absorbs through a corpus-scale distinct(). The ledger of
    // ever-folded epoch ids makes the replay detectable exactly (a
    // metadata read, no data scan), and only then does the fold pay for
    // a deduping base rewrite.
    val ledger = foldedEpochLedger(spark, labelsDir)
    val replayed = bandEpochs.toSet.intersect(ledger)
    val folded = bandEpochs.filter { e =>
      val d = new org.apache.hadoop.fs.Path(s"$labelsDir/bands/epoch=$e")
      // HDFS rename returns FALSE (not an exception) on quota/permission/
      // destination-exists failures; deleting the epoch dir after a failed
      // move would permanently lose band rows that never landed in the
      // base. Retire the source epoch only when every file moved — a
      // partial move leaves the remainder for the next fold entry, which
      // the crash story already assumes.
      fs.listStatus(d).iterator
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
          && !st.getPath.getName.startsWith("."))
        .forall { st =>
          fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(bandsBase, s"e${e}_${st.getPath.getName}"))
        }
    }
    // RECORD-AHEAD (ADVICE r13): the ledger lands — atomically, temp +
    // rename-overwrite — BEFORE the folded epoch dirs are deleted. The
    // old order (delete, then record) had a crash window that left a
    // folded epoch unrecorded FOREVER: its later replay escaped dedup
    // detection and its duplicate band rows were never paid down, since
    // the rewrite only triggers off ledger hits. Record-ahead inverts
    // the failure: a crash between the ledger write and the deletes
    // leaves emptied epoch dirs that the NEXT fold re-lists as
    // "replayed" and pays with at worst one spurious (still correct)
    // dedup rewrite — a bounded cost instead of a permanent leak.
    writeFoldedEpochLedger(spark, labelsDir, ledger ++ folded)
    folded.foreach { e =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$labelsDir/bands/epoch=$e"), true)
    }
    if (replayed.nonEmpty) dedupBandsBase(spark, labelsDir)

    // LABELS fold is a real rewrite — last-writer-wins needs the base to
    // hold RESOLVED values (a renamed epoch file would surface stale
    // labels under epoch=-1). The resolved snapshot is one slim row per
    // doc, the same magnitude currentLabels already scans per batch;
    // staged OUTSIDE the read path (no read-overwrite conflict, no
    // corpus-sized localCheckpoint), committed via dynamic partition
    // overwrite of the base partition only, superseded epochs retired
    // through the crash-safe marker.
    if (labelEpochs.nonEmpty) {
      currentLabels(spark, labelsDir)
        .withColumn("epoch", lit(-1L))
        .write.mode("overwrite").parquet(s"$tmp/labels")
      spark.read.parquet(s"$tmp/labels")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch").parquet(s"$labelsDir/labels")
      SimilarityOps.writeRetiredMarker(spark, labelsDir,
        labelEpochs.map(e => s"labels/epoch=$e"))
      SimilarityOps.recoverRetiredBatches(spark, labelsDir)
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    true
  }

  /** Epoch ids ever folded into the bands base — one id per line in
    * `<labelsDir>/.folded_epochs` (bounded by the number of batches ever
    * folded; a driver-side text read, the retirement-marker scale). */
  private def foldedEpochLedger(spark: SparkSession, labelsDir: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$labelsDir/.folded_epochs")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.linesIterator.map(_.trim).filter(_.nonEmpty).map(_.toLong).toSet
    }
  }

  /** Atomically replace the folded-epoch ledger (temp file +
    * FileContext rename-with-OVERWRITE — the MANIFEST discipline). */
  private def writeFoldedEpochLedger(
      spark: SparkSession, labelsDir: String, ids: Set[Long]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(labelsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$labelsDir/.folded_epochs.tmp")
    val out = fs.create(tmp, true)
    try out.write((ids.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri,
      spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(s"$labelsDir/.folded_epochs"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Rewrite the bands base partition with exact (doc_id, band_id,
    * band_hash) duplicates removed — the OPTIONAL pay-down for
    * replay-after-fold duplicates (VERDICT r12 #5). The fold itself stays
    * metadata-only; this rewrite runs only when the ledger proves a
    * replayed epoch was folded a second time. Staged outside the read
    * path, committed via dynamic partition overwrite of the base
    * partition only — the labels-fold commit discipline. Duplicates are
    * never a correctness issue (pair generation dedups by construction);
    * they are a cost issue, so the rewrite is deliberately rare. */
  private[graft] def dedupBandsBase(spark: SparkSession, labelsDir: String): Boolean = {
    val base = new org.apache.hadoop.fs.Path(s"$labelsDir/bands/epoch=-1")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return false
    // Crash story (the base is the ONLY committed copy of folded band
    // history — unlike the labels fold, no epoch partition survives to
    // recover from, so a read-modify-overwrite of the base in place is
    // not acceptable):
    //   1. stage the deduped copy OUTSIDE bands/ (no read-overwrite
    //      conflict, invisible to partition discovery);
    //   2. atomically create the `.bands_dedup_commit` marker — from
    //      this instant [[recoverBandsDedup]] can always finish the
    //      swap from the staged copy;
    //   3. swap: delete the old base dir, rename the staged dir to
    //      `bands/epoch=-1` (one atomic directory rename — the staged
    //      files need no epoch column, the partition value comes from
    //      the directory name);
    //   4. delete the marker.
    // A crash before 2 leaves the old base intact (orphan tmp swept by
    // the next fold); between 2 and the completed 3, recovery redoes
    // the swap; after 3, recovery sees the staged dir gone and just
    // drops the marker.
    val tmp = new org.apache.hadoop.fs.Path(s"$labelsDir/.bands_dedup_staged")
    val marker = new org.apache.hadoop.fs.Path(s"$labelsDir/.bands_dedup_commit")
    fs.delete(tmp, true)
    spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, band_id BIGINT, band_hash STRING"))
      .option("ignoreMissingFiles", "true").parquet(base.toString)
      .distinct()
      .write.mode("overwrite").parquet(tmp.toString)
    val mtmp = new org.apache.hadoop.fs.Path(s"$labelsDir/.bands_dedup_commit.tmp")
    val out = fs.create(mtmp, true)
    try out.write("swap\n".getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(mtmp.toUri,
      spark.sparkContext.hadoopConfiguration)
      .rename(mtmp, marker, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    fs.delete(base, true)
    fs.rename(tmp, base)
    fs.delete(marker, false)
    true
  }

  /** Finish an interrupted [[dedupBandsBase]] swap: if the commit marker
    * exists, the staged deduped copy (if still present) IS the base —
    * redo the delete + rename; either way drop the marker. Idempotent;
    * runs at every fold entry (the recoverRetiredBatches discipline). */
  private[graft] def recoverBandsDedup(spark: SparkSession, labelsDir: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$labelsDir/.bands_dedup_commit")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) return
    val tmp = new org.apache.hadoop.fs.Path(s"$labelsDir/.bands_dedup_staged")
    val base = new org.apache.hadoop.fs.Path(s"$labelsDir/bands/epoch=-1")
    if (fs.exists(tmp)) {
      fs.delete(base, true)
      fs.rename(tmp, base)
    }
    fs.delete(marker, false)
  }

  /** A doc's current component label = its newest-epoch row (strictly
    * below `beforeEpoch`, so a replaying batch never sees its own or a
    * later epoch's writes). */
  def currentLabels(
      spark: SparkSession, labelsDir: String,
      beforeEpoch: Long = Long.MaxValue): DataFrame =
    labelsDf(spark, labelsDir)
      .filter(col("epoch") < beforeEpoch)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("epoch").desc)))
      .filter(col("rn") === 1)
      .select("doc_id", "label")

  /** One micro-batch of index ingest, EXACTLY-ONCE: the batch's
    * artifacts land under their clusters' `ingest_batch=<batchId>`
    * partitions via dynamic partition overwrite, so a batch replayed
    * after a sink failure (same batchId, same data — the Structured
    * Streaming replay contract) rewrites its own directories instead of
    * double-appending. A plain `mode("append")` sink would duplicate
    * every vector of an acked-but-crashed batch; this is the
    * idempotent-writer half of the exactly-once recipe, with no
    * read-side dedup and no table format required. `cluster` stays the
    * TOP partition level, so probe pruning is untouched; compaction
    * folds the accumulated batch directories back into the base.
    * (Requires an index built with the ingest_batch layout —
    * BuildVectorIndex writes it since round 8.) */
  def ingestBatch(batch: DataFrame, batchId: Long, indexDir: String): Unit =
    if (!batch.isEmpty) {
      graft.operators.SimilarityOps
        .appendArtifacts(batch.sparkSession, indexDir, batch)
        .withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite")
        // Per-write option (not session conf): only THIS batch's
        // (cluster, ingest_batch) directories are replaced; the base
        // tier and other batches are never touched. The target resolves
        // through the MANIFEST so ingest keeps appending to the active
        // generation after an offline full-table compaction swap.
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cluster", "ingest_batch")
        .parquet(graft.operators.SimilarityOps
          .vectorsPath(batch.sparkSession, indexDir))
      // Artifact twin of the data commit (r14): REPLACE this batch's
      // rows in the cluster_sizes artifact from its just-committed
      // partition directories — idempotent on replay, exactly like the
      // dynamic partition overwrite above — and drop the memoized
      // snapshot, so a session ingesting alongside tier=auto serving
      // routes against the grown corpus without ever recounting it.
      graft.operators.SimilarityOps
        .recordIngestClusterSizes(batch.sparkSession, indexDir, batchId)
      // Upsert semantics (r17 — VERDICT r16 #2): record this batch's
      // vec_ids in the ledger so any OLDER copy of a re-ingested id is
      // excluded from serving the moment this batch commits —
      // replace-not-duplicate, with the physical dedup deferred to the
      // next whole-table fold. Idempotent on replay like the data
      // commit and the size twin above.
      graft.operators.SimilarityOps
        .recordIngestUpserts(batch.sparkSession, indexDir, batchId)
    }

  /** Streaming ANN serving: answer a stream of (query_id, embedding)
    * requests from the persisted IVF index, one distributed plan per
    * micro-batch (SimilarityOps.annIvfServeMany — coarse-score against
    * broadcast centroids, per-query probe window, partition-pruned index
    * scan, per-query top-k), results appended to `outDir` in the ONE
    * answer schema (query_id, vec_id, rank, score, tier) regardless of
    * tier. MIGRATION NOTE: outDirs written by a pre-r14 engine carry
    * the fixed tiers' native score column (cos/qcos/adist) — resuming a
    * stream onto such an outDir now FAILS FAST at stream definition
    * ([[checkServeOutDirSchema]], ADVICE r14) with a migration message;
    * point it at a fresh directory. The batch twin of ServeVectorIndex:
    * same index files, same ranking arithmetic, so online answers cannot
    * drift from offline ones (StreamingSpec pins per-query equality with
    * annIvfServe). `foreachBatch` rather than a stream-static join
    * because per-query top-k needs a rank window, which append-mode
    * streaming can't express — and each request batch is a complete,
    * self-contained serving job anyway. `tier` selects the serving
    * arithmetic per stream — any of the five batched tiers ("float",
    * "binary", "int8", "pq", "pq_rerank") so a deployment can run one
    * request stream per cost tier against the same persisted index —
    * or "auto", which routes each request through the learned tier
    * weights (loaded from `stateDir` per micro-batch, so a TierPass
    * landing mid-stream re-routes the NEXT batch — the reference's
    * feedback-persists contract) and dispatches each routed group to
    * its tier's batched plan (SimilarityOps.routeAndServe — where
    * `tier` records each query's routed arm, vs the fixed tier name
    * here). Auto routes at q200's BATCH prices by
    * default (`batchCost` — this stream dispatches the batched plans,
    * so their amortized prices are the correct cost model). */
  def annServe(
      queries: DataFrame, indexDir: String, outDir: String,
      nprobe: Int = graft.operators.SimilarityOps.NProbeServe,
      tier: String = "float", stateDir: Option[String] = None,
      batchCost: Boolean = true, depthAware: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.SimilarityOps
    val known = SimilarityOps.Tiers.toSet + "auto"
    require(known(tier), s"unknown serve tier: $tier (one of ${known.toSeq.sorted})")
    // Fail FAST on a pre-r14 outDir (ADVICE r14): those carry the fixed
    // tiers' native score column (cos/qcos/adist); appending the unified
    // (query_id, vec_id, rank, score, tier) schema next to those files
    // would silently produce exactly the mixed-schema parquet the
    // normalization exists to prevent — and the only protection was a
    // doc comment. Checked once at stream DEFINITION (not per batch):
    // this writer owns outDir from here on, so the schema can't change
    // underneath a running stream.
    checkServeOutDirSchema(queries.sparkSession, outDir)
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val reqs = batch.select("query_id", "embedding")
          // Every tier lands in ONE answer schema — (query_id, vec_id,
          // rank, score, tier) — so an outDir is restart-safe across
          // tier changes (ADVICE r13: the fixed tiers used to append
          // their native score column — cos/qcos/adist — so restarting
          // a stream with a different tier produced mixed-schema
          // parquet downstream reads won't reconcile). `score` keeps
          // tier-native semantics (adist ranks ascending) — compare
          // ranks, not scores, across tiers, as in routeAndServe.
          val answered = tier match {
            case "auto" =>
              val w = stateDir.map(SimilarityOps.loadTierState(s, _))
                .getOrElse(Map.empty[String, Long])
              // batchCost defaults TRUE here (unlike routeAndServe):
              // the stream dispatches the batched micro-batch plans, so
              // q200's amortized prices are the correct cost model.
              // Dispatch stays EAGER (concurrent per-tier actions):
              // ServeProbe measured the lazy single-job union faster
              // only on an idle host (1033 vs 1092 ms) and 15–25%
              // slower under co-tenant load (1593 vs 1342; 1983 vs
              // 1574) — concurrent actions hold scheduler slots better
              // when contended, which is what production looks like.
              // sliceAware rides batchCost (r15): when routing at batch
              // prices, slices too small to repay an arm's plan floor
              // fold into the surviving arms (the q203 census — fewer,
              // fuller plans per micro-batch).
              // depthAware (r17, NON-DEFAULT like the q207 float option):
              // compose the q209 probe-depth rule into the routed
              // dispatch — each query's arm probes at its own margin
              // depth.
              SimilarityOps.routeAndServe(s, indexDir, reqs, w, nprobe,
                batchCost = batchCost, sliceAware = batchCost,
                depthAware = depthAware)
            case "binary" =>
              SimilarityOps.annBinaryServeMany(s, indexDir, reqs, nprobe)
                .withColumnRenamed("cos", "score").withColumn("tier", lit(tier))
            case "int8" =>
              SimilarityOps.annInt8ServeMany(s, indexDir, reqs, nprobe)
                .withColumnRenamed("qcos", "score").withColumn("tier", lit(tier))
            case "pq" =>
              SimilarityOps.annPqServeMany(s, indexDir, reqs, nprobe)
                .withColumnRenamed("adist", "score").withColumn("tier", lit(tier))
            case "pq_rerank" =>
              SimilarityOps.annPqRerankServeMany(s, indexDir, reqs, nprobe)
                .withColumnRenamed("cos", "score").withColumn("tier", lit(tier))
            case _ =>
              SimilarityOps.annIvfServeMany(s, indexDir, reqs, nprobe)
                .withColumnRenamed("cos", "score").withColumn("tier", lit(tier))
          }
          answered.write.mode("append").parquet(outDir)
        }
      }
  }

  /** The one streaming answer schema's column names — what every
    * [[annServe]] batch appends, and what an existing outDir must
    * already carry to be resumed onto. */
  private val ServeAnswerCols = Seq("query_id", "vec_id", "rank", "score", "tier")

  /** Refuse to append the unified answer schema onto an outDir whose
    * existing parquet carries a different column set (the pre-r14
    * per-tier native layouts). Only NAMES are compared: query_id keeps
    * the caller's type by design, and score is the tier's native value
    * either way. An empty or absent outDir passes. */
  private[graft] def checkServeOutDirSchema(
      spark: org.apache.spark.sql.SparkSession, outDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val hasParquet = fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasParquet) return
    val have = spark.read.parquet(outDir).schema.fieldNames.toSeq
    require(have == ServeAnswerCols,
      s"annServe outDir $outDir already holds parquet with columns " +
        s"(${have.mkString(", ")}) — not the unified answer schema " +
        s"(${ServeAnswerCols.mkString(", ")}). This is a pre-r14 outDir " +
        "carrying a tier's native score column; appending would create " +
        "mixed-schema parquet downstream reads won't reconcile. Point the " +
        "stream at a fresh outDir (or migrate the old files) instead.")
  }

  /** Streaming mixture-drift monitor: the live feed that tells a corpus
    * owner WHEN to re-run the batch mixture diagnostics (q112 drift,
    * q120 weights) — per hour-window, per source: document/token counts,
    * each source's token SHARE of its window, and the drift of that
    * share against a frozen baseline table (source, base_share) from the
    * last release. The windowed aggregate is the standard watermarked
    * tumbling agg (append mode — each (window, source) row emits exactly
    * once, when the watermark closes the window; all of a window's
    * sources expire on the same watermark advance, so a window is always
    * complete within one micro-batch). Shares need the window TOTAL — a
    * second aggregation over a streaming aggregate, which append mode
    * can't chain — so the per-window normalization runs in foreachBatch
    * over the just-closed windows (the annServe pattern): a few rows per
    * window, joined to the broadcast baseline.
    *
    * At scale: the streaming state is |open windows|·|sources| rows, the
    * foreachBatch job touches only closed windows, and the baseline is a
    * release artifact — nothing grows with stream length. */
  def mixtureMonitor(
      docs: DataFrame, tsCol: String, delay: String,
      baseline: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs
      .select(col("source"), col(tsCol),
        size(graft.textops.TextOps.tokenize(col("text"))).cast("long").as("n"))
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), "1 hour"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
      .select(col("window.start").as("win_start"), col("source"),
        col("n_docs"), col("n_tokens"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val tot = batch.groupBy("win_start")
            .agg(sum("n_tokens").as("win_tokens"))
          batch.join(tot, "win_start")
            .join(broadcast(baseline), Seq("source"), "left")
            .select(col("win_start"), col("source"), col("n_docs"), col("n_tokens"),
              (col("n_tokens").cast("double") / col("win_tokens").cast("double"))
                .as("share"),
              ((col("n_tokens").cast("double") / col("win_tokens").cast("double")) -
                coalesce(col("base_share"), lit(0.0))).as("share_delta"))
            .write.mode("append").parquet(outDir)
        }
      }

  /** Streaming quality gate: score each arriving document with a FROZEN
    * persisted model (`graft.TrainQualityModel` output). The 1-row model
    * is read once driver-side and inlined as literals, so the gate is a
    * stateless, shuffle-free row-local projection — it composes in front
    * of (or behind) the LSH dedup gate on the same ingest stream. The
    * raw-feature derivation and σ come from TextAnalysisOps itself
    * (lrRawOf / scoreColumnsFor — one definition, so the batch serve path
    * and this gate can't drift; StreamingSpec pins stream == batch). */
  def qualityGate(docs: DataFrame, model: org.apache.spark.sql.Row): DataFrame = {
    import graft.operators.TextAnalysisOps
    val (p, pred) = TextAnalysisOps.scoreColumnsFor(model)
    TextAnalysisOps.lrRawOf(docs)
      .select(col("doc_id"), p.as("p_quality"), pred.as("pred_label"))
  }

  /** Streaming Gopher-rule gate: the q127 heuristics as an ingest filter.
    * Every flag is row-local column arithmetic over the SAME
    * [[graft.operators.TextAnalysisOps.gopherFlagsOf]] derivation the
    * batch ablation uses (batch and stream can't drift), so the gate is
    * stateless — no watermark, no shuffle, pure codegen projection per
    * micro-batch. Emits the per-rule flags plus the keep verdict
    * (kept = no rule fired); a production ingest filters on `kept` and
    * ships the flag columns to the q127 monitoring sink. */
  def gopherGate(docs: DataFrame): DataFrame = {
    import graft.operators.TextAnalysisOps
    val flagCols = Seq("f_word_count", "f_mean_word_len", "f_symbol_ratio",
      "f_bullet_lines", "f_ellipsis_lines", "f_alpha_words", "f_stopwords")
    TextAnalysisOps.gopherFlagsOf(docs)
      .withColumn("kept", !flagCols.map(col).reduce(_ || _))
  }

  /** Streaming cluster-occupancy drift monitor — the live twin of the
    * q142 staleness audit. Each arriving vector is assigned to its
    * nearest FROZEN centroid (the persisted index's coarse quantizer,
    * read once driver-side and inlined as literals — the qualityGate
    * pattern, so assignment is a stateless row-local projection: K
    * zip_with/aggregate squared-L2 distances and a struct-min argmin
    * with ties to the lowest cluster id, serving-tier double
    * arithmetic like the ANN gates). Occupancy aggregates per
    * hour-window (watermarked, append mode), and the foreachBatch
    * normalization — the mixtureMonitor pattern — emits per (window,
    * cluster) the count, share, baseline share, delta, and the
    * window's total-variation distance against the baseline occupancy:
    *   TVD = ½·(Σ_present |share − base| + (1 − Σ_present base)),
    * the second term charging clusters the window never hit (their
    * whole baseline mass is missing — a window that collapses into two
    * hot cells maximally drifts, which is exactly the probe-pruning
    * failure q142's scaladoc warns about). Alert on tvd to schedule
    * retraining/compaction.
    *
    * At scale: streaming state is |open windows|·K rows; the
    * foreachBatch job touches only closed windows; centroids and
    * baseline are release artifacts. */
  def clusterDriftMonitor(
      vecs: DataFrame, tsCol: String, delay: String,
      centroids: DataFrame, baseline: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cents = centroids
      .select(col("cluster").cast("long"), col("pos").cast("int"),
        col("c").cast("double"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
      .toSeq.sortBy(_._1)
    val dists = array(cents.map { case (cid, cv) =>
      struct(
        aggregate(
          zip_with(col("embedding"), array(cv.map(lit).toIndexedSeq: _*),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, x) => acc + x).as("dist"),
        lit(cid).as("cluster"))
    }: _*)
    vecs
      .select(col(tsCol), array_min(dists).getField("cluster").as("cluster"))
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), "1 hour"), col("cluster"))
      .agg(count(lit(1)).as("n_vecs"))
      .select(col("window.start").as("win_start"), col("cluster"), col("n_vecs"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val tot = batch.groupBy("win_start").agg(sum("n_vecs").as("win_total"))
          val shares = batch.join(tot, "win_start")
            .join(broadcast(baseline), Seq("cluster"), "left")
            .withColumn("share",
              col("n_vecs").cast("double") / col("win_total").cast("double"))
            .withColumn("base", coalesce(col("base_share"), lit(0.0)))
            .withColumn("share_delta", col("share") - col("base"))
          val tvd = shares.groupBy("win_start")
            .agg(((sum(abs(col("share_delta"))) +
              (lit(1.0) - sum(col("base")))) / 2).as("tvd"))
          shares.join(tvd, "win_start")
            .select(col("win_start"), col("cluster"), col("n_vecs"),
              col("share"), col("base").as("base_share"),
              col("share_delta"), col("tvd"))
            .write.mode("append").parquet(outDir)
        }
      }
  }

  /** Gap-based sessions via the native session_window (30-minute gap).
    * Boundary semantics differ slightly from the batch formulation
    * (EventsOps.userSessions): session_window splits at gaps >= 30 min on
    * microsecond timestamps, the batch twin at gaps > 30 min on
    * second-floored epochs — identical except for events landing exactly
    * on (or within a second of) the boundary. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.r6(graft.operators.dsum(col("value"))).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"), col("sum_value"))
}
