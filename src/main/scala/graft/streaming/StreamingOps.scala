package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
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
