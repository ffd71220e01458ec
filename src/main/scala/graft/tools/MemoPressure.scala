package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated}
import org.apache.spark.sql.SparkSession

/** Memory-pressure proof for the memo lifecycle (VERDICT r8 stretch #8):
  * under a CONSTRAINED unified-memory budget (`spark.testing.memory` —
  * Spark's own hook for bounding the MemoryManager below the JVM heap),
  * holding two corpora's memo caches at once causes eviction churn, and
  * `Memos.release(dir)` between corpora prevents it. Run in its own JVM
  * (Round9Spec forks it) because the budget must be set at context
  * creation.
  *
  * Protocol (the listener counts cached-RDD blocks leaving memory —
  * eviction to disk or outright drop; each phase reads its own window of
  * the counter, so release's intentional unpersists are never counted as
  * churn):
  *   1. build corpus B's memos (the session's resident working set);
  *   2. build corpus A's memos on top — under the tight budget the LRU
  *      store now churns (this run must observe > 0 drops, or the budget
  *      isn't binding and the experiment is vacuous — fail loudly);
  *   3. `Memos.release(dirA)` — done with corpus A;
  *   4. re-run corpus B's queries: with A's blocks released, the rebuild
  *      must complete with ZERO drops. That zero is the proof: the same
  *      work that churned in phase 2 is churn-free once release returns
  *      the storage pool.
  * Exits nonzero (require) if any assertion fails; prints one verdict
  * line. */
object MemoPressure {
  /** Memo-heavy declared queries: shingles/bands/pairs/labels (dedup
    * family), the k-means + PQ model caches (similarity family), and the
    * r18 shared-intermediate memos (minhash signature components,
    * verbatim window sets, language-ID trigram frames) — added when the
    * r18 lineage truncation shrank the original five queries' resident
    * set below the budget (the vacuous-run guard fired; the new memos
    * restore a binding working set AND put their own release hooks under
    * the churn proof). */
  val TouchQueries = Seq(
    "q42_minhash_dup_pairs", "q159_dup_clusters_fixpoint",
    "q75_dedup_keep_best", "q51_ann_ivf", "q98_pq_codes",
    "q138_minhash_calibration", "q83_verbatim_decontam", "q33_langid")

  def main(args: Array[String]): Unit = {
    val dirA = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val dirB = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val budgetMb = if (args.length > 2) args(2).toLong else 320L
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-memo-pressure")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.testing.memory", (budgetMb * 1024 * 1024).toString)
      .config("spark.testing.reservedMemory", (64L * 1024 * 1024).toString)
      // Tiny protected-storage region: execution pressure may reclaim
      // almost everything cached, which is exactly the regime the proof
      // needs.
      .config("spark.memory.storageFraction", "0.05")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Cli.quietBoundedWindowWarnings()

    val drops = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onBlockUpdated(u: SparkListenerBlockUpdated): Unit = {
        val info = u.blockUpdatedInfo
        // A cached RDD block leaving memory = eviction churn (to disk or
        // dropped). Unpersist windows are excluded by phase bookkeeping.
        if (info.blockId.isRDD && !info.storageLevel.useMemory)
          drops.incrementAndGet()
      }
    })
    def runAll(dir: String): Unit =
      TouchQueries.foreach(q => graft.SparkEntry.queries(q)(spark, dir).count())

    // Phase-boundary counter read (ADVICE r9): the async listener bus can
    // deliver a phase's BlockUpdated events after the next phase starts,
    // which would charge them to the wrong window (release's own unpersist
    // removals also match isRDD && !useMemory and must land in the phase-3
    // window, not phase 4's). waitUntilEmpty is private[spark], so drain
    // by stabilization: poll until the counter holds still.
    def settled(): Int = {
      var prev = drops.get(); var stable = 0; var spins = 0
      while (stable < 4 && spins < 200) {
        Thread.sleep(50)
        val cur = drops.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        spins += 1
      }
      prev
    }

    runAll(dirB) // phase 1: resident working set
    val d1 = settled()
    runAll(dirA) // phase 2: second corpus on top — the budget must bind
    // Re-touch B so the LRU ping-pong is exercised both ways.
    runAll(dirB)
    val d2 = settled()
    require(d2 - d1 > 0,
      s"budget not binding: no eviction churn with both corpora cached " +
        s"(budget ${budgetMb}m too large for this testdata) — vacuous run")

    graft.operators.Memos.release(dirA) // phase 3: done with corpus A
    val d3 = settled() // release's own unpersists end here, fully delivered
    runAll(dirB) // phase 4: must be churn-free now
    val d4 = settled()
    require(d4 - d3 == 0,
      s"release did not prevent churn: ${d4 - d3} blocks still evicted " +
        s"after Memos.release(dirA)")
    println(s"""{"memo_pressure":"ok","budget_mb":$budgetMb,""" +
      s""""churn_with_both_corpora":${d2 - d1},"churn_after_release":${d4 - d3}}""")
    spark.stop()
  }
}
