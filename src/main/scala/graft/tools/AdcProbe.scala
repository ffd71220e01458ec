package graft.tools

/** `runMain graft.tools.AdcProbe [sfDir]` — floor-pin harness for the
  * ADC query family drift (VERDICT r13 "what's wrong" #3: q100/q104/q111
  * read +10–13% on clean runs between r12 and r13 with untouched code;
  * suspect was cache residency shifted by the indexMeta checkpoint
  * blocks — which cannot act during the bench's query phase, since the
  * serve phase that creates them runs AFTER all queries).
  *
  * The Q50Probe protocol generalized: time the three targets on a fresh
  * session (min of 5 after one warmup pass), replay the ENTIRE sorted
  * query suite once (the bench's session state: memos, checkpoint
  * blocks, JIT, cleaner backlog), re-time, release the memos, re-time —
  * with the block-manager storage footprint printed at each step. The
  * resulting floors go to SCALE.md so a future artifact delta can be
  * read against a pinned idle baseline instead of re-litigated.
  */
object AdcProbe {
  val Targets = Seq("q100_ann_pq_adc", "q104_ann_ivfpq", "q111_ann_ivfpq_rerank")

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Cli.session()
    graft.Cli.quietBoundedWindowWarnings()

    def storage(): String = {
      val rdds = spark.sparkContext.getPersistentRDDs
      val status = spark.sparkContext.getExecutorMemoryStatus.values.head
      f"rdds=${rdds.size} memUsed=${(status._1 - status._2) / 1e6}%.0fMB " +
        f"memFree=${status._2 / 1e6}%.0fMB"
    }
    def time(tag: String): Map[String, Double] =
      Targets.map { n =>
        val ts = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[adcprobe] $tag $n min=${ts.min}%.3f " +
          f"passes=${ts.map(t => f"$t%.3f").mkString(",")} ${storage()}")
        n -> ts.min
      }.toMap

    Targets.foreach(n => graft.SparkEntry.queries(n)(spark, dir).count()) // warmup
    val cold = time("cold")
    val rest = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(Targets.contains)
    println(s"[adcprobe] replaying ${rest.size} other queries (bench session state)")
    // NonFatal only (ADVICE r14): swallowing InterruptedException or a
    // fatal VM error here would mask a hung/broken replay and mis-pin
    // the SCALE.md floors — let those kill the probe loudly. A NonFatal
    // query failure is logged by name so a partial replay is visible.
    rest.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, dir).count()
      catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[adcprobe] replay FAILED for $n: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"[adcprobe] after suite: ${storage()}")
    val warm = time("warm")
    graft.operators.Memos.release(dir)
    val released = time("released")
    val line = Targets.map { n =>
      f""""$n":{"cold":${cold(n)}%.3f,"warm":${warm(n)}%.3f,"released":${released(n)}%.3f}"""
    }.mkString("{", ",", "}")
    println(line)
    spark.stop()
  }
}
