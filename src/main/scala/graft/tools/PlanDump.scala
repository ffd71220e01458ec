package graft.tools

/** Dev tool for the optimization rounds:
  * `sbt "runMain graft.tools.PlanDump <sfDir> <tag> <passes> q211,q212,..."`
  * For each named declared query: untimed warmup pass, `passes` timed
  * passes (Bench's steady-state protocol, min reported), then the
  * EXECUTED formatted physical plan — AQE-finalized via the same
  * QueryExecution that ran — written to `plans/r18/<name>_<tag>.txt`
  * (the judge-auditable before/after evidence). `tag` of "-" times
  * without writing plan files. Query names may be unique prefixes
  * (q211) of the declared keys. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <tag|-> <passes> <q1,q2,...>")
    val dir = args(0)
    val tag = args(1)
    val passes = args(2).toInt
    val all = graft.SparkEntry.queries
    val names = args(3).split(",").toSeq.map { p =>
      all.keys.filter(_.startsWith(p)).toSeq match {
        case Seq(one) => one
        case Seq() => sys.error(s"no declared query matches prefix $p")
        case many => many.find(_ == p).getOrElse(
          sys.error(s"ambiguous prefix $p: ${many.mkString(", ")}"))
      }
    }
    val spark = graft.Cli.session()
    val outDir = java.nio.file.Paths.get("plans/r18")
    if (tag != "-") java.nio.file.Files.createDirectories(outDir)
    // Optional job trace (SPARK_GRAFT_JOBTRACE=1): per-job wall ms during
    // the LAST timed pass of each query, so plan-floor time can be split
    // into Spark jobs vs driver-side planning gaps.
    val trace = sys.env.get("SPARK_GRAFT_JOBTRACE").contains("1")
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    if (trace) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(j.jobId)
          if (t0 != 0L) jobLog.add(
            f"job ${j.jobId} ${(System.nanoTime() - t0) / 1e6}%.1f ms")
        }
      })
    // Untimed warmup of every named query first (memo builds + JIT).
    names.foreach(n => all(n)(spark, dir).count())
    val results = names.map { name =>
      spark.sparkContext.setJobDescription(name)
      val ts = (1 to passes).map { i =>
        if (trace && i == passes) jobLog.clear()
        val t0 = System.nanoTime()
        all(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      if (trace) {
        Thread.sleep(200) // let the last job-end event drain
        println(s"[jobtrace] $name:")
        jobLog.forEach(l => println(s"  $l"))
      }
      spark.sparkContext.setJobDescription(null)
      if (tag != "-") {
        val df = all(name)(spark, dir)
        df.queryExecution.toRdd.count() // finalize AQE on THIS execution
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      name -> ts
    }
    results.foreach { case (name, ts) =>
      println(f"[plandump] $name min=${ts.min}%.3f passes=" +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
