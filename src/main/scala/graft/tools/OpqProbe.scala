package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** `sbt "runMain graft.tools.OpqProbe [sfDir...]"` — measure whether the
  * round-8 residual geometry, and an OPQ-lite rotation on top of it
  * (seeded Walsh–Hadamard × ±1 diagonal before subspace splitting), buy
  * composed IVF-PQ recall at equal bits (VERDICT r7 #1 / stretch #8).
  *
  * Two measurements per dir:
  *   1. the declared single-query q105 curve for each geometry (exactly
  *      what the oracle pins — but one query's recall@50 moves in steps
  *      of 0.02, so single-query deltas are noise-dominated);
  *   2. MEAN recall over the first NQueries vectors as queries, computed
  *      driver-side from the collected models (corpus ≤ a few thousand
  *      rows at probe SFs) — the statistically meaningful comparison
  *      that decides whether a geometry is promoted.
  */
object OpqProbe {
  val NQueries = 50

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = graft.Cli.session()

    dirs.foreach { dir =>
      // ---- collected model state ----
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
        .toMap
      val (kcentF, kasgF) = SimilarityOps.kmeansModel(spark, dir)
      val kcent = kcentF.collect().groupBy(_.getAs[Long]("cluster"))
        .view.mapValues { rs =>
          val a = new Array[Double](64)
          rs.foreach(r => a(r.getAs[Int]("pos")) = r.getAs[Double]("c")); a
        }.toMap
      val kasg = kasgF.collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
      val rot = {
        val m = Array.ofDim[Double](64, 64)
        SimilarityOps.rotTableFrame(spark).collect()
          .foreach(r => m(r.getAs[Int]("i"))(r.getAs[Int]("j")) = r.getAs[Double]("r"))
        m
      }
      def rotate(v: Array[Double]): Array[Double] =
        Array.tabulate(64)(i => (0 until 64).map(j => rot(i)(j) * v(j)).sum)

      case class Geo(name: String, cb: Map[(Long, Long), Array[Double]],
          codes: Map[(Long, Long), Long], resid: Boolean, rotated: Boolean)
      def collectGeo(name: String, m: (org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame), resid: Boolean, rotated: Boolean): Geo = {
        val cb = m._1.collect().groupBy(r => (r.getAs[Long]("sub"), r.getAs[Long]("code")))
          .view.mapValues { rs =>
            val a = Array.fill(64)(Double.NaN)
            rs.foreach(r => a(r.getAs[Int]("pos")) = r.getAs[Double]("c")); a
          }.toMap
        val codes = m._2.collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub")) -> r.getAs[Long]("code"))
          .toMap
        Geo(name, cb, codes, resid, rotated)
      }
      val geos = Seq(
        collectGeo("raw", SimilarityOps.rawPqModel(spark, dir), resid = false, rotated = false),
        collectGeo("residual", SimilarityOps.pqModel(spark, dir), resid = true, rotated = false),
        collectGeo("rotated", SimilarityOps.rotatedPqModel(spark, dir), resid = true, rotated = true))

      // ---- mean recall over NQueries queries ----
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
      }
      val ids = vecs.keys.toSeq.sorted
      val queries = ids.take(NQueries)
      val k = SimilarityOps.TopK
      val sweep = SimilarityOps.NProbeSweep

      val sums = collection.mutable.Map[(String, Int), Double]().withDefaultValue(0.0)
      queries.foreach { qid =>
        val qv = vecs(qid)
        val exact = ids.map(id => id -> cos(vecs(id), qv))
          .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
        val cellRank = kcent.toSeq.map { case (cl, c) =>
          cl -> vecs(qid).indices.map(i => { val d = qv(i) - c(i); d * d }).sum
        }.sortBy { case (cl, d) => (d, cl) }.map(_._1)
        geos.foreach { g =>
          // per-cell ADC tables for this query under this geometry
          val dtab = kcent.keys.map { cl =>
            val qr0 = Array.tabulate(64)(i => if (g.resid) qv(i) - kcent(cl)(i) else qv(i))
            val qr = if (g.rotated) rotate(qr0) else qr0
            cl -> g.cb.map { case (key, c) =>
              key -> c.indices.collect { case i if !c(i).isNaN =>
                val d = qr(i) - c(i); d * d }.sum
            }
          }.toMap
          sweep.foreach { np =>
            val probed = cellRank.take(np).toSet
            val cand = ids.filter(id => probed.contains(kasg(id)))
            val top = cand.map { id =>
              id -> (0L until SimilarityOps.PqM.toLong)
                .map(s => dtab(kasg(id))((s, g.codes((id, s))))).sum
            }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)
            sums((g.name, np)) += top.count(exact.contains).toDouble / k
          }
        }
      }

      println(s"[opq] $dir mean recall@$k over ${queries.size} queries")
      println("| nprobe | " + geos.map(_.name).mkString(" | ") + " |")
      sweep.foreach { np =>
        println("| " + np + " | " +
          geos.map(g => f"${sums((g.name, np)) / queries.size}%.3f").mkString(" | ") + " |")
      }
      graft.operators.Memos.release(dir)
    }
    spark.stop()
  }
}
