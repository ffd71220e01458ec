package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.retrieve.Retrievers
import graft.router.Router

/** Property tests over the operators' algebraic invariants (SURVEY.md §5):
  * top-k stability, min-max normalization range/degenerate cases, bandit
  * delta conservation. Raw scalacheck (no scalatestplus bridge in the
  * offline cache); each property runs 20 Spark-backed cases.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val scoreGen: Gen[List[Double]] =
    Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-5.0, 5.0)))

  test("topK: stable — ties broken by ascending doc_idx, ranks contiguous") {
    check(Prop.forAll(scoreGen, Gen.choose(1, 10)) { (scores, k) =>
      val df = scores.zipWithIndex
        .map { case (s, i) => ("q", i.toLong, i.toLong, s) }
        .toDF("query_id", "doc_id", "doc_idx", "score")
      val got = Retrievers.topK(df, k).orderBy("rank").collect()
        .map(r => (r.getAs[Long]("doc_idx"), r.getAs[Double]("score"), r.getAs[Int]("rank")))
      val expected = scores.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(k)
      got.length == expected.length &&
        got.zip(expected).zipWithIndex.forall {
          case (((gIdx, gScore, rank), (eScore, eIdx)), pos) =>
            gIdx == eIdx.toLong && gScore == eScore && rank == pos + 1
        }
    })
  }

  test("minMaxNorm: range [0,1]; constant → zeros; extremes map to 1/0") {
    check(Prop.forAll(scoreGen) { scores =>
      val df = scores.zipWithIndex
        .map { case (s, i) => ("q", i.toLong, i.toLong, s) }
        .toDF("query_id", "doc_id", "doc_idx", "score")
      val got = Retrievers.minMaxNorm(df).orderBy("doc_idx").collect()
        .map(_.getAs[Double]("score"))
      val inRange = got.forall(v => v >= 0.0 && v <= 1.0)
      if (scores.distinct.size == 1) inRange && got.forall(_ == 0.0)
      else inRange &&
        got(scores.indexOf(scores.max)) == 1.0 &&
        got(scores.indexOf(scores.min)) == 0.0
    })
  }

  test("bandit deltas: conserve to zero; all-tied rows contribute nothing") {
    val armGen = for {
      v <- Gen.chooseNum(0.0, 1.0); k <- Gen.chooseNum(0.0, 1.0)
      h <- Gen.chooseNum(0.0, 1.0)
    } yield (v, k, h)
    check(Prop.forAll(Gen.listOfN(5, armGen)) { rows =>
      val df = rows.toDF("vector_total", "keyword_total", "hybrid_total")
      val d = Router.updateDeltas(df, lr = 0.25).collect()(0)
      val total = d.getDouble(0) + d.getDouble(1) + d.getDouble(2)
      val conserved = math.abs(total) < 1e-9
      if (rows.forall { case (v, k, h) => v == k && k == h })
        conserved && d.getDouble(0) == 0.0 && d.getDouble(1) == 0.0 && d.getDouble(2) == 0.0
      else conserved
    })
  }
}
