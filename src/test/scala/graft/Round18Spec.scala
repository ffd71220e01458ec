package graft

/** Round-18 pins — absolute serve-wall envelopes (VERDICT r17 #2/#3):
  * the ratio pins are structurally blind to a proportional wall rise
  * (the r15→r17 pq_batch20 ratchet passed every ratio check), so the
  * registry gained two absolute-milliseconds sections — `walls`
  * (ServeProbe context, checked by tools/check_pins.py) and
  * `bench_walls` (bench context, folded into Bench's in-artifact
  * pins_ok). These tests pin the section NAMES and the
  * fail-on-unmeasured semantics so neither can silently rot out of
  * the verdict.
  */
class Round18Spec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  // ---- absolute-wall pin registry (VERDICT r17 #2/#3) -----------------------

  test("pins.json carries walls + bench_walls; bench_walls names are " +
    "exactly the serve keys Bench emits; the wall verdict FLIPS on a " +
    "doctored envelope or an unmeasured registered wall") {
    val (calSf, ratios, benchWalls) = Bench.loadPinsEnvelopes("tools/pins.json")
      .getOrElse(fail("tools/pins.json must parse"))
    assert(calSf == "sf0.1", s"calibration SF drifted: $calSf")
    assert(ratios.size == 10, s"ratio registry drifted: ${ratios.keys.toSeq.sorted}")
    // The bench-context wall names MUST be keys Bench.main writes into its
    // serve table before the pins_ok verdict is computed — a typo here
    // would read as permanent FAIL (good) but a renamed Bench key would
    // too, so the names are pinned literally on both sides.
    assert(benchWalls.keySet == Set("int8_p50_ms", "float_p50_ms",
      "pq_p50_ms", "batch20_ms", "pq_batch20_ms"),
      s"bench_walls names drifted: ${benchWalls.keys.toSeq.sorted}")
    benchWalls.foreach { case (k, (lo, hi)) =>
      assert(lo > 0 && hi > lo, s"degenerate envelope for $k: [$lo, $hi]")
    }
    val mid = benchWalls.map { case (k, (lo, hi)) => k -> (lo + hi) / 2 }
    assert(Bench.pinsVerdict(mid, benchWalls), "mid-envelope walls must pass")
    val doctored = benchWalls.updated("pq_batch20_ms", (0.0001, 0.0002))
    assert(!Bench.pinsVerdict(mid, doctored),
      "a doctored wall envelope must flip the verdict")
    assert(!Bench.pinsVerdict(mid - "int8_p50_ms", benchWalls),
      "an unmeasured registered wall must read FAIL, not healthy")

    // The ServeProbe-context `walls` section: same raw_ms names ServeProbe
    // --pins prints (ratios cancel a proportional rise; these don't).
    import org.json4s._
    val root = org.json4s.jackson.JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("tools/pins.json")), "UTF-8"))
    val wallNames = root \ "walls" match {
      case JObject(fields) => fields.map(_._1).toSet
      case _ => fail("pins.json lost its walls section")
    }
    val tiers = Seq("float", "int8", "binary", "pq", "pq_rerank")
    val expected = tiers.map(t => s"${t}_batch20_ms").toSet ++
      tiers.map(t => s"${t}_1row_batch_ms").toSet + "hybrid_batch5_ms"
    assert(wallNames == expected, s"walls names drifted: ${wallNames.toSeq.sorted}")
  }
}
