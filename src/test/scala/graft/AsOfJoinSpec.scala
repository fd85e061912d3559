package graft

import graft.operators.AsOfJoin

/** As-of join edge semantics, independent of the q51 dataset shape. */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def run(
      probe: Seq[(String, Long, String)],
      build: Seq[(String, Long, Long, String)]): Map[String, Option[(Long, String)]] = {
    val p = probe.toDF("k", "t", "probe_tag")
    val b = build.toDF("k", "t", "seq", "payload")
    AsOfJoin.asOf(p, "t", b, "t", "k", "seq")
      .collect()
      .map { r =>
        val m = Option(r.getStruct(r.fieldIndex("__matched")))
        r.getString(r.fieldIndex("probe_tag")) ->
          m.map(s => (s.getLong(s.fieldIndex("seq")), s.getString(s.fieldIndex("payload"))))
      }.toMap
  }

  test("picks latest build at or before probe time; none -> null") {
    val got = run(
      probe = Seq(("A", 100L, "p1"), ("A", 5L, "p2"), ("B", 50L, "p3")),
      build = Seq(("A", 10L, 1L, "a10"), ("A", 90L, 2L, "a90"), ("A", 150L, 3L, "a150")))
    assert(got("p1").contains((2L, "a90"))) // 90 <= 100 < 150
    assert(got("p2").isEmpty) // nothing at or before t=5
    assert(got("p3").isEmpty) // key B has no build rows
  }

  test("build at exactly the probe time matches (inclusive)") {
    val got = run(
      probe = Seq(("A", 10L, "p")),
      build = Seq(("A", 10L, 1L, "same-t")))
    assert(got("p").contains((1L, "same-t")))
  }

  test("ties at the same build time resolved by highest tiebreak") {
    val got = run(
      probe = Seq(("A", 20L, "p")),
      build = Seq(("A", 10L, 1L, "low"), ("A", 10L, 7L, "high")))
    assert(got("p").contains((7L, "high")))
  }

  test("property: as-of join equals the brute-force definition on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val keyGen = Gen.oneOf("A", "B", "C")
    val rowGen = for {
      k <- keyGen; t <- Gen.chooseNum(0L, 30L); s <- Gen.chooseNum(0L, 1000L)
    } yield (k, t, s)
    val prop = Prop.forAll(Gen.listOfN(25, rowGen), Gen.listOfN(25, rowGen)) {
      (probeRows, buildRows) =>
        // unique probe tags; builds keep (k, t, seq) with seq made unique
        val probes = probeRows.zipWithIndex.map { case ((k, t, _), i) => (k, t, s"p$i") }
        val builds = buildRows.zipWithIndex.map { case ((k, t, s), i) => (k, t, s * 100 + i, s"b$i") }
        val got = run(probes, builds)
        probes.forall { case (k, t, tag) =>
          val expect = builds.filter(b => b._1 == k && b._2 <= t)
            .sortBy(b => (b._2, b._3)).lastOption.map(b => (b._3, b._4))
          got(tag) == expect
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }
}
