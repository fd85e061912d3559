package graft

/** Enforced version of the PlanAudit sweep: every registered query's
  * physical plan must be free of the hard anti-patterns — Expand
  * (mixed-distinct aggregates), CartesianProduct (unbroadcast cross),
  * ScalaUDF / BatchEvalPython (codegen black boxes), and the
  * whole-group-buffering exact percentile aggregates — except the
  * known by-design carve-outs. Planning only (no collect): the
  * initial physical plan is inspected, which is where these nodes
  * appear or don't; AQE re-planning never INTRODUCES one of them.
  * Shuffled joins are deliberately not enforced here (legitimate for
  * fact-to-fact work) — PlanAudit prints them for human review.
  */
class PlanHygieneSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  // flag -> queries allowed to carry it, with the reason pinned where
  // the carve-out is granted.
  private val allowed: Map[String, Set[String]] = Map(
    // ROLLUP/CUBE grouping sets plan an Expand by definition.
    "Expand" -> Set("q44_rollup_pricing", "q55_cube_summary"))

  private val flags = Seq("Expand", "CartesianProduct", "ScalaUDF",
    "BatchEvalPython", "median(", "percentile(")

  test("every registered query plans free of hard anti-patterns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      flags.filter(f => plan.contains(f) && !allowed.getOrElse(f, Set.empty)(name))
        .map(f => s"$name: $f")
    }
    assert(offenders.isEmpty,
      s"anti-patterns outside the allowlist:\n${offenders.mkString("\n")}")
  }
}
