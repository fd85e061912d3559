package graft

import org.apache.spark.sql.SparkSession

/** Plan anti-pattern sweep across EVERY registered query: prints one
  * line per query flagging shapes that hurt at scale — Expand
  * (mixed-distinct aggregates), CartesianProduct (unbroadcast cross),
  * ScalaUDF / BatchEvalPython (codegen black boxes), and shuffled
  * joins (SortMergeJoin/ShuffledHashJoin — legitimate for
  * fact-to-fact, suspicious for dim hops). Run after a wave of query
  * work; PlanSpec pins the per-query conclusions this sweep surfaces.
  *
  * The allowlist of by-design flags, WITH the per-query rationale,
  * lives in ONE place: `PlanHygieneSpec.allowed` (the enforced
  * version of this sweep — anything outside it fails the suite).
  * This main stays as the human-readable printout; the tally SURVEY
  * cites is derivable from the spec alone. Note this sweep reads the
  * POST-AQE plan at sf0.001, where AQE converts most of the
  * allowlisted corpus⋈corpus SMJs to broadcast — so its "clean"
  * count can exceed the spec's initial-plan allowlist (round-7
  * tally: 152/155 clean; flagged = q44/q55 grouping-set Expand +
  * q94's deliberate salted SMJ).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // "median(" / "percentile(" catch the whole-group-buffering exact
    // percentile aggregates at any position in the function list,
    // including first and partial_-prefixed (use operators.ExactMedian
    // instead). Bounded percentile_approx( never contains the
    // substring "percentile(" — an underscore follows, not a paren.
    val flags = Seq("Expand", "CartesianProduct", "ScalaUDF",
      "BatchEvalPython", "SortMergeJoin", "ShuffledHashJoin",
      "median(", "percentile(")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.001")
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0) // final post-AQE section only
        val hits = flags.filter(plan.contains)
          .map(f => s"$f=${plan.sliding(f.length).count(_ == f)}")
        println(f"$name%-35s ${if (hits.isEmpty) "clean" else hits.mkString(" ")}")
      } catch {
        case e: Throwable => println(f"$name%-35s ERROR ${e.getClass.getSimpleName}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
