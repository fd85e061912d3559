package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: measured STAGE-BUILD scale probe (VERDICT r11 #1 — the
  * q174 graph-build grade). [[ScaleProbe]] times warm SERVING runs,
  * which deliberately exclude stage builds; this probe does the
  * opposite: it drives each face once at the base dir and once at the
  * `make_scale.py` replica, then prints every [[graft.operators.Staged]]
  * build timing (keys embed the dir, so one JVM holds both sides).
  * The 10x/1x ratio of a staged key is the BUILD scale story for that
  * artifact — for `q174graph|…` it must be ~linear now that the hub
  * layer is NN-Descent + constant-K super-hubs instead of a hub-pair
  * cartesian.
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE", "/root/testdata/sf0.1")
    val scaled = sys.env.getOrElse("SPARK_GRAFT_SCALED", "/tmp/sf1x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val faces =
      if (args.nonEmpty) args.toSeq
      else Seq("q174_ann_graph_search", "q175_ann_graph_delta",
        "q178_ann_graph_compaction", "q180_ann_graph_reinsert",
        // q130 drives the bpe_merges stage (r13 verdict #7): the
        // trainer's 8 sequential argmax jobs are the one staged build
        // family whose 10x ratio was previously unmeasured.
        "q130_bpe_merges")

    Seq(base, scaled).foreach { dir =>
      faces.foreach { name =>
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    graft.operators.Staged.buildTimings.toSeq.sortBy(_._1).foreach {
      case (k, v) =>
        println(f"""STAGE {"key":"$k","sec":$v%.3f}""")
    }

    // NN-Descent hub-layer quality gate (VERDICT r12 #4): the fixed
    // 2-round hub build is exactness-checked only at the small-SF hub
    // counts; this pins the claim AT SCALE — the q174 walk's head-hit
    // count at the scaled dir must stay above the serving non-vacuity
    // floor, so a degenerate routing layer (stride-ring init that two
    // rounds failed to densify) fails the probe loudly instead of
    // surfacing as a silent recall cliff.
    if (faces.contains("q174_ann_graph_search"))
      Seq(base, scaled).foreach { dir =>
        val hits = SparkEntry.queries("q174_ann_graph_search")(spark, dir)
          .agg(org.apache.spark.sql.functions.sum("hit"))
          .collect()(0).getLong(0)
        println(s"""HITS {"query":"q174_ann_graph_search","dir":"$dir","hits":$hits}""")
        require(hits >= 5, s"hub routing degenerated at $dir: $hits/64 head hits")
      }
    spark.stop()
  }
}
