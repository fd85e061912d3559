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
      else Seq("q174_ann_graph_search", "q175_ann_graph_delta")

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
    spark.stop()
  }
}
