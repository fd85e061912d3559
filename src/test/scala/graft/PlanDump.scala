package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for the named queries to
  * individual files — the before/after plan evidence an optimization
  * round commits under plans/r<N>/. Usage:
  *   tools/run.sh graft.PlanDump <outDir> <suffix> <query...>
  * writes <outDir>/<query>_<suffix>.txt per query. Bench-shaped
  * session (32 slots, 32 shuffle partitions, the pinned AQE floor) so
  * the dumped shapes match the benched ones. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      // "=beamHop": the pre-checkpoint per-hop plan of the graph
      // serving walk (a query's FINAL plan starts at the last
      // localCheckpoint and hides the hop shape the family's cost is
      // made of).
      val df =
        if (name == "=beamHop") queries.Clustering.beamHopPlan(spark, sfDir)
        else SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
