package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the q24/q25 path (not part of the driver
  * contract; safe to ignore). */
object ProfileDomain {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup
    SparkEntry.entry(spark).count()

    val q = SparkEntry.queries
    time("q24 first (build+sort)") { q("q24_domain_transform")(spark, sfDir).count() }
    time("q24 second (warm)") { q("q24_domain_transform")(spark, sfDir).count() }
    time("q25 (build+agg)") { q("q25_domain_gold")(spark, sfDir).count() }
    time("q52 (build+window+agg)") { q("q52_player_champion_stats")(spark, sfDir).count() }

    // decompose the build: raw orders scan, bronze synth + explode +
    // join + tier filter (no agg), then + min_by agg, then + write.
    import graft.domain.MatchTransform
    val orders = Tables.orders(spark, sfDir)
    time("orders scan") { orders.count() }

    val bronze = graft.queries.Domain.bronzeFromOrders(orders)
    val dim = graft.queries.Domain.dimFromCustomer(Tables.customer(spark, sfDir))

    time("bronze synth count") { bronze.count() }
    val narrow = MatchTransform.silver(bronze, dim, includeParticipants = false)
    time("silver narrow build count") { narrow.count() }
    time("silver narrow build count x2") { narrow.count() }
    val wide = MatchTransform.silver(bronze, dim, includeParticipants = true)
    time("silver wide build count") { wide.count() }
    time("silver narrow write parquet") {
      narrow.write.mode("overwrite").parquet(sys.props("user.dir") + "/target/bench-stage/profile-silver")
    }
    spark.stop()
  }
}
