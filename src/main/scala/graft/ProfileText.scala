package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the text-pair queries (not part of the
  * driver contract; safe to ignore). */
object ProfileText {
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
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    noop(SparkEntry.entry(spark))

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    println("partitions=" + docs0.rdd.getNumPartitions + " rows=" + docs0.count())
    val tokset = docs0.select(col("doc_id"), col("lang"), col("source"),
      array_distinct(split(col("text"), " ")).as("tokset"))
    time("tokset only") { noop(tokset) }
    println("avg tokset size=" + tokset.select(avg(size(col("tokset")))).first())
    graft.functions.MinHashSlots.register(spark)
    time("tokset+mh2") {
      noop(tokset.withColumn("mh", graft.functions.MinHashSlots.slotsCol(col("tokset"), 2)))
    }
    val q = SparkEntry.queries
    for (name <- Seq("q33_minhash_lsh_pairs", "q34_ngram_jaccard_blocked", "q68_neardup_clusters")) {
      time(s"$name (1st)") { noop(q(name)(spark, sfDir)) }
      spark.sharedState.cacheManager.clearCache()
      time(s"$name (2nd)") { noop(q(name)(spark, sfDir)) }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
