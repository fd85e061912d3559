package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located join — both sides bucketed on
  * the join key into the same bucket count join with NO shuffle
  * exchange. The storage-level answer to repeated large-large joins at
  * 100 TB (shuffle paid once at write time, amortized over every later
  * join). */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed-by-key tables join without a shuffle exchange") {
    // (warehouse dir is a static conf — tables land in ./spark-warehouse,
    // dropped in the finally; the dir is gitignored)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // force a non-broadcast join so the shuffle question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .withColumnRenamed("c_custkey", "o_custkey")
      o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
      c.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("customer_bucketed")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // bucketed co-location: no shuffle exchange feeds the join
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        o.join(c, "o_custkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }

  test("directory-partitioned layout: a filter on the partition column prunes at the file index") {
    // The storage-side complement of predicate pushdown: partitionBy
    // writes one directory per value, and a filter on that column
    // becomes a PartitionFilter — pruned at LISTING time, before any
    // footer is opened. At 100 TB this is the difference between
    // scanning a day and scanning a decade.
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      li.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
      val read = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
      read.collect()
      val plan = read.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), s"no partition filter:\n$plan")
      assert("PartitionFilters: \\[[^\\]]*l_returnflag".r.findFirstIn(plan).isDefined,
        s"filter not pushed to partition pruning:\n$plan")
      // And no row-group filter remains on the partition column — the
      // predicate is fully consumed by pruning.
      assert(read.count() == li.filter(col("l_returnflag") === "R").count())
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  test("mapGroupsWithState running stats equal the declarative gold aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Incremental, StatefulStats}
    val rows: Seq[StatefulStats.In] = Seq(
      ("A", "Ahri", true, 2.0), ("A", "Ahri", false, 1.0),
      ("A", "Zed", true, 3.0), ("B", "Ahri", true, 4.0))
    val stream = MemoryStream[StatefulStats.In]
    val q = StatefulStats.runningStats(stream.toDS())
      .writeStream.format("memory").queryName("stateful_mem").outputMode("update").start()
    stream.addData(rows.take(2))
    q.processAllAvailable()
    stream.addData(rows.drop(2))
    q.processAllAvailable()
    q.stop()
    // update mode emits one row per key per batch — latest state per key wins
    val got = spark.table("stateful_mem")
      .groupBy("puuid", "champion")
      .agg(max(struct(col("games"), col("wins"), col("kda_sum"))).as("s"))
      .select(col("puuid"), col("champion"), col("s.games"), col("s.wins"), col("s.kda_sum"))
      .as[(String, String, Long, Long, Double)].collect().toSet
    val declarative = Incremental.goldStream(
      rows.toDF("puuid", "champion", "win", "kda"))
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == declarative)
  }
}
