package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format surface beyond parquet: the engine's queries are
  * format-agnostic DataFrame programs, so any `spark.read` format
  * slots in below them. These tests pin the non-parquet formats a
  * real ingest actually meets (the reference's REST extract lands
  * JSON; partner drops land CSV) — round-trip fidelity with explicit
  * schemas, compression, and malformed-row handling. */
class FormatsSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }

  test("JSON round-trip: gzip'd lines preserve values under an explicit schema") {
    val dir = tmp("graft_json")
    try {
      val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      src.write.mode("overwrite").option("compression", "gzip").json(dir)
      // Explicit schema: a production reader never lets JSON inference
      // scan the data twice or widen types under it.
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
      val back = spark.read.schema(schema).json(dir)
      assert(back.schema == schema)
      assert(back.count() == src.count())
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
        "JSON round-trip changed values")
    } finally rm(dir)
  }

  test("CSV round-trip with header + explicit schema; malformed rows are quarantined not silently dropped") {
    val dir = tmp("graft_csv")
    try {
      val src = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
      src.write.mode("overwrite").option("header", "true").csv(dir)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType)))
      val back = spark.read.schema(schema).option("header", "true").csv(dir)
      assert(back.count() == src.count())
      assert(back.exceptAll(src).isEmpty, "CSV round-trip changed values")

      // Malformed input: PERMISSIVE mode must surface bad rows in the
      // corrupt-record column, never silently coerce them — the
      // ingest-quality contract (reference analog: the extractor's
      // row-level try/except quarantine).
      val badDir = tmp("graft_csv_bad")
      try {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(badDir, "part-bad.csv"),
          "c_custkey,c_name,c_acctbal\n1,ok,10.5\nnot_a_number,bad,xx\n")
        val withCorrupt = StructType(schema.fields :+
          StructField("_corrupt_record", StringType))
        val read = spark.read.schema(withCorrupt)
          .option("header", "true").option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record").csv(badDir)
          .cache() // corrupt-record column requires a materialized referenced plan
        assert(read.filter(col("_corrupt_record").isNotNull).count() == 1,
          "malformed row not quarantined")
        assert(read.filter(col("_corrupt_record").isNull).count() == 1,
          "good row lost")
        read.unpersist()
      } finally rm(badDir)
    } finally rm(dir)
  }

  test("ORC round-trip: partitioned write, partition pruning + pushed filters at the scan") {
    val dir = tmp("graft_orc")
    try {
      val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      // Partitioned layout: at 100 TB the partition column IS the
      // pruning lever — a status/date filter must never scan the
      // other directories.
      src.write.mode("overwrite").partitionBy("o_orderstatus").orc(dir)
      val back = spark.read.orc(dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      assert(back.count() == src.count())
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
        "ORC round-trip changed values")
      val q = spark.read.orc(dir)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("PartitionFilters:") && plan.contains("o_orderstatus"),
        s"status filter must prune partitions, not scan them:\n$plan")
      assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(o_totalprice"),
        s"value filter must reach the ORC reader:\n$plan")
    } finally rm(dir)
  }
}
