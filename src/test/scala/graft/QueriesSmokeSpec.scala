package graft

/** Every registered operator query must run at sf0.001 and the ones
  * with guaranteed-nonempty semantics must return rows. (Value-level
  * correctness is the driver's DuckDB differential — tools/compare.py;
  * this is the cheap always-on guard.) */
class QueriesSmokeSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  // Queries that may legitimately return 0 rows at tiny scale.
  private val mayBeEmpty = Set(
    "q07_orphan_customers", "q10_duplicate_groups",
    "q33_minhash_lsh_pairs", "q34_ngram_jaccard_blocked",
    "q39_cosine_neardup_pairs")

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // The driver's comparison harness sorts every output column with
  // pandas; array/map/struct cells are unhashable there and turn a
  // correct query into a red CORRECTNESS row (round-7 q125/q150).
  // Serialize complex values (concat_ws / md5 digest) instead of
  // emitting them. Allowlist is intentionally EMPTY — extend it only
  // with a comment proving the driver tolerates the shape.
  private val complexColumnAllowlist = Set.empty[String]

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      if (!complexColumnAllowlist(name)) {
        import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
        val complex = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
            || f.dataType.isInstanceOf[MapType]
            || f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
        }
        assert(complex.isEmpty,
          s"$name emits driver-harness-unsafe top-level column(s): ${complex.mkString("; ")}")
      }
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
