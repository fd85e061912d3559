package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-JVM parquet staging for deterministic intermediate tables.
  *
  * An in-memory `persist()` of a shared intermediate is exposed to
  * cache eviction under heap pressure: the round-1 driver bench
  * evicted q25's shared silver mid-run and silently turned it into a
  * full recompute of a plan it never declared. A parquet stage is the
  * production answer — the artifact a pipeline would persist to
  * storage anyway — and cannot be evicted. Staging lands in a per-JVM
  * temp dir, so cross-process runs always rebuild (no staleness) while
  * in-process consumers (bench, verify, downstream stages) reuse it.
  *
  * `build` MUST be deterministic in `key`: the stage is written once
  * per key per JVM and read thereafter.
  */
object Staged {
  private lazy val root: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-stage")
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def parquet(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val path = memo.computeIfAbsent(key, k => {
      val p = root.resolve(
        k.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + Integer.toHexString(k.hashCode)).toString
      build.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }
}
