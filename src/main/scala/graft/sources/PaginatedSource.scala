package graft.sources

import scala.annotation.tailrec

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** S1 — the reference's paginated REST extract (extractor/main.py:
  * 374-432: GET id-pages `?start=&count=`, then per-id detail GETs,
  * retry-on-429, 0.1s pacing) re-expressed as a source adapter. The
  * page function is pluggable (zero-egress: tests inject a pure
  * function); the production shape is identical — only `pageFn` would
  * wrap an HTTP client.
  *
  * Design per SURVEY.md §2.1/S1: the id-page walk is inherently serial
  * (cursor pagination) and tiny, so it runs on the driver; the
  * *expensive per-item detail fetch* is what must distribute — so
  * [[fetchDetails]] partitions the ids and fetches inside
  * mapPartitions, which is where a 1000-executor cluster earns its
  * keep. Retry with bounded attempts mirrors the reference's 429
  * handling (extractor/main.py:47-75).
  */
object PaginatedSource {

  /** Walk `pageFn(start, count)` until an empty/short page; bounded by
    * `maxPages` (the reference caps at 4 pages of 50). */
  def fetchIdPages[T](pageFn: (Int, Int) => Seq[T], pageSize: Int, maxPages: Int): Seq[T] = {
    @tailrec
    def loop(page: Int, acc: Vector[T]): Vector[T] =
      if (page >= maxPages) acc
      else {
        val batch = pageFn(page * pageSize, pageSize)
        val next = acc ++ batch
        if (batch.size < pageSize) next else loop(page + 1, next)
      }
    loop(0, Vector.empty)
  }

  /** Retry with bounded attempts (429-style). The reference sleeps
    * 120s; here backoff is injected so tests run instantly. */
  def withRetry[T](attempts: Int, backoff: Int => Unit = _ => ())(f: () => T): T = {
    var n = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(f())
      catch {
        case e: Throwable =>
          if (n >= attempts - 1) throw e
          backoff(n); n += 1
      }
    }
    out.get
  }

  /** Distributed per-id detail fetch: ids are parallelized over
    * `parallelism` partitions and each partition runs its own fetches
    * (with retry) — the reference's 2-worker race generalized to N
    * executors. `detailFn` must be serializable and side-effect free
    * per call. */
  def fetchDetails[I: scala.reflect.ClassTag, T: Encoder](
      spark: SparkSession,
      ids: Seq[I],
      detailFn: I => T,
      parallelism: Int,
      attempts: Int = 3): Dataset[T] = {
    import org.apache.spark.sql.Encoders
    implicit val idEnc: Encoder[I] = Encoders.kryo[I]
    val idDs = spark.createDataset(ids)(idEnc).repartition(parallelism)
    idDs.mapPartitions(_.map(id => withRetry(attempts)(() => detailFn(id))))
  }
}
