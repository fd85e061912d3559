package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT per-group order statistics (median, arbitrary
  * quantiles) with every buffer bounded.
  *
  * Spark's `median` / `percentile` is an ImperativeAggregate that
  * buffers EVERY value of a group in the aggregation buffer — the same
  * unbounded-memory shape as a whole-group `collect_list` (the round-4
  * q84 finding): fine at sf0.1, an executor OOM when one group holds a
  * 100 TB corpus slice. This is the classic two-pass bucketed
  * selection instead, as pure DataFrame fragments:
  *
  *   1. RANGE PASS — per-key count/min/max (tiny hash aggregate,
  *      map-side partials). The target ranks fall out of the count:
  *      floor((n+1)/2) and floor((n+2)/2) — equal for odd n, the two
  *      middle ranks for even n (their mean is the `median`/
  *      `quantile_cont(0.5)` interpolation both engines use).
  *   2. HISTOGRAM PASS — bucket = value's position in `buckets`
  *      equal-width slices of [min, max] (monotone in the value, so
  *      bucket b sorts wholly before b+1). Per-(key, bucket) counts
  *      collapse map-side; the exclusive cross-bucket offset is a
  *      window OVER THAT AGGREGATE (partition rows = bucket count,
  *      corpus-independent). The bucket holding each target rank is a
  *      broadcast-tiny join of ranks vs offsets.
  *   3. SELECTION PASS — rescan only rows of the selected buckets
  *      (broadcast semi-filter, no shuffle of the fact), refined TWO
  *      analytic levels for free: the sub-slice and sub-sub-slice
  *      indices both derive from the parent's ANALYTIC range, lifting
  *      resolution from range/buckets to range/buckets³ (~1/5.5e11
  *      default) without extra passes — mass that lands in one
  *      top-level slice but spreads wider than a deeper slice is
  *      split again before any window runs, and each level's offsets
  *      are windows OVER AGGREGATES (≤ buckets rows per partition).
  *      Rank lookup then runs over the innermost slice's
  *      DISTINCT-VALUE histogram, not its rows: ties collapse in a
  *      map-side aggregate first, so a hot repeated value SHRINKS the
  *      window partition instead of concentrating it (an all-equal
  *      group degenerates to a single histogram row — no special
  *      case). The remaining data-dependent bound is DISTINCT values
  *      inside one range/buckets³ span — even a 10⁶-distinct
  *      adversarial pack of continuous doubles inside a SINGLE
  *      range/buckets² sub-slice (the round-5 residual, now a spec
  *      fixture) spreads across ~buckets sub-sub-slices; packing
  *      below range/buckets³ would take another recursion level, the
  *      same step applied again.
  *
  * Exactness: bucketing only routes ranks — any monotone bucketing
  * yields the same selected values, so the result equals the
  * single-buffer `median` row for row (spec-asserted against Spark's
  * own `median`, including tie/negative/odd-even/singleton cases, and
  * the q56/q45 DuckDB oracles stay unchanged and hash-matching).
  *
  * Rows with a NULL value are ignored (both engines' median contract);
  * a key with only NULLs is absent from the output — callers decide
  * null semantics at their join.
  *
  * Key-cardinality contract: the per-key stats/targets/selection
  * tables are BROADCAST back to the data, so `key` must be
  * broadcast-scale (languages, sources, status flags — the grouping
  * columns every current consumer uses), same as the per-language
  * broadcast-threshold patterns elsewhere. A per-entity key with
  * millions of values needs the shuffle-join variant of those joins;
  * at that cardinality groups are small enough that Spark's own
  * `percentile` buffers stay bounded anyway — the operators cover
  * complementary regimes.
  *
  * Reference analog: the per-champion summary-stats table the
  * dashboard renders (/root/reference/dashboard/app.py:548-553) —
  * order statistics there are a one-node pandas affair; this is the
  * shape that distributes them.
  */
object ExactMedian {

  /** Returns one row per `key`: (key, `outName` = exact median of
    * `value`). `buckets` trades histogram size (pass 2 exchange,
    * key-count × buckets rows) against selected-bucket width (pass 3
    * local work, ~n/buckets rows before tie collapse). */
  def perGroup(
      df: DataFrame,
      key: String,
      value: String,
      outName: String = "median",
      buckets: Int = 8192,
      persistProjection: Boolean = false): DataFrame = {
    val picked = selectAtRanks(df, key, value, buckets, persistProjection, stats =>
      stats.select(
        col(key),
        lit("m").as("__em_tag"),
        explode(array_distinct(array(
          floor((col("__em_n") + lit(1)) / lit(2)).cast("long"),
          floor((col("__em_n") + lit(2)) / lit(2)).cast("long")))).as("__em_r")))
    // Mean of the selected rank values (one row for odd n; two rows —
    // possibly the same histogram row twice — for even n).
    picked.groupBy(col(key)).agg(avg(col("__em_v")).as(outName))
  }

  /** Exact DISCRETE per-group quantiles: for each `(outName, p)` the
    * value at rank ceil(p·n) — the inverse-CDF / `quantile_disc`
    * definition. The result is an exact data element (no
    * interpolation arithmetic), so cross-engine differential checks
    * are float-exact. One output row per key, one column per p.
    * All ranks resolve through ONE shared histogram build — asking
    * for p25/p50/p75/p99 together costs the same three passes as one
    * median. */
  def quantilesDisc(
      df: DataFrame,
      key: String,
      value: String,
      ps: Seq[(String, Double)],
      buckets: Int = 8192,
      persistProjection: Boolean = false): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 })
    // Duplicate output names would silently merge in the pivot below
    // (max over BOTH tags' values) — reject loudly instead.
    require(ps.map(_._1).distinct.size == ps.size,
      s"duplicate quantile output names: ${ps.map(_._1)}")
    val picked = selectAtRanks(df, key, value, buckets, persistProjection, stats => {
      // ceil(n·p) in plain IEEE double arithmetic — the same ops both
      // engines run, so rank boundaries agree bit-for-bit.
      val prs = ps.map { case (nm, p) =>
        struct(lit(nm).as("t"),
          greatest(lit(1L), ceil(col("__em_n") * lit(p)).cast("long")).as("r"))
      }
      stats.select(col(key), explode(array(prs: _*)).as("__em_pr"))
        .select(col(key), col("__em_pr.t").as("__em_tag"),
          col("__em_pr.r").as("__em_r"))
    })
    val aggs = ps.map { case (nm, _) =>
      max(when(col("__em_tag") === nm, col("__em_v"))).as(nm)
    }
    picked.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** [[perGroup]]'s interpolated median AND [[quantilesDisc]]'s
    * discrete quantiles resolved through ONE shared rank-selection
    * build — for consumers that need both families over the same
    * (key, value): every rank target (the two middle ranks plus each
    * ceil(p·n)) rides the same three bounded passes, so the combined
    * call costs the same as either alone. One output row per key:
    * (key, `medianName`, then one column per p). */
  def medianAndQuantiles(
      df: DataFrame,
      key: String,
      value: String,
      ps: Seq[(String, Double)],
      medianName: String = "median",
      buckets: Int = 8192): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 })
    require((ps.map(_._1) :+ medianName).distinct.size == ps.size + 1,
      s"duplicate output names: ${ps.map(_._1)} + $medianName")
    val picked = selectAtRanks(df, key, value, buckets, persistProjection = false, stats => {
      val med = stats.select(
        col(key),
        lit("__m").as("__em_tag"),
        explode(array_distinct(array(
          floor((col("__em_n") + lit(1)) / lit(2)).cast("long"),
          floor((col("__em_n") + lit(2)) / lit(2)).cast("long")))).as("__em_r"))
      val prs = ps.map { case (nm, p) =>
        struct(lit(nm).as("t"),
          greatest(lit(1L), ceil(col("__em_n") * lit(p)).cast("long")).as("r"))
      }
      val qs = stats.select(col(key), explode(array(prs: _*)).as("__em_pr"))
        .select(col(key), col("__em_pr.t").as("__em_tag"),
          col("__em_pr.r").as("__em_r"))
      med.unionByName(qs)
    })
    val aggs = avg(when(col("__em_tag") === "__m", col("__em_v"))).as(medianName) +:
      ps.map { case (nm, _) =>
        max(when(col("__em_tag") === nm, col("__em_v"))).as(nm)
      }
    picked.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact discrete per-group quantiles for SMALL-VALUE-DOMAIN
    * columns — token lengths, rounded scores, count-of-count
    * multiplicities: one count-of-counts aggregate + a cumulative
    * window OVER THAT AGGREGATE per key, then the rank thresholds as
    * conditional mins. One corpus pass (vs [[quantilesDisc]]'s
    * three), and every window partition is bounded by the VALUE
    * DOMAIN (|distinct values| per key), never by corpus rows — the
    * q144 count-of-counts shape generalized. Use [[quantilesDisc]]
    * when the value domain is unbounded (raw continuous doubles):
    * there the count table IS corpus-sized and this shape degrades
    * to the whole-group window it exists to avoid. Round-10
    * measurements of the swap where the domain is bounded: q165
    * 4.3→1.8 s, q139 2.6→1.6 s at sf0.1.
    *
    * Same rank convention as [[quantilesDisc]] (value at rank
    * ceil(p·n) — `quantile_disc`), same NULL handling (null values
    * ignored; an all-null key is absent). The value column keeps its
    * ORIGINAL type (no double cast): the result is an exact data
    * element, so cross-engine checks stay float-exact. */
  def quantilesDiscSmallDomain(
      df: DataFrame,
      key: String,
      value: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0.0 && p <= 1.0 })
    require(ps.map(_._1).distinct.size == ps.size,
      s"duplicate quantile output names: ${ps.map(_._1)}")
    val rows = df.filter(col(value).isNotNull)
    val cc = rows.groupBy(col(key), col(value)).agg(count(lit(1)).as("__em_k"))
    val wCum = Window.partitionBy(col(key)).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, 0)
    val nq = rows.groupBy(col(key)).agg(count(lit(1)).as("__em_n"))
    val cum = cc.withColumn("__em_cum", sum(col("__em_k")).over(wCum))
      .join(broadcast(nq), Seq(key))
    val aggs = ps.map { case (nm, p) =>
      min(when(col("__em_cum") >= greatest(lit(1L),
        ceil(col("__em_n") * lit(p)).cast("long")), col(value))).as(nm)
    }
    cum.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Shared rank-selection core: resolves every (tag, rank) target
    * produced by `targetsOf(stats)` to its value, returning
    * (key, __em_tag, __em_r, __em_v) — one row per target. */
  private def selectAtRanks(
      df: DataFrame,
      key: String,
      value: String,
      buckets: Int,
      persistProjection: Boolean,
      targetsOf: DataFrame => DataFrame): DataFrame = {
    // All three passes — range stats, bucket histogram, selected-
    // bucket rescan — read this narrow (key, value) projection.
    // `persistProjection` materializes it once (the PrefixSum
    // precedent) — worth it when the value is a computed expression
    // (e.g. a tokenization: q107 measured 1.8→1.3 s), a net LOSS when
    // the projection is a plain columnar read that parquet re-serves
    // cheaply (q56 measured 2.0→2.3 s persisted), so callers choose.
    // Lifecycle: the blocks stay cached until the session drops them —
    // both graft harnesses (Bench, Verify) clear the cache per query;
    // long-lived sessions should wrap the call and unpersist, or leave
    // the flag off.
    val narrow = df
      .filter(col(value).isNotNull)
      .select(col(key), col(value).cast("double").as("__em_v"))
    val rows = if (persistProjection) narrow.persist() else narrow

    // (1) per-key range + count; targets = (key, tag, rank).
    val stats = rows.groupBy(col(key)).agg(
      count(lit(1)).as("__em_n"),
      min(col("__em_v")).as("__em_mn"),
      max(col("__em_v")).as("__em_mx"))
    val targets = targetsOf(stats)

    // (2) monotone equal-width bucketing + per-(key, bucket) counts.
    // The bucket expression must be IDENTICAL in passes 2 and 3, so it
    // lives on one shared lineage (`bucketed`).
    val width = (col("__em_mx") - col("__em_mn")) / lit(buckets.toDouble)
    val bucketed = rows
      .join(broadcast(stats.drop("__em_n")), Seq(key))
      .withColumn("__em_b",
        when(col("__em_mx") === col("__em_mn"), lit(0))
          .otherwise(least(
            floor((col("__em_v") - col("__em_mn")) / width).cast("int"),
            lit(buckets - 1))))
    val hist = bucketed.groupBy(col(key), col("__em_b"))
      .agg(count(lit(1)).as("__em_c"))
    val wOff = Window.partitionBy(col(key)).orderBy(col("__em_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("__em_off",
      coalesce(sum(col("__em_c")).over(wOff), lit(0L)))

    // Locate each target rank's bucket: tiny × tiny broadcast join.
    val sel = cum
      .join(broadcast(targets.select(col(key), col("__em_tag"), col("__em_r"))),
        Seq(key))
      .filter(col("__em_r") > col("__em_off") &&
        col("__em_r") <= col("__em_off") + col("__em_c"))
      .select(col(key), col("__em_b"), col("__em_tag"), col("__em_r"),
        (col("__em_r") - col("__em_off")).as("__em_lr"))

    // (3) rescan only the selected buckets, REFINED one level: the
    // sub-slice index comes from the parent bucket's ANALYTIC range
    // (mn + b·width, known from stats), so the refinement costs no
    // extra pass over the data — resolution becomes range/buckets²
    // (~1/6.7e7 at the default 8192), splitting concentration that a
    // single equal-width level would miss (see the header for the
    // residual sub-span caveat). The greatest(0, ·) guards the float
    // edge where v sits a hair below its bucket's analytic lower
    // bound.
    val width2 = width / lit(buckets.toDouble)
    val width3 = width2 / lit(buckets.toDouble)
    val cand = bucketed
      .join(broadcast(sel.select(col(key), col("__em_b")).distinct()),
        Seq(key, "__em_b"))
      .withColumn("__em_b2",
        when(col("__em_mx") === col("__em_mn"), lit(0))
          .otherwise(greatest(lit(0), least(
            floor((col("__em_v") - (col("__em_mn") + col("__em_b") * width))
              / width2).cast("int"),
            lit(buckets - 1)))))
      // Second refinement level, same analytic trick one power deeper:
      // the sub-sub-slice index derives from the (b, b2) range, so it
      // costs no extra pass — resolution range/buckets³ (~1/5.5e11).
      // This is the bounded-depth recursive step that closes the
      // adversarial continuous-sliver residual: values that all land
      // in ONE range/buckets² span (the shape the header documents)
      // are split another buckets ways before any window runs.
      // width3 == 0 (range below ~1e-300, or mn == mx) degenerates to
      // a single sub-sub-slice — the guard keeps the division finite.
      .withColumn("__em_b3",
        when(col("__em_mx") === col("__em_mn") || width3 === lit(0.0), lit(0))
          .otherwise(greatest(lit(0), least(
            floor((col("__em_v") - (col("__em_mn") + col("__em_b") * width
              + col("__em_b2") * width2)) / width3).cast("int"),
            lit(buckets - 1)))))
    // Distinct-VALUE histogram per sub-slice (ties collapse before any
    // window); the sub-slice totals and their in-bucket offsets are
    // aggregates OF THIS AGGREGATE — window partitions are ≤ buckets
    // rows (cross-slice offsets) and ≤ distinct-values-per-sub-slice
    // (value ranks). For fixed-precision data, distinct values inside
    // one range/buckets² span are a handful of ties; see the header
    // for the adversarial-continuous residual.
    // BOTH the slice-offset branch (hist3→hist2→cum2/cum3→sel2/sel3)
    // and the value-rank branch (valCum) read this table; persisting
    // it saves each branch re-running the selected-bucket corpus scan
    // (measured +1.3 s on q107/q108 at sf0.1 where the scan
    // re-tokenizes). The
    // persist follows the SAME caller flag as the projection so
    // `persistProjection = false` remains a complete no-caching escape
    // hatch for long-lived sessions — with it off, the re-run is one
    // extra NARROW selected-bucket scan (cheap for plain column
    // reads, the same regime where the projection persist loses).
    val candHistRaw = cand.groupBy(col(key), col("__em_b"), col("__em_b2"),
        col("__em_b3"), col("__em_v"))
      .agg(count(lit(1)).as("__em_vc"))
    val candHist = if (persistProjection) candHistRaw.persist() else candHistRaw
    // b3-level histogram FIRST; the b2 level is then an aggregate OF
    // THAT AGGREGATE, not a third reader of candHist — keeping exactly
    // two consumers of the selected-bucket scan (valCum and hist3),
    // the same count the two-level shape had. When the third level
    // landed as a direct candHist.groupBy, the unpersisted path
    // re-ran the selected-bucket corpus scan once more per query and
    // q106 measured +2.2 s at sf0.1 for pure plumbing.
    val hist3 = candHist.groupBy(col(key), col("__em_b"), col("__em_b2"), col("__em_b3"))
      .agg(sum(col("__em_vc")).as("__em_c3"))
    val hist2 = hist3.groupBy(col(key), col("__em_b"), col("__em_b2"))
      .agg(sum(col("__em_c3")).as("__em_c2"))
    val wOff2 = Window.partitionBy(col(key), col("__em_b")).orderBy(col("__em_b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum2 = hist2.withColumn("__em_off2",
      coalesce(sum(col("__em_c2")).over(wOff2), lit(0L)))
    // Re-locate each target's in-bucket rank to its sub-slice.
    val sel2 = cum2
      .join(broadcast(sel), Seq(key, "__em_b"))
      .filter(col("__em_lr") > col("__em_off2") &&
        col("__em_lr") <= col("__em_off2") + col("__em_c2"))
      .select(col(key), col("__em_b"), col("__em_b2"), col("__em_tag"),
        col("__em_r"), (col("__em_lr") - col("__em_off2")).as("__em_lr2"))
    // ... and once more to its sub-sub-slice: the b3 offsets are
    // again a window OVER AN AGGREGATE (≤ buckets rows per (key, b,
    // b2) partition), and the target's local rank narrows to one
    // range/buckets³ span before any per-value window runs.
    val wOff3 = Window.partitionBy(col(key), col("__em_b"), col("__em_b2"))
      .orderBy(col("__em_b3"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum3 = hist3.withColumn("__em_off3",
      coalesce(sum(col("__em_c3")).over(wOff3), lit(0L)))
    val sel3 = cum3
      .join(broadcast(sel2), Seq(key, "__em_b", "__em_b2"))
      .filter(col("__em_lr2") > col("__em_off3") &&
        col("__em_lr2") <= col("__em_off3") + col("__em_c3"))
      .select(col(key), col("__em_b"), col("__em_b2"), col("__em_b3"),
        col("__em_tag"), col("__em_r"),
        (col("__em_lr2") - col("__em_off3")).as("__em_lr3"))
    val wVal = Window.partitionBy(col(key), col("__em_b"), col("__em_b2"), col("__em_b3"))
      .orderBy(col("__em_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val valCum = candHist.withColumn("__em_voff",
      coalesce(sum(col("__em_vc")).over(wVal), lit(0L)))
    valCum
      .join(broadcast(sel3), Seq(key, "__em_b", "__em_b2", "__em_b3"))
      .filter(col("__em_lr3") > col("__em_voff") &&
        col("__em_lr3") <= col("__em_voff") + col("__em_vc"))
      .select(col(key), col("__em_tag"), col("__em_r"), col("__em_v"))
  }
}
