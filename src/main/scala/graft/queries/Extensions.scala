package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Num
import graft.operators.{AsOfJoin, Upsert}

/** Extension operator surface beyond the reference (SURVEY.md §7.2
  * step 5 / §2.4 "candidates"): multi-level rollups, approximate
  * sketches, binary-payload column plumbing, and the keyed-upsert
  * operator — each driver-checkable. */
object Extensions {

  /** Per-returnflag price order statistics — ONE ExactMedian rank
    * selection (median + p25/p50/p75/p99 through the same three
    * bounded passes), STAGED per input dir: q45 (median band), q56
    * (median stats) and q106 (quantile card) all consume the same
    * (l_returnflag, l_extendedprice) statistics, and each used to
    * pay its own full selection build. At 100 TB this is the column
    * stats table a warehouse materializes once per snapshot. q113
    * deliberately does NOT share it: its contract filters
    * l_extendedprice > 0, and the shared artifact must not silently
    * assume the corpus has no nonpositive prices. */
  private def priceStats(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.operators.Staged.parquet(s, s"pricestats|$dir") {
      graft.operators.ExactMedian.medianAndQuantiles(
        Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p99" -> 0.99),
        medianName = "median_raw")
    }

  /** q113's exact ground truth, STAGED as its own artifact: the
    * positive-price contract keeps it out of [[priceStats]] (that
    * table's stats must not assume the corpus has no nonpositive
    * prices), but the exact side is still per-snapshot column
    * statistics — (returnflag, n, p50/p95/p99 over prices > 0)
    * materialized once; only the SKETCH path (the thing q113 is
    * actually exercising) runs at query time against it. */
  private def posPriceStats(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.operators.Staged.parquet(s, s"pospricestats|$dir") {
      val li = Tables.lineitem(s, dir).filter(col("l_extendedprice") > 0)
      val exact = graft.operators.ExactMedian.quantilesDisc(
        li, "l_returnflag", "l_extendedprice",
        Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))
      li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .join(exact, Seq("l_returnflag"))
    }

  val defs: Seq[QueryDef] = Seq(

    // ROLLUP grouping sets (the reference has none — SURVEY §2.4);
    // null grouping markers coalesced to '(all)' on both engines.
    QueryDef(
      "q44_rollup_pricing",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(Num.fround(sum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
            coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
            col("sum_qty"), col("n"))
          .orderBy(col("rf"), col("ls")),
      Some("""SELECT coalesce(l_returnflag, '(all)') AS rf,
              coalesce(l_linestatus, '(all)') AS ls,
              floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
              count(*) AS n
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              ORDER BY rf, ls"""),
    ),

    // Approximate sketches: HLL distinct + approximate quantiles.
    // Sketch VALUES are engine-specific by design (Spark HLL++ vs
    // DuckDB HLL produce different estimates), so the oracle checks
    // tolerance-banded VERDICTS instead: each engine computes its own
    // sketch AND the exact answer, then emits the boolean
    // "sketch within band of exact" — identical on both engines when
    // both sketches honor their accuracy contracts, so rows/schema/
    // hash all match. Bands: 15% for HLL (3σ of the default 5% rsd),
    // 5% for the 1000-bucket median at this group size. The exact
    // side rides along (hash-checked cross-engine), so the row pins
    // real values, not just two `true`s.
    QueryDef(
      "q45_sketches",
      (s, dir) => {
        // The exact distinct count lives in its OWN two-level
        // aggregate (groupBy key+value, then count per key) joined
        // back on the 3-row group key: mixing countDistinct with
        // non-distinct aggregates makes Catalyst plan an Expand that
        // duplicates every input row per aggregate family — measured
        // 3× the cost of the split form at sf0.1.
        val li = Tables.lineitem(s, dir)
        val exact = li.groupBy(col("l_returnflag"), col("l_partkey"))
          .agg(count(lit(1)))
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
        // The exact median the band is judged against comes from the
        // shared staged priceStats artifact (ExactMedian bounded
        // selection — never a whole-group percentile buffer).
        val med = priceStats(s, dir)
          .select(col("l_returnflag"), col("median_raw").as("exact_median"))
        li.groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"))
          .join(broadcast(exact), Seq("l_returnflag"))
          .join(broadcast(med), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")).cast("double")
              / col("exact_parts") <= lit(0.15)).cast("int").as("distinct_ok"),
            (abs(col("approx_median") - col("exact_median"))
              / col("exact_median") <= lit(0.05)).cast("int").as("median_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
              count(DISTINCT l_partkey)::BIGINT AS exact_parts,
              (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))::DOUBLE
                 / count(DISTINCT l_partkey) <= 0.15)::INT AS distinct_ok,
              (abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
                 / quantile_cont(l_extendedprice, 0.5) <= 0.05)::INT AS median_ok
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ),

    // Exact distinct counts (the ground truth q45's HLL approximates;
    // oracle-checked, unlike the engine-specific sketch). At 100 TB
    // the expand-based exact distinct is the expensive path — that
    // cost difference is the point of having both queries.
    QueryDef(
      "q59_exact_distinct",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_parts"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
              count(DISTINCT l_partkey)::BIGINT AS exact_parts,
              count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ),

    // Mergeable distinct-count sketches — the 100 TB pattern q45's
    // opaque approx_count_distinct can't express: build a PERSISTABLE
    // HLL sketch per shard (here: per l_orderkey%8, standing in for
    // per-day/per-ingest-partition), then answer the cross-shard
    // distinct question by sketch UNION — register-wise max, exactly
    // commutative/associative, so the estimate is partitioning-
    // independent and a year of daily sketches merges in milliseconds
    // without rescanning raw data. Datasketches HLL via the public
    // hll_sketch_agg / hll_union_agg / hll_sketch_estimate functions.
    // Verdict-banded like q45 (each engine bands its own sketch
    // against its own exact answer); the exact side and the shard
    // count are hash-checked cross-engine.
    QueryDef(
      "q93_hll_shard_merge",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val shards = li
          .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(8)).as("shard"))
          .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        val merged = shards.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_shards"),
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_parts"))
        merged.join(exact, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n_shards"), col("exact_parts"),
            (abs(col("est") - col("exact_parts")).cast("double")
              / col("exact_parts") <= lit(0.05)).cast("int").as("merged_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
              count(DISTINCT l_orderkey % 8)::BIGINT AS n_shards,
              count(DISTINCT l_partkey)::BIGINT AS exact_parts,
              (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))::DOUBLE
                 / count(DISTINCT l_partkey) <= 0.05)::INT AS merged_ok
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ),

    // Salted skew join — [[graft.operators.SaltedJoin]] driven through
    // a fact⋈dim revenue rollup. The oracle is the PLAIN join: salting
    // must be result-invariant (the salt only chooses reducers), which
    // is exactly what the hash check proves. The build side carries a
    // merge-join hint so the salted exchange is real in the plan even
    // at test scale, where the 15k-row orders table would otherwise
    // broadcast and make the demo vacuous (at the operator's target
    // scale the build side is above the broadcast threshold by
    // definition — that's when you reach for salting).
    QueryDef(
      "q94_salted_skew_join",
      (s, dir) => {
        val probe = Tables.lineitem(s, dir).select(col("l_orderkey").as("okey"),
          col("l_extendedprice"), col("l_discount"), col("l_linenumber"))
        val build = Tables.orders(s, dir)
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
          .hint("merge")
        graft.operators.SaltedJoin.inner(probe, build, Seq("okey"),
            saltOn = struct(col("okey"), col("l_linenumber")), factor = 8)
          .groupBy(col("o_orderpriority"))
          .agg(
            Num.fround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""SELECT o_orderpriority,
              ${Num.froundSql("sum(l_extendedprice * (1 - l_discount))", 2)} AS revenue,
              count(*) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    ),

    // JOIN-SKEW AUDIT — the diagnostic that DECIDES when q94's
    // salting is needed: per-key row counts of a join key, the
    // count-distribution quantiles (via ExactMedian's bounded rank
    // selection — the counts table is derived-size), each hot key's
    // corpus share, and the recommended salt factor
    // ceil(cnt / target-rows-per-task) a pipeline would feed straight
    // into SaltedJoin(factor). The audited key synthesizes a hot key
    // the q94 way (the testdata's natural keys are uniform): ~70% of
    // rows collapse onto key 0, so the recommendation is non-trivial
    // (share ≈ 0.7, salt ≈ 0.7 · tasks).
    //
    // Scale shape: ONE fact-table aggregate (map-side partials) to
    // the per-key counts; everything after runs on the derived counts
    // table (quantile passes, top-5 TakeOrdered, broadcast scalars).
    // All decisions exact integers; share is the one rounded double.
    QueryDef(
      "q144_skew_audit",
      (s, dir) => {
        // staged per-key count table — the quantile walk, the totals,
        // and the top-5 listing all read the stored derived rows
        val c = graft.operators.Staged.parquet(s, s"q144keys|$dir") {
          Tables.lineitem(s, dir)
            .select(when(col("l_orderkey") % 10 < 7, 0L)
              .otherwise(col("l_orderkey")).as("key"))
            .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
            .withColumn("g", lit("all"))
        }
        // Count-of-counts quantiles: the count DISTRIBUTION has few
        // distinct values (multiplicities) even when the key space is
        // huge, so the exact discrete quantile is a cumulative walk
        // over the ≤|distinct multiplicities|-row aggregate — NOT an
        // ExactMedian range-bucket selection, whose buckets this
        // distribution's 5-orders-of-magnitude value skew collapses
        // into one (the documented sliver case: 3.8 → 0.9 s at
        // sf0.1). Same rank convention: smallest value whose
        // cumulative count reaches ceil(n·p).
        import org.apache.spark.sql.expressions.Window
        val cc = c.groupBy(col("cnt")).agg(count(lit(1)).as("k"))
        val wCum = Window.orderBy(col("cnt"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = cc.withColumn("cum", sum(col("k")).over(wCum))
          .crossJoin(broadcast(c.agg(count(lit(1)).as("nk"))))
        def qAt(p: Double) =
          min(when(col("cum") >= greatest(lit(1L),
            ceil(col("nk") * lit(p)).cast("long")), col("cnt")))
        val qd = cum.agg(qAt(0.5).as("p50"), qAt(0.99).as("p99"))
        val tot = c.agg(sum(col("cnt")).as("total"),
          count(lit(1)).as("n_keys"), max(col("cnt")).as("max_c"))
        c.orderBy(col("cnt").desc, col("key")).limit(5)
          .crossJoin(broadcast(qd))
          .crossJoin(broadcast(tot))
          .withColumn("tgt", expr("(total + 31) div 32"))
          .select(col("key"), col("cnt"),
            Num.fround(col("cnt").cast("double") / col("total"), 6).as("share"),
            col("n_keys"), col("total"), col("p50"), col("p99"), col("max_c"),
            expr("(cnt + tgt - 1) div tgt").as("salt_rec"))
          .orderBy(col("cnt").desc, col("key"))
      },
      Some(s"""WITH c AS (
                 SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
                             ELSE l_orderkey END AS key,
                   count(*)::BIGINT AS cnt
                 FROM lineitem GROUP BY 1),
               tot AS (
                 SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_keys,
                   max(cnt)::BIGINT AS max_c,
                   quantile_disc(cnt, 0.5)::BIGINT AS p50,
                   quantile_disc(cnt, 0.99)::BIGINT AS p99
                 FROM c),
               t AS (SELECT *, (total + 31) // 32 AS tgt FROM tot)
               SELECT key, cnt,
                 ${Num.froundSql("cnt::DOUBLE / total", 6)} AS share,
                 n_keys, total, p50, p99, max_c,
                 ((cnt + tgt - 1) // tgt)::BIGINT AS salt_rec
               FROM c, t ORDER BY cnt DESC, key LIMIT 5"""),
    ),

    // Binary-payload plumbing at the expression layer: byte length,
    // byte-slice fingerprints, strided frame sampling — the codegen'd
    // complement of operators.Multimodal's mapPartitions stage.
    QueryDef(
      "q46_binary_plumbing",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            octet_length(col("text")).as("n_bytes"),
            hex(substring(col("text").cast("binary"), 1, 8)).as("head_hex"),
            md5(substring(col("text"), 1, 32)).as("slice_fp"),
            // greatest(.., 1): Spark's sequence ABORTS on (1, 0, 16)
            // where DuckDB's generate_series returns empty — an empty
            // document must sample to '' on both engines, not kill the
            // stage (substring('', 1, 1) joins to '' = the empty
            // series' join, so the values still match exactly).
            expr("array_join(transform(sequence(1, greatest(length(text), 1), 16), i -> substring(text, i, 1)), '')")
              .as("strided_sample"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
              strlen(text) AS n_bytes,
              -- first 8 BYTES as hex (left on the hex string, 2 hex
              -- chars per byte): substr(text,...) before encode()
              -- slices CHARACTERS and diverges from the engine's
              -- binary slice on any multibyte document
              left(hex(encode(text)), 16) AS head_hex,
              md5(substr(text, 1, 32)) AS slice_fp,
              -- coalesce: array_to_string([], '') is NULL in DuckDB
              -- where the engine's empty-doc sample is ''
              coalesce(array_to_string([substr(text, i, 1) for i in generate_series(1, length(text), 16)], ''), '') AS strided_sample
              FROM documents ORDER BY doc_id"""),
    ),

    // S5 keyed upsert, latest-wins: customer base + order-derived
    // updates; highest (version, tiebreak) survives per key.
    QueryDef(
      "q47_upsert_latest_wins",
      (s, dir) => {
        val base = Tables.customer(s, dir).select(
          col("c_custkey"), col("c_acctbal"),
          lit(0L).as("version"), lit(-1L).as("src_id"))
        val updates = Tables.orders(s, dir).select(
          col("o_custkey").as("c_custkey"), col("o_totalprice").as("c_acctbal"),
          unix_timestamp(col("o_orderdate")).as("version"), col("o_orderkey").as("src_id"))
        Upsert.latestWins(base, updates, Seq("c_custkey"), col("version"), col("src_id"))
          .select(col("c_custkey"), Num.fround(col("c_acctbal"), 2).as("balance"),
            col("version"), col("src_id"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH all_rows AS (
                SELECT c_custkey, c_acctbal, 0::BIGINT AS version, (-1)::BIGINT AS src_id FROM customer
                UNION ALL
                SELECT o_custkey, o_totalprice, epoch(o_orderdate)::BIGINT, o_orderkey FROM orders)
              SELECT c_custkey, floor((c_acctbal) * 100 + 0.5) / 100 AS balance, version, src_id
              FROM all_rows
              QUALIFY row_number() OVER (PARTITION BY c_custkey ORDER BY version DESC, src_id DESC) = 1
              ORDER BY c_custkey"""),
    ),

    // Pivot: per-cohort event-type grid as fixed columns. Spark's
    // pivot() with an explicit value list ↔ conditional aggregation.
    QueryDef(
      "q48_event_pivot",
      (s, dir) =>
        Tables.events(s, dir)
          .select((col("user_id") % 10).as("cohort"), col("event_type"), col("value"))
          .groupBy(col("cohort"))
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(Num.fround(sum(col("value")), 2))
          .orderBy(col("cohort")),
      Some {
        val cols = Seq("click", "view", "purchase", "signup", "error").map { t =>
          s"${Num.froundSql(s"sum(CASE WHEN event_type = '$t' THEN value END)", 2)} AS $t"
        }.mkString(",\n               ")
        s"""SELECT user_id % 10 AS cohort,
               $cols
               FROM events GROUP BY cohort ORDER BY cohort"""
      },
    ),

    // Set operations: INTERSECT / EXCEPT over key sets (engine surface
    // beyond the reference's implicit union, SURVEY §2.5 note).
    QueryDef(
      "q49_set_ops",
      (s, dir) => {
        val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
        val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
        cn.intersect(sn).withColumn("tag", lit("both"))
          .unionAll(cn.except(sn).withColumn("tag", lit("cust_only")))
          .orderBy(col("tag"), col("nationkey"))
      },
      Some("""SELECT nationkey, 'both' AS tag FROM
                (SELECT DISTINCT c_nationkey AS nationkey FROM customer
                 INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
              UNION ALL
              SELECT nationkey, 'cust_only' AS tag FROM
                (SELECT DISTINCT c_nationkey AS nationkey FROM customer
                 EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
              ORDER BY tag, nationkey"""),
    ),

    // Scalar-subquery pattern: orders above the global average price.
    // DataFrame form = broadcast single-row aggregate (the plan Spark
    // produces for an uncorrelated scalar subquery).
    QueryDef(
      "q50_above_avg_orders",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val avgPrice = o.agg(avg(col("o_totalprice")).as("avg_price"))
        o.crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("avg_price"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), Num.fround(min(col("o_totalprice")), 2).as("min_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              floor((min(o_totalprice)) * 100 + 0.5) / 100 AS min_price
              FROM orders
              WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
              GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    ),

    // As-of join: for each event, the customer's most recent order at
    // or before the event time (union + carry-forward — one shuffle,
    // no fanout; see operators.AsOfJoin).
    QueryDef(
      "q51_asof_join",
      (s, dir) => {
        val probe = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000000000").as("ts_s"))
        val build = Tables.orders(s, dir)
          .select(col("o_custkey").as("user_id"),
            unix_timestamp(col("o_orderdate")).as("order_ts"),
            col("o_orderkey"), col("o_totalprice"))
        AsOfJoin.asOf(probe, "ts_s", build, "order_ts", "user_id", "o_orderkey")
          .select(col("event_id"), col("user_id"),
            col("__matched.o_orderkey").as("o_orderkey"),
            Num.fround(col("__matched.o_totalprice"), 2).as("order_price"))
          .orderBy(col("event_id"))
      },
      // Oracle ranks the match per DISTINCT (user, ts) and joins back
      // to every probe row, NOT row_number'd per event_id: an as-of
      // join is per probe ROW, and a replayed event (at-least-once
      // delivery duplicates the whole row, event_id included) must
      // emit once per occurrence — partitioning by event_id silently
      // collapsed the duplicate (adversarial-fixture find).
      Some("""WITH probe AS (
                SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s FROM events),
              best AS (
                SELECT q.user_id, q.ts_s, o.o_orderkey, o.o_totalprice,
                  row_number() OVER (PARTITION BY q.user_id, q.ts_s
                    ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC) AS rn
                FROM (SELECT DISTINCT user_id, ts_s FROM probe) q
                LEFT JOIN orders o
                  ON o.o_custkey = q.user_id AND epoch(o.o_orderdate) <= q.ts_s)
              SELECT p.event_id, p.user_id, b.o_orderkey,
                floor((b.o_totalprice) * 100 + 0.5) / 100 AS order_price
              FROM probe p JOIN best b
                ON b.user_id = p.user_id AND b.ts_s = p.ts_s AND b.rn = 1
              ORDER BY p.event_id"""),
    ),

    // CUBE grouping sets (all four grouping combinations).
    QueryDef(
      "q55_cube_summary",
      (s, dir) =>
        Tables.orders(s, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Num.fround(sum(col("o_totalprice")), 2).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
            col("n"), col("total"))
          .orderBy(col("status"), col("priority")),
      Some("""SELECT coalesce(o_orderstatus, '(all)') AS status,
              coalesce(o_orderpriority, '(all)') AS priority,
              count(*) AS n,
              floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total
              FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
              ORDER BY status, priority"""),
    ),

    // Exact order statistics: median (exact, not the q45 sketch) and
    // sample stddev per group. Both engines average the two middle
    // values for even counts; stddev floor-rounded (different
    // accumulation algorithms agree to ~1e-9, far inside 4 decimals).
    // The median comes from `operators.ExactMedian` (bucketed rank
    // selection, every buffer bounded) — Spark's own `median` is an
    // ImperativeAggregate that buffers the whole group, the q84
    // collect_list shape in disguise. The stddev/count stay a codegen
    // hash aggregate; the 3-row median table broadcasts back.
    QueryDef(
      "q56_exact_stats",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val med = priceStats(s, dir)
          .select(col("l_returnflag"), col("median_raw").as("__median_raw"))
        li.groupBy(col("l_returnflag"))
          .agg(
            Num.fround(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
            count(lit(1)).as("n"))
          .join(broadcast(med), Seq("l_returnflag"))
          .select(
            col("l_returnflag"),
            Num.fround(col("__median_raw"), 2).as("median_price"),
            col("sd_price"), col("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
              floor((median(l_extendedprice)) * 100 + 0.5) / 100 AS median_price,
              floor((stddev_samp(l_extendedprice)) * 10000 + 0.5) / 10000 AS sd_price,
              count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ),

    // Edit distance (the fuzzy-matching primitive behind name
    // resolution at the next level of tolerance beyond NFKC).
    QueryDef(
      "q57_edit_distance",
      (s, dir) =>
        Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"),
            levenshtein(col("s_name"), lit("Supplier#000000001")).as("dist"))
          .orderBy(col("s_suppkey")),
      Some("""SELECT s_suppkey, s_name,
              levenshtein(s_name, 'Supplier#000000001')::INT AS dist
              FROM supplier ORDER BY s_suppkey"""),
    ),

    // Data-quality validation profile — the expectations gate a
    // pipeline runs before publishing a table: row count, null
    // checks, domain checks, key uniqueness, referential integrity.
    // ONE pass over the fact computes every scalar check (a stack()
    // unpivot of a single aggregate row); the FK check is the only
    // second pass (anti-join against the broadcastable dim). All
    // outputs are exact integers.
    QueryDef(
      "q74_data_quality",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val dim = Tables.customer(s, dir)
        // dup_orderkey lives in its OWN two-level aggregate: mixed with
        // the plain sums it would plan an Expand doubling every fact
        // row at the scan (the q45 lesson). sum(per-key count - 1)
        // ≡ total - distinct, with map-side partials on the key.
        val base = o.agg(
          count(lit(1)).as("rows_total"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpositive_totalprice"),
          sum(when(col("o_orderdate") > to_date(lit("1998-12-31")), 1L)
            .otherwise(0L)).as("future_orderdate"))
        // A NULL-key group contributes ALL its rows, not c-1: the
        // oracle's count(*) - count(DISTINCT o_orderkey) counts every
        // NULL-key row (DISTINCT excludes NULLs entirely), so the
        // two-level rewrite must too — sum(c-1) alone diverges the
        // moment a NULL o_orderkey appears.
        val dup = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(when(col("o_orderkey").isNull, col("c"))
            .otherwise(col("c") - 1)), lit(0L)).cast("long").as("dup_orderkey"))
        val orphans = o
          .join(dim.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("orphan_custkey"))
        base.crossJoin(broadcast(dup)).crossJoin(orphans)
          .select(expr(
            """stack(6,
                 'rows_total', rows_total,
                 'null_custkey', null_custkey,
                 'nonpositive_totalprice', nonpositive_totalprice,
                 'dup_orderkey', dup_orderkey,
                 'future_orderdate', future_orderdate,
                 'orphan_custkey', orphan_custkey) AS (chk, violations)"""))
          .orderBy(col("chk"))
      },
      Some("""WITH base AS (
                SELECT count(*)::BIGINT AS rows_total,
                  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_custkey,
                  sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS nonpositive_totalprice,
                  (count(*) - count(DISTINCT o_orderkey))::BIGINT AS dup_orderkey,
                  sum(CASE WHEN o_orderdate > DATE '1998-12-31' THEN 1 ELSE 0 END)::BIGINT AS future_orderdate
                FROM orders),
              orph AS (
                -- NOT EXISTS, not NOT IN: NOT IN returns NULL (row
                -- dropped) for a NULL o_custkey and zeroes the whole
                -- count if any c_custkey is NULL — exactly the dirty
                -- shapes this check exists to catch. NOT EXISTS
                -- matches Spark's left_anti: NULL keys are orphans.
                SELECT count(*)::BIGINT AS orphan_custkey FROM orders o
                WHERE NOT EXISTS (
                  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
              SELECT chk, violations FROM (
                SELECT 'rows_total' AS chk, rows_total AS violations FROM base
                UNION ALL SELECT 'null_custkey', null_custkey FROM base
                UNION ALL SELECT 'nonpositive_totalprice', nonpositive_totalprice FROM base
                UNION ALL SELECT 'dup_orderkey', dup_orderkey FROM base
                UNION ALL SELECT 'future_orderdate', future_orderdate FROM base
                UNION ALL SELECT 'orphan_custkey', orphan_custkey FROM orph)
              ORDER BY chk"""),
    ),

    // Range join — point-in-interval lookup against a small interval
    // dimension (price bands), the non-equi join family (as-of's
    // batch sibling; reference analog: rank-tier bucketing,
    // dashboard/app.py style cuts). The interval table is literal and
    // tiny, so the plan is a BroadcastNestedLoopJoin: the fact side
    // streams through the broadcast band list with NO shuffle — the
    // only shape under which a non-equi join survives 100 TB (a
    // shuffled theta-join would not; if the dim outgrew a broadcast,
    // the scale path is binning both sides to equi-keys first).
    QueryDef(
      "q82_range_join",
      (s, dir) => {
        import s.implicits._
        // The top band is open-ended (1e12 ≫ any price): an order can
        // never fall outside every interval and silently vanish from
        // the inner join — a latent-loss hazard if the price
        // distribution ever outgrows a closed band list.
        val bands = Seq(
          (0, 0d, 100000d), (1, 100000d, 200000d), (2, 200000d, 300000d),
          (3, 300000d, 400000d), (4, 400000d, 1e12),
        ).toDF("band_id", "lo", "hi")
        Tables.orders(s, dir)
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band_id"))
          .agg(count(lit(1)).as("n_orders"),
            Num.fround(sum(col("o_totalprice")), 2).as("sum_price"))
          .orderBy(col("band_id"))
      },
      Some("""WITH bands(band_id, lo, hi) AS (VALUES
                (0, 0.0, 100000.0), (1, 100000.0, 200000.0), (2, 200000.0, 300000.0),
                (3, 300000.0, 400000.0), (4, 400000.0, 1e12))
              SELECT band_id, count(*)::BIGINT AS n_orders,
                floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS sum_price
              FROM orders o JOIN bands b
                ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
              GROUP BY band_id ORDER BY band_id"""),
    ),

    // SCD type-2 dimension build — compress each customer's order
    // stream into priority-validity intervals (gaps-and-islands change
    // detection): a version starts where o_orderpriority differs from
    // the previous order, valid_to is the next version's start, the
    // open interval is flagged current. The classic CDC-history →
    // warehouse-dimension ETL op; the reference's upsert sinks only
    // keep latest state (transformer_loader/main.py:184-190) — this is
    // the history-preserving variant.
    //
    // Scale: two window passes over the SAME (custkey, date, key)
    // ordering — one shuffle+sort total (Catalyst reuses the sort for
    // both lag and lead); key cardinality grows with customers; change
    // compression shrinks output before the final sort. No joins.
    QueryDef(
      "q88_scd2_intervals",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("ts"), col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderpriority").as("prio"),
            unix_timestamp(col("o_orderdate")).as("ts"))
          .withColumn("changed",
            lag(col("prio"), 1).over(w).isNull
              || lag(col("prio"), 1).over(w) =!= col("prio"))
          .filter(col("changed"))
          .withColumn("version", row_number().over(w))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("o_custkey"), col("version"), col("prio"),
            col("ts").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"))
          .orderBy(col("o_custkey"), col("version"))
      },
      Some("""WITH o AS (
                SELECT o_custkey, o_orderkey, o_orderpriority AS prio,
                  epoch(o_orderdate)::BIGINT AS ts,
                  lag(o_orderpriority, 1) OVER w AS prev
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
              v AS (
                SELECT o_custkey, prio, ts,
                  row_number() OVER w AS version,
                  lead(ts, 1) OVER w AS valid_to
                FROM o WHERE prev IS NULL OR prev <> prio
                WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, o_orderkey))
              SELECT o_custkey, version, prio, ts AS valid_from, valid_to,
                (valid_to IS NULL) AS is_current
              FROM v ORDER BY o_custkey, version"""),
    ),

    // Exact per-group quantile PROFILE (p25/p50/p75/p99) — the length/
    // price distribution card a curation pipeline prints per corpus
    // slice. DISCRETE quantiles (value at rank ceil(p·n), DuckDB's
    // quantile_disc): the answer is an exact data element, so the
    // cross-engine hash comparison is float-exact — no interpolation
    // arithmetic to diverge at rounding boundaries. All four ranks
    // resolve through ONE shared ExactMedian histogram build: asking
    // for four quantiles costs the same three bounded passes as one
    // median, and no aggregation buffer ever holds a group.
    QueryDef(
      "q106_exact_quantiles",
      (s, dir) =>
        priceStats(s, dir)
          .select(col("l_returnflag"), col("p25"), col("p50"), col("p75"), col("p99"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
              quantile_disc(l_extendedprice, 0.25) AS p25,
              quantile_disc(l_extendedprice, 0.5) AS p50,
              quantile_disc(l_extendedprice, 0.75) AS p75,
              quantile_disc(l_extendedprice, 0.99) AS p99
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ),

    // Mergeable log-bucketed quantile SKETCH (operators/LogQuantile,
    // the DDSketch recipe) against its own exact ground truth — the
    // quantile story for the STREAMING stats path (the sketch state
    // is a plain update-mode aggregation; stream ≡ batch is spec'd in
    // StreamingSpec) and for shard rollups, where ExactMedian's three
    // batch passes don't apply. The sketch's bucket midpoints carry a
    // HARD α=1% relative-error guarantee, so the oracle emits literal
    // 1s (the q91/q92 hard-guarantee pattern) while the exact
    // discrete quantiles (rank ceil(p·n), an exact data element) and
    // counts hash-match cross-engine. Sketch estimates themselves
    // never ride in hashed columns (libm ln/pow — engine-specific).
    QueryDef(
      "q113_quantile_sketch",
      (s, dir) => {
        import graft.operators.LogQuantile
        val li = Tables.lineitem(s, dir).filter(col("l_extendedprice") > 0)
        val ps = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99)
        val sk = LogQuantile.sketch(li, Seq("l_returnflag"), col("l_extendedprice"))
        val est = LogQuantile.quantiles(sk, Seq("l_returnflag"),
          ps.map { case (nm, p) => s"e$nm" -> p })
        def ok(p: String) =
          (abs(col(s"ep$p") - col(s"p$p")) / col(s"p$p") <= lit(LogQuantile.Alpha * 1.001))
            .cast("int").as(s"ok$p")
        broadcast(posPriceStats(s, dir))
          .join(broadcast(est), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n"),
            col("p50"), col("p95"), col("p99"),
            ok("50"), ok("95"), ok("99"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH base AS (
                SELECT l_returnflag, l_extendedprice FROM lineitem
                WHERE l_extendedprice > 0)
              SELECT l_returnflag, count(*)::BIGINT AS n,
                quantile_disc(l_extendedprice, 0.5) AS p50,
                quantile_disc(l_extendedprice, 0.95) AS p95,
                quantile_disc(l_extendedprice, 0.99) AS p99,
                1 AS ok50, 1 AS ok95, 1 AS ok99
              FROM base GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ),

    // Z-order layout statistics — the data-skipping proof for
    // operators/ZOrder.scala. Orders are coded on (customer, order
    // day): x = o_custkey masked to 16 bits, y = days since
    // 1995-01-01 (exact integer epoch-day arithmetic — the corpus
    // spans ~2 400 days, 12 bits), z = the 32-bit Morton interleave.
    // Each fixed-width z-range (z >> 16 — deterministic buckets, so
    // the oracle can mirror them; the write path would use
    // repartitionByRange instead, ZOrder.layout) reports its row
    // count and its min/max span on BOTH dims — the exact numbers a
    // parquet footer would carry per file after a z-ordered write,
    // and therefore the skipping bound for any 2-D predicate:
    // a (custkey, date-range) filter touches only buckets whose
    // [min,max] boxes intersect it. A date-sorted layout would show
    // span_cust ≈ full key range in every bucket; the z layout keeps
    // both spans bounded (the bucket's bit prefix pins the top 8 bits
    // of each dim).
    //
    // Scale shape: the z code is a narrow map (32 codegen shift/mask
    // terms); the per-bucket stats are one HashAggregate over ~2^8
    // keys with map-side partials — the cheapest possible layout
    // audit, and the same plan at any corpus size.
    QueryDef(
      "q121_zorder_layout",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(
          expr("cast(o_custkey & 65535 as bigint)").as("x"),
          expr("cast(unix_timestamp(o_orderdate) div 86400 as bigint) - 9131").as("y"))
        o.withColumn("z", graft.operators.ZOrder.zvalue(col("x"), col("y")))
          .withColumn("bucket", shiftright(col("z"), 16))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("x")).as("min_cust"), max(col("x")).as("max_cust"),
            min(col("y")).as("min_day"), max(col("y")).as("max_day"))
          .select(col("bucket"), col("n"),
            col("min_cust"), col("max_cust"),
            (col("max_cust") - col("min_cust") + 1L).as("span_cust"),
            col("min_day"), col("max_day"),
            (col("max_day") - col("min_day") + 1L).as("span_day"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH d AS (
                 SELECT (o_custkey & 65535)::BIGINT AS x,
                   (epoch(o_orderdate)::BIGINT // 86400) - 9131 AS y
                 FROM orders),
               z AS (
                 SELECT x, y, ${graft.operators.ZOrder.zvalueSql("x", "y")} AS z
                 FROM d)
               SELECT z >> 16 AS bucket, count(*)::BIGINT AS n,
                 min(x) AS min_cust, max(x) AS max_cust,
                 max(x) - min(x) + 1 AS span_cust,
                 min(y) AS min_day, max(y) AS max_day,
                 max(y) - min(y) + 1 AS span_day
               FROM z GROUP BY bucket ORDER BY bucket"""),
    ),

    // Grouped least-squares regression from EXACT integer moment sums
    // — the in-database ML primitive (per-group trend in ONE pass over
    // the fact table): slope / intercept / r² of extendedprice ~
    // quantity per supplier nation. The q102 determinism recipe
    // extended to second moments: quantity is already integral and
    // price is a 2-decimal rational, so x and y·100 are exact BIGINTs
    // and every moment sum (n, Σx, Σy, Σxy, Σx², Σy²) is an exact
    // integer — the regression closed forms then run on identical
    // doubles in both engines (each sum cast to double BEFORE any
    // product, because n·Σxy at corpus scale exceeds both 2^53 and
    // BIGINT — the double product is correctly rounded identically,
    // while a BIGINT product would overflow DuckDB). Σy² alone
    // exceeds long range, so it accumulates in decimal(38,0) (Spark)
    // / HUGEINT (DuckDB) — both exact, both cast to the same double.
    //
    // Scale shape: two broadcast dim hops (supplier, nation) onto the
    // fact scan, then ONE HashAggregate with map-side partials over
    // 25 keys — moments are associative/commutative, so partials
    // collapse per mapper before the exchange; this is the plan shape
    // that turns a 100 TB regression into a scan.
    QueryDef(
      "q123_grouped_regression",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(
          col("l_suppkey"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
        val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        val nat = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        val m = li
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
        val (nD, sxD, syD, sxyD, sxxD, syyD) =
          (col("n").cast("double"), col("sx").cast("double"),
            col("sy").cast("double"), col("sxy").cast("double"),
            col("sxx").cast("double"), col("syy").cast("double"))
        val cov = nD * sxyD - sxD * syD
        val varX = nD * sxxD - sxD * sxD
        val varY = nD * syyD - syD * syD
        // y is in cents: slope/intercept divide by 100 LAST, mirrored.
        m.select(col("n_name"), col("n"),
            Num.fround(cov / varX / 100.0, 6).as("slope"),
            Num.fround((syD - cov / varX * sxD) / nD / 100.0, 4).as("intercept"),
            Num.fround(cov * cov / (varX * varY), 6).as("r2"))
          .orderBy(col("n_name"))
      },
      Some("""WITH pts AS (
                SELECT n_name, l_quantity::BIGINT AS x,
                  floor(l_extendedprice * 100 + 0.5)::BIGINT AS y
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey),
              m AS (
                SELECT n_name, count(*)::BIGINT AS n,
                  sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                  sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
                  sum(y::HUGEINT * y) AS syy
                FROM pts GROUP BY n_name),
              d AS (
                SELECT n_name, n,
                  n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
                  sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd, syy::DOUBLE AS syyd
                FROM m)
              SELECT n_name, n,
                floor((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) / 100
                  * 1000000 + 0.5) / 1000000 AS slope,
                floor((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd)
                  / nd / 100 * 10000 + 0.5) / 10000 AS intercept,
                floor((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
                  / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
                  * 1000000 + 0.5) / 1000000 AS r2
              FROM d ORDER BY n_name"""),
    ),

    // Snapshot diff / CDC — the change-data-capture primitive between
    // two corpus versions (the Delta CDF `table_changes` shape, and
    // the reference's `processed:False` incremental contract read
    // backwards: WHAT changed since the last run, derived from state,
    // not from a log). Two deterministic snapshots derive from the
    // shipped corpus (old drops doc_id ≡ 3 mod 11; new drops ≡ 5 mod
    // 13 and rewrites every ≡ 0 mod 7 text), a full-outer join on the
    // key classifies every id as added / removed / changed /
    // unchanged by CONTENT HASH (md5 — renames of identical bytes
    // stay 'unchanged', the dedup-friendly definition), and the
    // output is one bounded row per class: exact counts, id sums,
    // min/max, and an order-independent bit_xor fold of a 60-bit
    // row digest — the commutative digest that lets 1000 executors
    // fold partition-local XORs with no ordered collect anywhere.
    //
    // Scale shape: the classify join is corpus ⋈ corpus on the
    // primary key — the one join family that SHOULD shuffle (hygiene
    // allowlist), and the one that stops shuffling the day snapshots
    // are written bucketed by key (storage-partitioned join); the
    // aggregate above it is 4 groups with map-side partials.
    QueryDef(
      "q127_snapshot_diff",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val old = docs.filter(col("doc_id") % 11 =!= 3)
          .select(col("doc_id"), md5(col("text")).as("h_old"))
        val nw = docs.filter(col("doc_id") % 13 =!= 5)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
              .otherwise(col("text"))).as("h_new"))
        old.join(nw, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("h_old").isNull, "added")
              .when(col("h_new").isNull, "removed")
              .when(col("h_old") =!= col("h_new"), "changed")
              .otherwise("unchanged").as("change_type"),
            expr("""cast(conv(substring(md5(concat(cast(doc_id as string), ':',
                    coalesce(h_old, ''), ':', coalesce(h_new, ''))), 1, 15), 16, 10)
                    as bigint)""").as("rh"))
          .groupBy(col("change_type"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"),
            expr("bit_xor(rh)").as("digest"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("change_type"))
      },
      Some("""WITH old AS (
                SELECT doc_id, md5(text) AS h_old FROM documents
                WHERE doc_id % 11 != 3),
              nw AS (
                SELECT doc_id,
                  md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
                      ELSE text END) AS h_new
                FROM documents WHERE doc_id % 13 != 5),
              d AS (
                SELECT coalesce(old.doc_id, nw.doc_id) AS doc_id, h_old, h_new
                FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id),
              c AS (
                SELECT doc_id,
                  CASE WHEN h_old IS NULL THEN 'added'
                       WHEN h_new IS NULL THEN 'removed'
                       WHEN h_old <> h_new THEN 'changed'
                       ELSE 'unchanged' END AS change_type,
                  ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                    coalesce(h_old, '') || ':' || coalesce(h_new, '')), 1, 15))::BIGINT AS rh
                FROM d)
              SELECT change_type, count(*)::BIGINT AS n,
                sum(doc_id)::BIGINT AS sum_id, bit_xor(rh) AS digest,
                min(doc_id) AS min_id, max(doc_id) AS max_id
              FROM c GROUP BY change_type ORDER BY change_type"""),
    ),

    // Count-Min sketch — the third mergeable sketch family (q45/q93
    // HLL count DISTINCT cardinality, q91 Misra-Gries finds WHICH
    // keys are heavy; CMS answers point FREQUENCY queries for any key
    // in O(d) from O(d·w) state). Four md5-derived hash rows × 256
    // counters over the corpus token stream; every cell is an exact
    // integer and the whole 1024-cell sketch is a plain (row, bucket)
    // aggregate — partition-local sketches merge by cell-wise sum,
    // the textbook distributed shape. Every vocabulary term is then
    // probed: est = min over rows of its cell, true count from the
    // exact aggregate. The one-sided CMS guarantee est ≥ true is HARD
    // (hash collisions only ever add) — literal 1 on the oracle side,
    // any under-count turns the row red; the ε-bound column
    // (est ≤ true + ceil(eN/w)) is probabilistic, so it rides
    // hash-matched (both engines compute identical sketches), not as
    // a literal. At 31 terms × 256 buckets collisions are rare and
    // most estimates are exact; the guarantee columns are what the
    // oracle enforces.
    QueryDef(
      "q128_countmin_sketch",
      (s, dir) => {
        val W = 256
        // The token stream is NOT cached: the explode is a narrow map
        // over a column-pruned scan, and materializing ~n_tokens tiny
        // rows costs more than recomputing them (measured 1.3 s of
        // cache build vs 0.25 s of re-scan at sf0.1). The grand total
        // folds off the (tiny) truth table instead of a third pass.
        val occ = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("term"))
        // The 4 row-hashes are disjoint 24-bit SLICES of one md5 per
        // token (vs one md5 per (row, token): 4× fewer digest
        // computations on the hot path, same independence — md5 bits
        // are pairwise independent across slices). posexplode keeps
        // the hash row implicit: pos = row index r.
        def buckets = posexplode(array((0 until 4).map(r =>
          expr(s"cast(conv(substring(md5(term), ${1 + 6 * r}, 6), 16, 10) as bigint) % $W")): _*))
        val cells = occ.select(buckets.as(Seq("r", "bucket")))
          .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))
        val truth = occ.groupBy(col("term")).agg(count(lit(1)).as("true_cnt"))
        val total = truth.agg(sum(col("true_cnt")).as("n_total"))
        val probes = truth.select(col("term"), col("true_cnt"),
          buckets.as(Seq("r", "bucket")))
        probes.join(broadcast(cells), Seq("r", "bucket"))
          .groupBy(col("term"), col("true_cnt"))
          .agg(min(col("cnt")).as("est_cnt"))
          .crossJoin(broadcast(total))
          .select(col("term"), col("true_cnt"), col("est_cnt"),
            (col("est_cnt") >= col("true_cnt")).cast("int").as("over_ok"),
            (col("est_cnt") <= col("true_cnt")
              + ceil(lit(math.E) * col("n_total") / lit(W.toDouble)).cast("long"))
              .cast("int").as("within_eps"))
          .orderBy(col("term"))
      },
      Some("""WITH occ AS (
                SELECT unnest(string_split(text, ' ')) AS term FROM documents),
              cells AS (
                SELECT r, bucket, count(*) AS cnt FROM (
                  SELECT r,
                    ('0x' || substr(md5(term), 1 + 6 * r, 6))::BIGINT % 256 AS bucket
                  FROM occ, generate_series(0, 3) AS g(r))
                GROUP BY r, bucket),
              truth AS (
                SELECT term, count(*) AS true_cnt FROM occ GROUP BY term),
              total AS (SELECT count(*) AS n_total FROM occ),
              probes AS (
                SELECT term, true_cnt, r,
                  ('0x' || substr(md5(term), 1 + 6 * r, 6))::BIGINT % 256 AS bucket
                FROM truth, generate_series(0, 3) AS g(r)),
              est AS (
                SELECT term, true_cnt, min(cnt) AS est_cnt
                FROM probes JOIN cells USING (r, bucket)
                GROUP BY term, true_cnt)
              SELECT term, true_cnt::BIGINT AS true_cnt, est_cnt::BIGINT AS est_cnt,
                1 AS over_ok,
                (est_cnt <= true_cnt + ceil(2.718281828459045 * n_total / 256))::INT AS within_eps
              FROM est, total ORDER BY term"""),
    ),
  )
}
