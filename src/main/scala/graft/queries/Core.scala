package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Num

/** Core relational operator set — every projection / filter / join /
  * aggregation / sort / window operator from the reference's inventory
  * (SURVEY.md §2), re-expressed as declarative DataFrame programs on
  * the driver's TPC-H-ish tables.
  *
  * Scale notes (100 TB posture): dimension joins (`customer`, `nation`,
  * `region`) are explicit `broadcast()`s — at production scale those
  * dims stay MB-sized while facts grow, so the broadcast-hash-join
  * choice survives the scale-up and removes the shuffle on the fact
  * side entirely. Group-bys aggregate partially map-side (Spark
  * HashAggregate does this automatically); windows are always
  * partitioned by a key (never a global window over the fact table).
  */
object Core {

  /** E3 read path transplanted (SURVEY §3): per-customer order summary =
    * J1 broadcast join + A1 hash agg + derived winrate (C4) + O1 sort.
    * Reference: api_service/main.py:311-373 (stats endpoint),
    * transformer_loader/main.py:184-190 (per-key counters). */
  def flagshipCustomerStats(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(lit(1)).as("games"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("wins"),
        Num.fround(sum(col("o_totalprice")), 2).as("total_spent"),
      )
      .withColumn("winrate", Num.fround(col("wins") * 100.0 / col("games"), 1))
      .orderBy(col("games").desc, col("c_custkey"))
      .limit(100)
  }

  val flagshipSql: String =
    """SELECT c_custkey, c_name, count(*) AS games,
       sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS wins,
       floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_spent,
       floor((sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT * 100.0 / count(*)) * 10 + 0.5) / 10 AS winrate
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_custkey, c_name
       ORDER BY games DESC, c_custkey LIMIT 100"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_flagship_customer_stats", flagshipCustomerStats, Some(flagshipSql)),

    // A1/A4 — hash group-by with derived metrics (TPC-H Q1 shape).
    // Reference: api_service/main.py:340-358 per-champion aggregate.
    QueryDef(
      "q02_pricing_summary",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Num.fround(sum(col("l_quantity")), 2).as("sum_qty"),
            Num.fround(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            Num.fround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
            Num.fround(avg(col("l_quantity")), 2).as("avg_qty"),
            Num.fround(avg(col("l_extendedprice")), 2).as("avg_price"),
            count(lit(1)).as("count_order"),
          )
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
              floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
              floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
              floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
              floor((avg(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
              floor((avg(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
              count(*) AS count_order
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus"""),
    ),

    // P1 + C1-C3 — flattening projection with derived per-row metrics
    // and the max(1, x) zero-guard. Reference:
    // transformer_loader/main.py:147-177 (clean-row derivation),
    // :153 kda divisor clamp, :156 cs_min guard.
    QueryDef(
      "q03_derived_projection",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            Num.fround(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("revenue"),
            Num.fround(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 2).as("charge"),
            // floor(x*100+0.5)/100 instead of round(): pure IEEE double
            // ops are bit-identical across engines, while Spark's
            // BigDecimal HALF_UP and DuckDB's decimal rounding disagree
            // on values like 0.335 (SURVEY.md §5.3).
            (floor(((col("l_quantity") + col("l_discount")) / greatest(col("l_linenumber"), lit(1))) * 100 + 0.5) / 100).as("ratio"),
            date_format(col("l_shipdate"), "dd/MM").as("ship_dm"),
          )
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
              floor((l_extendedprice * (1.0 - l_discount)) * 100 + 0.5) / 100 AS revenue,
              floor((l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) * 100 + 0.5) / 100 AS charge,
              floor(((l_quantity + l_discount) / greatest(l_linenumber, 1)) * 100 + 0.5) / 100 AS ratio,
              strftime(l_shipdate, '%d/%m') AS ship_dm
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1997-01-01'
              ORDER BY l_orderkey, l_linenumber"""),
    ),

    // A5/O4 — distinct + sort. Reference: api_service/main.py:101
    // sorted(set(summoner names)).
    QueryDef(
      "q04_distinct_segments",
      (s, dir) =>
        Tables.customer(s, dir).select(col("c_mktsegment"))
          .distinct().orderBy(col("c_mktsegment")),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"),
    ),

    // O1 — sort + limit serving scan. Reference: api_service/main.py:334-338
    // (newest 300 matches). Spark plans this as TakeOrderedAndProject —
    // no global sort materialization.
    QueryDef(
      "q05_latest_orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
          .limit(300)
          .select(
            col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            unix_timestamp(col("o_orderdate")).as("order_epoch")),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
              epoch(o_orderdate)::BIGINT AS order_epoch
              FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 300"""),
    ),

    // O2 — per-group top-K retention (the reference's only windowed
    // computation): keep newest K rows per key with a deterministic
    // tiebreak. Reference: api_service/main.py:236-249 (trim to 200/puuid).
    QueryDef(
      "q06_topk_per_customer",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"),
            unix_timestamp(col("o_orderdate")).as("order_epoch"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey,
              row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
              epoch(o_orderdate)::BIGINT AS order_epoch
              FROM orders
              QUALIFY rn <= 5
              ORDER BY o_custkey, rn"""),
    ),

    // J3/F6 — anti-join orphan scan. Reference: api_service/main.py:220-223
    // ($nin orphan purge).
    QueryDef(
      "q07_orphan_customers",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
              ORDER BY c_custkey"""),
    ),

    // J4/J5 — existence semi-join. Reference: extractor/main.py:413-414
    // (skip already-ingested match ids).
    QueryDef(
      "q08_fulfilled_customers",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
              ORDER BY c_custkey"""),
    ),

    // J1 — fact ⋈ broadcast dim chain + agg (TPC-H Q5 shape). The fact
    // side never shuffles for the joins (all dims broadcast); the only
    // exchange is the final small group-by.
    QueryDef(
      "q09_region_revenue",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey"))
        val r = Tables.region(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            Num.fround(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name,
              floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue,
              count(*) AS n_lines
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name ORDER BY r_name"""),
    ),

    // TPC-H Q7-shaped volume shipping: per (supplier nation, customer
    // nation, ship year) revenue — the deepest join tree in the suite
    // (fact → orders on the fact key, then FOUR broadcast dims:
    // customer, supplier, nation × 2 roles). The planning property
    // that matters at 100 TB: the only shuffle-worthy join is
    // fact⋈orders (two big tables on the shared key); every
    // nation-resolution hop stays a broadcast hash join, so the fact
    // rows cross the wire at most once. Both nation roles come from
    // the SAME dim aliased twice — no second scan materializes.
    QueryDef(
      "q100_volume_shipping",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n1), sup("s_nationkey") === n1("sn_key"))
          .join(broadcast(n2), c("c_nationkey") === n2("cn_key"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(Num.fround(sum(col("rev")), 2).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              year(l_shipdate)::INT AS l_year,
              floor((sum(l_extendedprice * (1.0 - l_discount))) * 100 + 0.5) / 100 AS revenue,
              count(*) AS n_lines
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              GROUP BY supp_nation, cust_nation, l_year
              ORDER BY supp_nation, cust_nation, l_year"""),
    ),

    // A3 — duplicate-group detection. Reference: api_service/main.py:225-234
    // (matchId dup pipeline: group, count, keep count>1).
    QueryDef(
      "q10_duplicate_groups",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") > 1)
          .orderBy(col("l_orderkey")),
      Some("""SELECT l_orderkey, count(*) AS cnt FROM lineitem
              GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey"""),
    ),

    // M4 — first-seen-wins dedup via row_number. Reference:
    // utils/clean_db.py:7-26 (duplicate summoner sweep, first kept).
    QueryDef(
      "q11_first_seen_wins",
      (s, dir) => {
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
        // — the window order must be total or the kept row is
        // nondeterministic (SURVEY.md §7.4 tie-break risk).
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        Tables.lineitem(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
              QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
              ORDER BY l_orderkey"""),
    ),

    // J2/F3 — tiered entity-resolution join: try the primary key, fall
    // back to a secondary key, prefer the best tier per probe row.
    // Reference: transformer_loader/main.py:102-131 (PUUID exact, then
    // normalized-name fallback). Mechanics: per-tier equi-join, union,
    // rank by tier, row_number()=1 — each tier stays a broadcastable
    // equi-join (no OR-condition nested-loop join at scale).
    QueryDef(
      "q12_tiered_entity_resolution",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
        val probe = Tables.orders(s, dir).select(
          col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")).as("primary_key"),
          ((col("o_orderkey") * 13) % 1500).as("fallback_key"))
        val t1 = probe.join(broadcast(c), probe("primary_key") === c("c_custkey"))
          .select(col("o_orderkey"), col("c_custkey"), col("c_name"), lit(1).as("tier"))
        val t2 = probe.join(broadcast(c), probe("fallback_key") === c("c_custkey"))
          .select(col("o_orderkey"), col("c_custkey"), col("c_name"), lit(2).as("tier"))
        val w = Window.partitionBy(col("o_orderkey")).orderBy(col("tier"))
        t1.unionAll(t2)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH probe AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS primary_key,
                       (o_orderkey * 13) % 1500 AS fallback_key
                FROM orders),
              tiers AS (
                SELECT o_orderkey, c_custkey, c_name, 1 AS tier
                FROM probe JOIN customer ON primary_key = c_custkey
                UNION ALL
                SELECT o_orderkey, c_custkey, c_name, 2 AS tier
                FROM probe JOIN customer ON fallback_key = c_custkey)
              SELECT o_orderkey, c_custkey, c_name, tier FROM tiers
              QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY tier) = 1
              ORDER BY o_orderkey"""),
    ),

    // F4 — case-insensitive exact-match lookup. Reference:
    // api_service/main.py:190,324 (^escaped$ regex with options:i).
    QueryDef(
      "q13_ci_lookup",
      (s, dir) =>
        Tables.customer(s, dir)
          .filter(lower(trim(col("c_mktsegment"))) === lower(trim(lit(" BuIlDiNg "))))
          .filter(col("c_name").rlike("(?i)^customer#.*$"))
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
              WHERE lower(trim(c_mktsegment)) = lower(trim(' BuIlDiNg '))
                AND regexp_matches(c_name, '^customer#.*$', 'i')
              ORDER BY c_custkey"""),
    ),

    // F5 — facet filters + counts. Reference: dashboard/app.py:541-545
    // (queue tabs 420/440/450).
    QueryDef(
      "q14_event_facets",
      (s, dir) =>
        Tables.events(s, dir)
          .filter(col("event_type").isin("click", "purchase", "view"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), Num.fround(sum(col("value")), 2).as("total_value"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n, floor((sum(value)) * 100 + 0.5) / 100 AS total_value
              FROM events WHERE event_type IN ('click', 'purchase', 'view')
              GROUP BY event_type ORDER BY event_type"""),
    ),

    // C13 — map lookup with computed default. Reference:
    // dashboard/app.py:195-196 (queueId→name map, "Queue {qid}" default).
    QueryDef(
      "q15_label_map_default",
      (s, dir) => {
        val m = map(
          lit("click"), lit("Click"),
          lit("view"), lit("Page View"),
          lit("purchase"), lit("Purchase"))
        Tables.events(s, dir)
          .select(coalesce(element_at(m, col("event_type")),
            concat(lit("Event "), col("event_type"))).as("label"))
          .groupBy(col("label")).agg(count(lit(1)).as("n"))
          .orderBy(col("label"))
      },
      Some("""SELECT CASE event_type WHEN 'click' THEN 'Click'
                WHEN 'view' THEN 'Page View' WHEN 'purchase' THEN 'Purchase'
                ELSE 'Event ' || event_type END AS label, count(*) AS n
              FROM events GROUP BY label ORDER BY label"""),
    ),

    // C15 — conditional labeling. Reference: dashboard/app.py:480-482
    // (win → "Victory"/"Defeat" ternaries).
    QueryDef(
      "q16_status_labels",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(when(col("o_orderstatus") === "F", "Fulfilled")
            .when(col("o_orderstatus") === "O", "Open")
            .otherwise("Partial").as("label"))
          .groupBy(col("label")).agg(count(lit(1)).as("n"))
          .orderBy(col("label")),
      Some("""SELECT CASE WHEN o_orderstatus = 'F' THEN 'Fulfilled'
                WHEN o_orderstatus = 'O' THEN 'Open' ELSE 'Partial' END AS label,
              count(*) AS n FROM orders GROUP BY label ORDER BY label"""),
    ),

    // C9/C10/P2 — array build + higher-order filter + slice.
    // Reference: transformer_loader/main.py:40 (items array),
    // dashboard/app.py:493 (skip-zero render filter).
    QueryDef(
      "q17_doc_token_arrays",
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            size(toks).as("n_tokens"),
            size(filter(toks, t => length(t) > 4)).as("n_long_tokens"),
            concat_ws("-", slice(toks, 1, 3)).as("head3"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long_tokens,
              array_to_string(string_split(text, ' ')[1:3], '-') AS head3
              FROM documents ORDER BY doc_id"""),
    ),

    // C14 — JSON decode of payload column. Reference:
    // extractor/main.py:478 (json.loads of task payloads).
    QueryDef(
      "q18_json_extract",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      // json_valid guard: DuckDB's json_extract_string ERRORS on
      // malformed JSON where Spark's get_json_object returns NULL —
      // real event streams contain malformed payloads, and the engine
      // must keep serving while the row contributes NULL (it still
      // COUNTS in n, matching get_json_object's row-preserving shape).
      Some("""SELECT event_type,
              sum((CASE WHEN json_valid(props)
                   THEN json_extract_string(props, '$.k') END)::BIGINT)::BIGINT AS k_sum,
              count(*) AS n FROM events GROUP BY event_type ORDER BY event_type"""),
    ),

    // C11 — epoch/date bucketing + formatting. Reference:
    // dashboard/app.py:498-499 (epoch-ms → %d/%m).
    QueryDef(
      "q19_monthly_orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_totalprice"))
          .groupBy(col("month"))
          .agg(count(lit(1)).as("n"), Num.fround(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("month")),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
              floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total
              FROM orders GROUP BY month ORDER BY month"""),
    ),

    // C7 — coalesce fallback chain + split/concat. Reference:
    // transformer_loader/main.py:43-46 (riotIdGameName → summonerName →
    // "Unknown"), api_service/main.py:123-126 (Name#Tag split/concat).
    QueryDef(
      "q20_coalesce_chain",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(
            coalesce(nullif(col("l_returnflag"), lit("N")), col("l_linestatus"), lit("Unknown")).as("flag2"),
            split(concat(col("l_returnflag"), lit("#"), col("l_linestatus")), "#").getItem(0).as("gname"))
          .groupBy(col("flag2"), col("gname")).agg(count(lit(1)).as("n"))
          .orderBy(col("flag2"), col("gname")),
      Some("""SELECT coalesce(nullif(l_returnflag, 'N'), l_linestatus, 'Unknown') AS flag2,
              string_split(l_returnflag || '#' || l_linestatus, '#')[1] AS gname,
              count(*) AS n FROM lineitem GROUP BY flag2, gname ORDER BY flag2, gname"""),
    ),

    // J5 — union-of-sources + distinct. Reference: extractor/main.py:294-318
    // (challenger/GM/master ladder union probe).
    QueryDef(
      "q21_union_names",
      (s, dir) =>
        Tables.customer(s, dir).select(col("c_name").as("name"))
          .unionAll(Tables.supplier(s, dir).select(col("s_name").as("name")))
          .distinct().orderBy(col("name")),
      Some("""SELECT DISTINCT name FROM (
                SELECT c_name AS name FROM customer
                UNION ALL SELECT s_name AS name FROM supplier)
              ORDER BY name"""),
    ),

    // A4 — scalar totals. Reference: dashboard/app.py:405-407.
    QueryDef(
      "q22_scalar_totals",
      (s, dir) =>
        Tables.orders(s, dir)
          .agg(
            count(lit(1)).as("total_orders"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("total_open"),
            Num.fround(sum(col("o_totalprice")), 2).as("total_value"))
          .withColumn("open_rate", Num.fround(col("total_open") * 100.0 / col("total_orders"), 1)),
      Some("""SELECT count(*) AS total_orders,
              sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS total_open,
              floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total_value,
              floor((sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT * 100.0 / count(*)) * 10 + 0.5) / 10 AS open_rate
              FROM orders"""),
    ),

    // Analytic windows (engine surface beyond the reference's row_number:
    // rank / lag / running frame aggregates).
    QueryDef(
      "q23_window_analytics",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rnk", row_number().over(w))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("running_total",
            Num.fround(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_total"))
          .filter(col("rnk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rnk"), col("prev_price"), col("running_total"))
          .orderBy(col("o_custkey"), col("rnk"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
              row_number() OVER w AS rnk,
              lag(o_totalprice, 1) OVER w AS prev_price,
              floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS running_total
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
              QUALIFY rnk <= 3
              ORDER BY o_custkey, rnk"""),
    ),

    // C6 — NFKC normalize + casefold + trim, END-TO-END with an oracle
    // (closes the one §2 operator without a green CORRECTNESS row, per
    // VERDICT r10). Reference: transformer_loader/main.py:62-73 (norm),
    // utils/check_rank.py:76 (accent-tolerant name match). The oracle
    // restriction: DuckDB has no NFKC, but on inputs free of
    // COMPATIBILITY characters NFKC ≡ NFC, and nfc_normalize mirrors
    // the composition exactly — so the query dirties each customer
    // identity two independent ways that agree only under
    // normalize+casefold+trim (uppercase + padding + DECOMPOSED accent
    // `e`+U+0301 vs lowercase + PRECOMPOSED `é`) and joins the two
    // spellings back into entity pairs. A broken normalizer (no
    // composition, locale-sensitive case, missed trim) empties or
    // mis-keys the join on one engine only. Fullwidth/ligature/
    // compatibility cases stay pinned engine-side in NormalizeNFKCSpec
    // (the documented oracle gap, SURVEY §5.3, now narrowed to the
    // compatibility subset). Scale: norm_nfkc is a codegen'd
    // UnaryExpression, the join is a broadcast on the dim table.
    QueryDef(
      "q172_nfkc_entity_match",
      (s, dir) => {
        graft.functions.NormalizeNFKC.register(s)
        val nrm = graft.functions.NormalizeNFKC.normCol _
        val dirty = Tables.customer(s, dir).select(col("c_custkey").as("k1"),
          nrm(concat(lit("  "), upper(col("c_name")), lit(" cafe\u0301"))).as("nkey"))
        val clean = Tables.customer(s, dir).select(col("c_custkey").as("k2"),
          nrm(concat(lower(col("c_name")), lit(" caf\u00e9"))).as("nkey"))
        dirty.join(broadcast(clean), Seq("nkey"))
          .filter(col("k1") === col("k2"))
          .select(col("k1").as("c_custkey"), col("nkey").as("norm_name"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""WITH dirty AS (
                 SELECT c_custkey AS k1,
                   lower(trim(nfc_normalize('  ' || upper(c_name) || ' cafe' || chr(769)))) AS nkey
                 FROM customer),
               clean AS (
                 SELECT c_custkey AS k2,
                   lower(trim(nfc_normalize(lower(c_name) || ' caf' || chr(233)))) AS nkey
                 FROM customer)
               SELECT k1 AS c_custkey, nkey AS norm_name
               FROM dirty JOIN clean USING (nkey)
               WHERE k1 = k2
               ORDER BY c_custkey"""),
    ),
  )
}
