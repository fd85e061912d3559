package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Num
import graft.operators.Upsert

/** Extension operator surface beyond the reference (SURVEY.md §7.2
  * step 5 / §2.4 "candidates"): multi-level rollups, approximate
  * sketches, binary-payload column plumbing, and the keyed-upsert
  * operator — each driver-checkable. */
object Extensions {

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
    // No oracle — sketch algorithms are engine-specific by design
    // (driver records the weaker rows-only check); exactness is
    // covered by q02/q10's exact aggregates.
    QueryDef(
      "q45_sketches",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          .orderBy(col("l_returnflag")),
      None,
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
            expr("array_join(transform(sequence(1, length(text), 16), i -> substring(text, i, 1)), '')")
              .as("strided_sample"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
              strlen(text) AS n_bytes,
              hex(encode(substr(text, 1, 8))) AS head_hex,
              md5(substr(text, 1, 32)) AS slice_fp,
              array_to_string([substr(text, i, 1) for i in generate_series(1, length(text), 16)], '') AS strided_sample
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
  )
}
