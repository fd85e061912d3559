package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (Chaudhuri et
  * al. SSJoin; Xiao et al. PPJoin) — ALL pairs of sets with Jaccard ≥
  * τ, zero recall loss, without the all-pairs cross join.
  *
  * τ is a rational tNum/tDen so every decision is exact integer
  * arithmetic: prefix length sz − ⌈τ·sz⌉ + 1 (ceil as
  * (tNum·sz + tDen − 1) div tDen), size prune tDen·min ≥ tNum·max,
  * and the overlap test (tDen+tNum)·I ≥ tNum·(sa+sb) (equivalent to
  * tDen·I ≥ tNum·(sa+sb−I), i.e. J ≥ τ) — used both as PPJoin's
  * positional upper-bound filter on candidates and as the final
  * verification. No float touches a decision.
  *
  * The prefix-filter lemma needs ONE global element order; document
  * frequency ascending (rarest first, element value as tiebreak) is
  * used because it minimizes candidate volume. The df re-join is the
  * head/tail Zipf split (top-`headK` hot elements broadcast, tail
  * shuffled with per-key cardinality bounded by the head threshold);
  * ranking windows partition BY SET ID (bounded by set size, never
  * corpus-wide); the candidate join explodes prefixes only; the
  * verification is one codegen'd `array_intersect` after two
  * id-keyed payload joins. Correctness of this whole pipeline vs the
  * brute-force definition is pinned by `SimilarityJoinSpec` (the
  * DuckDB oracle of q122 mirrors the same algorithm, so that
  * differential alone could not catch a recall-losing lemma bug —
  * the spec closes exactly that gap).
  *
  * @param sets (id: long-ish, ta: array of DISTINCT elements)
  * @return (da, db, inter, uni) with da < db and
  *         inter/uni ≥ tNum/tDen, unordered
  */
object SimilarityJoin {
  def exactJaccardPairs(
      sets: DataFrame, idCol: String, setCol: String,
      tNum: Int, tDen: Int, headK: Int = 64): DataFrame =
    exactJaccardPairsTracked(sets, idCol, setCol, tNum, tDen, headK)._1

  /** [[exactJaccardPairs]] plus a cleanup handle that unpersists the
    * operator's three build caches (token arrays, element df, prefix).
    * The caches exist to serve the multi-consumer build plan; once the
    * consuming action has run (the staged parquet write in q122), they
    * are dead weight pinned for the JVM lifetime — call the handle
    * right after. Safe to call even if the result was never
    * materialized (unpersist on a never-persisted plan is a no-op). */
  def exactJaccardPairsTracked(
      sets: DataFrame, idCol: String, setCol: String,
      tNum: Int, tDen: Int, headK: Int = 64): (DataFrame, () => Unit) = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"bad tau $tNum/$tDen")
    val arrays = sets.select(col(idCol).as("__id"), col(setCol).as("__ta")).persist()
    val toks = arrays.select(col("__id"), explode(col("__ta")).as("__w"))
    val dfT = toks.groupBy(col("__w")).agg(count(lit(1)).as("__df")).persist()
    val head = dfT.orderBy(col("__df").desc, col("__w")).limit(headK)
    val tail = dfT.join(broadcast(head.select(col("__w"))), Seq("__w"), "left_anti")
    val withDf = toks.join(broadcast(head), Seq("__w")).unionByName(
      toks.join(broadcast(head.select(col("__w"))), Seq("__w"), "left_anti")
        .join(tail, Seq("__w")))
    val wDoc = Window.partitionBy(col("__id"))
    val pre = withDf
      .withColumn("__rk", row_number().over(wDoc.orderBy(col("__df"), col("__w"))))
      .withColumn("__sz", count(lit(1)).over(wDoc))
      .filter(col("__rk") <=
        col("__sz") - expr(s"($tNum * __sz + ${tDen - 1}) div $tDen") + 1)
      .select(col("__id"), col("__w"), col("__sz"), col("__rk"))
      .persist()
    val both = tNum + tDen
    val cand = pre.as("a").join(pre.as("b"),
        col("a.__w") === col("b.__w") && col("a.__id") < col("b.__id")
          && lit(tDen) * least(col("a.__sz"), col("b.__sz"))
             >= lit(tNum) * greatest(col("a.__sz"), col("b.__sz"))
          && lit(both) * (lit(1L) + least(col("a.__sz") - col("a.__rk"),
               col("b.__sz") - col("b.__rk")))
             >= lit(tNum) * (col("a.__sz") + col("b.__sz")))
      .select(col("a.__id").as("da"), col("b.__id").as("db"),
        col("a.__sz").as("sa"), col("b.__sz").as("sb"))
      .distinct()
    val out = cand
      .join(arrays.select(col("__id").as("da"), col("__ta").as("__arr_a")), Seq("da"))
      .join(arrays.select(col("__id").as("db"), col("__ta").as("__arr_b")), Seq("db"))
      .withColumn("inter",
        size(array_intersect(col("__arr_a"), col("__arr_b"))).cast("long"))
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .filter(lit(both) * col("inter") >= lit(tNum) * (col("sa") + col("sb")))
      .select(col("da"), col("db"), col("inter"), col("uni"))
    (out, () => { arrays.unpersist(); dfT.unpersist(); pre.unpersist(); () })
  }

  /** Exact DIRECTED containment self-join: all ordered pairs (a, b),
    * a ≠ b, with |A ∩ B| / |A| ≥ tNum/tDen — the asymmetric
    * complement of [[exactJaccardPairs]] (quote/subset detection: a
    * small document mostly contained in a large one scores high
    * containment but low Jaccard).
    *
    * Prefix-filter adaptation: the required overlap o = ⌈τ·|A|⌉
    * depends ONLY on the contained side, so the prefix cut applies to
    * A alone (its |A| − o + 1 rarest elements) while B is probed over
    * its FULL element postings — the containing side has no prefix
    * lemma. Correct by the same pigeonhole: a valid pair's FIRST
    * shared element (df-ascending order in A) has every earlier A
    * element outside B, so inter ≤ 1 + (|A| − rk) ≥ o puts it inside
    * both the prefix cut and the positional filter. Size prune:
    * tDen·|B| ≥ tNum·|A| (⟺ |B| ≥ ⌈τ·|A|⌉ for integers). All
    * decisions exact integer arithmetic; verification is one
    * codegen'd array_intersect.
    *
    * Zipf shape: the candidate join is A-prefix ⋈ B-postings on the
    * element. Hot-element postings never pile into one reducer: at
    * high τ (≥ 3/4) the A-prefix rows carrying a head element are
    * few enough to BROADCAST; at low τ the prefix covers most of
    * each set, so the head keys go through a salted shuffle instead
    * (the broadcast would be corpus-linear). Tail keys have per-key
    * df bounded by the head threshold. Exactness vs the brute-force
    * definition is pinned by SimilarityJoinSpec; the q143 oracle is
    * an INDEPENDENT algorithm (inverted-index pair counting, no
    * prefix lemma), so the differential itself proves losslessness
    * (the q126 pattern).
    *
    * @param sets (id: long-ish, ta: array of DISTINCT elements)
    * @return (da, db, inter, sa, sb): da the contained side, both
    *         directions emitted when both qualify
    */
  def exactContainmentPairs(
      sets: DataFrame, idCol: String, setCol: String,
      tNum: Int, tDen: Int, headK: Int = 64): DataFrame =
    exactContainmentPairsTracked(sets, idCol, setCol, tNum, tDen, headK)._1

  /** [[exactContainmentPairs]] plus the cache-cleanup handle — same
    * contract as [[exactJaccardPairsTracked]]. */
  def exactContainmentPairsTracked(
      sets: DataFrame, idCol: String, setCol: String,
      tNum: Int, tDen: Int, headK: Int = 64): (DataFrame, () => Unit) = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"bad tau $tNum/$tDen")
    val arrays = sets.select(col(idCol).as("__id"), col(setCol).as("__ta")).persist()
    val toks = arrays.select(col("__id"), explode(col("__ta")).as("__w"))
    val dfT = toks.groupBy(col("__w")).agg(count(lit(1)).as("__df")).persist()
    val head = dfT.orderBy(col("__df").desc, col("__w")).limit(headK)
    val tail = dfT.join(broadcast(head.select(col("__w"))), Seq("__w"), "left_anti")
    val withDf = toks.join(broadcast(head), Seq("__w")).unionByName(
      toks.join(broadcast(head.select(col("__w"))), Seq("__w"), "left_anti")
        .join(tail, Seq("__w")))
    val wDoc = Window.partitionBy(col("__id"))
    val sized = withDf
      .withColumn("__rk", row_number().over(wDoc.orderBy(col("__df"), col("__w"))))
      .withColumn("__sz", count(lit(1)).over(wDoc))
      .persist()
    val oA = expr(s"($tNum * __sz + ${tDen - 1}) div $tDen")
    val pre = sized
      .filter(col("__rk") <= col("__sz") - oA + 1)
      .select(col("__w"), col("__id").as("__ida"),
        col("__sz").as("__sa"), col("__rk").as("__rka"))
    val post = sized.select(col("__w"), col("__id").as("__idb"), col("__sz").as("__sb"))
    val headSet = head.select(col("__w"))
    val preHead = pre.join(broadcast(headSet), Seq("__w"))
    val preTail = pre.join(broadcast(headSet), Seq("__w"), "left_anti")
    val postHead = post.join(broadcast(headSet), Seq("__w"))
    val postTail = post.join(broadcast(headSet), Seq("__w"), "left_anti")
    // Head-element candidate join. Unlike the Jaccard join, the
    // A-prefix here is |A| − ⌈τ|A|⌉ + 1 elements per set — at low τ
    // roughly the whole set — so the prefix rows carrying head
    // elements grow linearly with the corpus and broadcasting them
    // would be unbounded at scale. Broadcast only when τ ≥ 3/4
    // (head elements sort LAST in the df-ascending prefix order, so
    // a short prefix rarely reaches them); below that, route the 64
    // hot keys through a salted shuffle (result provably equal —
    // SaltedJoin's contract, and SimilarityJoinSpec's brute-force
    // differential covers both regimes).
    val headCand =
      if (tNum * 4 >= tDen * 3) postHead.join(broadcast(preHead), Seq("__w"))
      else SaltedJoin.inner(postHead, preHead, Seq("__w"), col("__idb"), factor = 8)
    val cand = headCand
      .unionByName(preTail.join(postTail, Seq("__w")))
      .filter(col("__ida") =!= col("__idb"))
      .filter(lit(tDen) * col("__sb") >= lit(tNum) * col("__sa"))
      .filter(lit(tDen) * (lit(1L) + col("__sa") - col("__rka")) >= lit(tNum) * col("__sa"))
      .select(col("__ida").as("da"), col("__idb").as("db"),
        col("__sa").as("sa"), col("__sb").as("sb"))
      .distinct()
    val out = cand
      .join(arrays.select(col("__id").as("da"), col("__ta").as("__arr_a")), Seq("da"))
      .join(arrays.select(col("__id").as("db"), col("__ta").as("__arr_b")), Seq("db"))
      .withColumn("inter",
        size(array_intersect(col("__arr_a"), col("__arr_b"))).cast("long"))
      .filter(lit(tDen) * col("inter") >= lit(tNum) * col("sa"))
      .select(col("da"), col("db"), col("inter"), col("sa"), col("sb"))
    (out, () => { arrays.unpersist(); dfT.unpersist(); sized.unpersist(); () })
  }
}
