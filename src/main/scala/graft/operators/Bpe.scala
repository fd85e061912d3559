package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-construction pass a training-data pipeline runs before
  * any token counting/packing. See q130 for the oracle-checked query.
  *
  * Scale design: the corpus collapses ONCE to the word-TYPE table
  * (word, count) — every subsequent pass is over vocabulary types,
  * not corpus tokens (the classic reduction: pair statistics are
  * identical, volume drops by the type/token ratio). Each round the
  * driver sees exactly ONE row (the argmax pair — bounded state, the
  * ConnectedComponents loop discipline) and re-plans a narrow map; the
  * type table stays persisted and partitioned.
  *
  * Merge-application encoding: symbol sequences are DOUBLE-space
  * separated ("  a  b  "), so the plain `replace(s, ' l  r ', ' lr ')`
  * scan IS the canonical greedy left-to-right non-overlapping fold:
  * a match consumes only the inner halves of its two separators, so
  * adjacent candidate matches never share characters and replace's
  * continue-after-match rule equals the fold's consume-the-symbol
  * rule. With SINGLE spaces, runs share the middle space and every
  * second merge in 'a a a a' is silently dropped — BpeSpec pins the
  * run/alternation fixtures against a reference fold.
  */
object Bpe {

  /** One learned merge: rank (1-based round), the pair, its weighted
    * frequency at merge time. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Word-type table with double-space-encoded symbol sequences:
    * columns (w, cnt, s). */
  def typeTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("s",
        concat(lit("  "), concat_ws("  ", split(col("w"), "")), lit("  ")))

  /** Train `rounds` merges over the type table. Each round: weighted
    * adjacent-pair counts → argmax (count desc, then lexicographic —
    * a total order) → merge applied via the double-space replace. */
  def train(docs: DataFrame, rounds: Int): Seq[Merge] = {
    var wt = typeTable(docs).persist()
    val first = wt
    val merges = Seq.newBuilder[Merge]
    for (rank <- 1 to rounds) {
      val top = wt
        .select(col("cnt"), split(trim(col("s")), "  ").as("toks"))
        // sequence(1, 0) counts DOWN in Spark — single-symbol words
        // must not reach the pair transform.
        .filter(size(col("toks")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
               i -> struct(element_at(toks, i) AS l, element_at(toks, i + 1) AS r))"""))
          .as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        require(l.matches("[\\p{Alnum}]+") && r.matches("[\\p{Alnum}]+"),
          s"merge symbols must stay alphanumeric, got '$l' '$r'")
        merges += Merge(rank, l, r, pc)
        wt = wt.withColumn("s", expr(s"replace(s, ' $l  $r ', ' $l$r ')"))
      }
    }
    first.unpersist()
    merges.result()
  }

  /** The learned merge table as a DataFrame (rank asc). */
  def merges(spark: SparkSession, docs: DataFrame, rounds: Int): DataFrame = {
    import spark.implicits._
    train(docs, rounds).map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
      .orderBy(col("rank"))
  }

  /** Merge table trained ONCE per (input dir, rounds) per JVM and
    * staged through parquet (the Staged house pattern): the trainer's
    * 8 sequential argmax jobs are a one-time cost shared by q130
    * (emits the table) and q131 (folds the merges into the encode
    * pass — read back as a bounded `rounds`-row collect). */
  def stagedMerges(spark: SparkSession, docs: => DataFrame, dir: String, rounds: Int): DataFrame =
    Staged.parquet(spark, s"bpe_merges|$rounds|$dir")(merges(spark, docs, rounds))

  /** The staged merge table as driver [[Merge]]s, rank order. */
  def stagedMergeList(spark: SparkSession, docs: => DataFrame, dir: String, rounds: Int): Seq[Merge] =
    stagedMerges(spark, docs, dir, rounds).collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq

  /** ENCODE pass: the staged learned merges folded back over the
    * word-type table (rank order — `rounds` chained narrow replaces).
    * The tokenizer application every downstream consumer shares
    * (q131 vocabulary, q137 fertility); at corpus scale this runs
    * over every shard as a pure map. Columns (w, cnt, s). */
  def encodedTypes(spark: SparkSession, docs: DataFrame, dir: String, rounds: Int): DataFrame =
    stagedMergeList(spark, docs, dir, rounds).foldLeft(typeTable(docs)) { (df, m) =>
      df.withColumn("s",
        expr(s"replace(s, ' ${m.left}  ${m.right} ', ' ${m.left}${m.right} ')"))
    }

  /** Reference greedy fold (spec-side ground truth): canonical BPE
    * merge of one (l, r) pair over a symbol sequence, left to right,
    * non-overlapping. */
  def foldMerge(syms: Seq[String], l: String, r: String): Seq[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }
}
