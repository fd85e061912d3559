package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** MinHash behaves like MinHash: identical docs collide on every slot;
  * disjoint docs collide on (almost) none; the slot-collision fraction
  * tracks the true shingle-set Jaccard within a loose tolerance — the
  * statistical property LSH banding (q33) relies on. */
class MinHashPropertySpec extends SparkSuite {
  import spark.implicits._

  private val K = 32

  private def sigs(texts: Seq[(Long, String)]): Map[Long, Seq[String]] = {
    val sigCols = (0 until K).map(i => TextFns.minhash("shingles", i).as(s"mh_$i"))
    texts.toDF("doc_id", "text")
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("shingles", TextFns.shingleExpr("toks", 3))
      .select((col("doc_id") +: sigCols): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to K).map(r.getString)).toMap
  }

  private def trueJaccard(a: String, b: String): Double = {
    def sh(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("identical docs -> all slots equal; disjoint docs -> no slots equal") {
    val same = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words appear here with zero overlap whatsoever in any shingle"
    val m = sigs(Seq((1L, same), (2L, same), (3L, other)))
    assert(m(1L) == m(2L))
    assert(m(1L).zip(m(3L)).count { case (x, y) => x == y } == 0)
  }

  test("slot-collision fraction approximates true shingle Jaccard") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val edited = ((1 to 30).map(i => s"w$i") ++ (1 to 10).map(i => s"x$i")).mkString(" ")
    val m = sigs(Seq((1L, base), (2L, edited)))
    val est = m(1L).zip(m(2L)).count { case (x, y) => x == y }.toDouble / K
    val truth = trueJaccard(base, edited)
    assert(math.abs(est - truth) < 0.25, s"estimate $est vs true $truth")
  }
}
