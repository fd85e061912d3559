package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed Aggregator — the one custom aggregate
  * SURVEY.md §7.3 deems justified: a mergeable sketch over an
  * exploded-shingle relation `(doc_id, shingle)`, so signatures can be
  * built incrementally (streaming update mode / partial aggregation)
  * instead of requiring the whole shingle array in one row the way the
  * expression form in TextFns does.
  *
  * The per-slot hash is the same md5("<i>|" + shingle) lexicographic
  * min as TextFns.minhash, so both forms produce identical signatures
  * (property-tested). Buffer = k strings; merge = element-wise min —
  * associative + commutative, which is what makes it partial-aggregate
  * and state-store safe at any scale.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[String], Array[String]] {
  private def slotHash(i: Int, shingle: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i|$shingle".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var i = 0
    while (i < k) {
      val h = slotHash(i, shingle)
      if (buf(i) == null || h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] =
    Array.tabulate(k) { i =>
      (a(i), b(i)) match {
        case (null, y) => y
        case (x, null) => x
        case (x, y) => if (x < y) x else y
      }
    }

  override def finish(reduction: Array[String]): Array[String] = reduction

  override def bufferEncoder: Encoder[Array[String]] = Encoders.kryo[Array[String]]
  override def outputEncoder: Encoder[Array[String]] = Encoders.kryo[Array[String]]
}
