package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductF, MinHashSlots, NormalizeNFKC, SqDistF}

/** Session extension installing the engine's custom expressions at
  * session build time — usable via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so `norm_nfkc`,
  * `minhash_slots`, `dot_f` and `sqdist_f` are available to pure-SQL
  * users without any imperative registration call. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("norm_nfkc"),
      new ExpressionInfo(classOf[NormalizeNFKC].getName, "norm_nfkc"),
      (children: Seq[Expression]) => NormalizeNFKC(children.head),
    ))
    ext.injectFunction((
      FunctionIdentifier("minhash_slots"),
      new ExpressionInfo(classOf[MinHashSlots].getName, "minhash_slots"),
      (children: Seq[Expression]) => MinHashSlots(children.head,
        children(1).eval(null).asInstanceOf[Number].intValue()),
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (children: Seq[Expression]) => DotProductF(children.head, children(1)),
    ))
    ext.injectFunction((
      FunctionIdentifier("sqdist_f"),
      new ExpressionInfo(classOf[SqDistF].getName, "sqdist_f"),
      (children: Seq[Expression]) => SqDistF(children.head, children(1)),
    ))
  }
}
