package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.NormalizeNFKC

/** Session extension installing the engine's custom expressions at
  * session build time — usable via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so `norm_nfkc` is available
  * to pure-SQL users without any imperative registration call. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("norm_nfkc"),
      new ExpressionInfo(classOf[NormalizeNFKC].getName, "norm_nfkc"),
      (children: Seq[Expression]) => NormalizeNFKC(children.head),
    ))
  }
}
