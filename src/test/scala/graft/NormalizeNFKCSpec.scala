package graft

import org.apache.spark.sql.functions._
import graft.functions.NormalizeNFKC

/** NFKC norm semantics pinned to the reference's norm()
  * (transformer_loader/main.py:62-73) including the accented-name
  * fixture (utils/check_rank.py:76). */
class NormalizeNFKCSpec extends SparkSuite {

  test("kernel: lowercase + trim + NFKC compatibility folding") {
    assert(NormalizeNFKC.norm("  HeLLo ") == "hello")
    // NFKC folds fullwidth compatibility characters
    assert(NormalizeNFKC.norm("ＦＵＬＬ") == "full")
    // combining accent composes to the precomposed form
    assert(NormalizeNFKC.norm("Ferroi Llautó") == "ferroi llautó")
    assert(NormalizeNFKC.norm("FerroiLlautó") == "ferroillautó")
  }

  test("expression evaluates in a DataFrame (codegen path) and SQL") {
    import spark.implicits._
    NormalizeNFKC.register(spark)
    val df = Seq("  AguRin ", "Ferroi Llautó", "ＦＵＬＬ").toDF("s")
    val got = df.select(NormalizeNFKC.normCol(col("s")).as("n")).as[String].collect().toSeq
    assert(got == Seq("agurin", "ferroi llautó", "full"))
    val sqlGot = df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT norm_nfkc(s) FROM t").as[String].collect().toSeq
    assert(viaSql == got)
  }

  test("null propagates as null") {
    import spark.implicits._
    NormalizeNFKC.register(spark)
    val df = Seq(Some("A"), None).toDF("s")
    val got = df.select(NormalizeNFKC.normCol(col("s"))).collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("a"), None))
  }
}
