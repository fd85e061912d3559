package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q34Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.MinHashSlots.register(s)
    val docs = graft.operators.Staged.parquet(s, s"q34docs|$dir") {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          array_distinct(graft.functions.TextFns.tokens(col("text"))).as("tokset"))
    }
    val keys = graft.operators.Staged.parquet(s, s"q34keys|$dir") {
      docs.withColumn("mh", graft.functions.MinHashSlots.slotsCol(col("tokset"), 2))
        .select(col("lang"), col("source"), col("doc_id"), size(col("tokset")).as("sz"),
          explode(array(
            concat_ws("|", lit("b0"), element_at(col("mh"), 1)),
            concat_ws("|", lit("b1"), element_at(col("mh"), 2)))).as("blk"))
    }
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    println("docs rows: " + time("docs count"){docs.count()})
    println("keys rows: " + time("keys count"){keys.count()})
    val raw = keys.select(col("lang"), col("source"), col("blk"), col("doc_id").as("doc_a"), col("sz").as("sz_a"))
      .join(keys.select(col("lang"), col("source"), col("blk"), col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("lang", "source", "blk"))
      .filter(col("doc_a") < col("doc_b"))
    println("raw band pairs: " + time("raw pairs"){raw.count()})
    val pruned = raw.filter(col("sz_a").cast("double") >= lit(0.8) * col("sz_b")
      && col("sz_b").cast("double") >= lit(0.8) * col("sz_a"))
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b")).distinct()
    println("pruned distinct candidates: " + time("pruned"){pruned.count()})
    val inter = size(array_intersect(col("ts_a"), col("ts_b"))).cast("double")
    val uni = (size(col("ts_a")) + size(col("ts_b"))).cast("double") - inter
    val full = pruned
      .join(docs.select(col("doc_id").as("doc_a"), col("tokset").as("ts_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("tokset").as("ts_b")), Seq("doc_b"))
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b"),
        graft.functions.Num.fround(inter / uni, 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    time("payload+jaccard tail"){full.write.format("noop").mode("overwrite").save()}
    println("final rows: " + full.count())
    // avg tokset size
    docs.select(avg(size(col("tokset")))).show()
    s.stop()
  }
}
