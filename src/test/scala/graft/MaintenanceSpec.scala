package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.domain.Maintenance

/** Maintenance-operator invariants (SURVEY.md §5.2: dedup idempotence,
  * trim bound + newest-wins, orphan purge). Properties run via raw
  * ScalaCheck (no scalatest bridge on the classpath) with few, large
  * cases — each case spins Spark jobs. */
class MaintenanceSpec extends SparkSuite {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(10)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val rowGen: Gen[RawRow] = for {
    m <- Gen.chooseNum(0, 30)
    p <- Gen.oneOf("A", "B", "C")
    t <- Gen.chooseNum(0L, 50L)
  } yield RawRow(s"m$m", p, t)

  test("dedup is idempotent and keeps exactly one row per key (A3∘A3 = A3)") {
    check(Prop.forAll(Gen.listOfN(60, rowGen)) { rows =>
      val df = rows.toDF()
      val once = Maintenance.dedupKeepFirst(df,
        Seq(col("matchId")), Seq(col("puuid"), col("timestamp")))
      val twice = Maintenance.dedupKeepFirst(once,
        Seq(col("matchId")), Seq(col("puuid"), col("timestamp")))
      val onceRows = once.collect().toSet
      onceRows == twice.collect().toSet &&
        once.groupBy("matchId").count().filter(col("count") > 1).count() == 0
    })
  }

  test("trim keeps <= K rows per key and they are the newest") {
    check(Prop.forAll(Gen.listOfN(80, rowGen)) { rows =>
      val df = rows.toDF().distinct()
      val k = 3
      val trimmed = Maintenance.trimPerKey(df, col("puuid"), col("timestamp"), col("matchId"), k)
      val counts = trimmed.groupBy("puuid").count().as[(String, Long)].collect().toMap
      val boundOk = counts.values.forall(_ <= k)
      // newest-wins: every kept row's ts >= every dropped row's ts is NOT
      // required (ties broken by matchId); instead check the kept set is
      // exactly the window-top-k recomputed independently.
      val expect = df.as[RawRow].collect().groupBy(_.puuid).toSeq.flatMap { case (_, g) =>
        g.sortBy(r => (-r.timestamp, r.matchId)).take(k)
      }.toSet
      boundOk && trimmed.as[RawRow].collect().toSet == expect
    })
  }

  test("orphan purge drops exactly the keys missing from the dim") {
    val raw = Seq(RawRow("m1", "A", 1), RawRow("m2", "B", 2), RawRow("m3", "X", 3)).toDF()
    val dim = Seq(("A", "nameA"), ("B", "nameB")).toDF("puuid", "name")
    assert(Maintenance.orphanPurge(raw, dim, "puuid").select("matchId")
      .as[String].collect().toSet == Set("m1", "m2"))
    assert(Maintenance.orphans(raw, dim, "puuid").select("matchId")
      .as[String].collect().toSeq == Seq("m3"))
  }

  test("cascade delete: case-insensitive name resolution across zones") {
    // api_service/main.py:175-204 — M1
    val dim = Seq(("A", "AguRin#DND"), ("B", "Other#X")).toDF("puuid", "summonerName")
    val zone1 = Seq(RawRow("m1", "A", 1), RawRow("m2", "B", 2)).toDF()
    val (Seq(z1), dimLeft) = Maintenance.cascadeDelete(
      Seq(zone1), dim, "summonerName", "  agurin#dnd ", "puuid")
    assert(z1.select("matchId").as[String].collect().toSeq == Seq("m2"))
    assert(dimLeft.select("puuid").as[String].collect().toSeq == Seq("B"))
  }

  test("repair composite: dedup + orphan purge + trim") {
    val dim = Seq(("A", "x"), ("B", "y")).toDF("puuid", "name")
    val raw = (Seq(
      RawRow("dup", "A", 1), RawRow("dup", "A", 1), // dup matchId
      RawRow("orph", "Z", 5)) ++ // orphan
      (1 to 10).map(i => RawRow(s"k$i", "B", i.toLong))).toDF()
    val out = Maintenance.repair(raw, dim, k = 4)
    val byUser = out.groupBy("puuid").count().as[(String, Long)].collect().toMap
    assert(byUser == Map("A" -> 1L, "B" -> 4L))
    assert(out.filter(col("puuid") === "B").select("matchId")
      .as[String].collect().toSet == Set("k10", "k9", "k8", "k7"))
    assert(Maintenance.nuke(raw).count() == 0)
  }

  test("small-file compaction: merges per-epoch files, preserves layout and contents") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/silver"
    // three epochs, each deliberately fragmented into 8 files
    for (epoch <- 0 to 2)
      (1 to 20).map(i => RawRow(s"m$epoch-$i", s"P${i % 3}", epoch * 100L + i)).toDF()
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/batch=$epoch")
    val before = spark.read.parquet(dir)
    val expected = before.select("matchId").as[String].collect().toSet
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def filesPerBatch: Map[String, Int] =
      fs.listStatus(new Path(dir)).filter(_.isDirectory).map { d =>
        d.getPath.getName ->
          fs.listStatus(d.getPath).count(f => f.getPath.getName.endsWith(".parquet"))
      }.toMap
    assert(filesPerBatch.values.forall(_ == 8))

    Maintenance.compactSmallFiles(spark, dir)

    // layout preserved (batch= dirs), exactly one file per epoch now
    val after = filesPerBatch
    assert(after.keySet == Set("batch=0", "batch=1", "batch=2"), s"layout changed: $after")
    assert(after.values.forall(_ == 1), s"expected 1 file per epoch: $after")
    // contents identical, partition column still readable
    val re = spark.read.parquet(dir)
    assert(re.select("matchId").as[String].collect().toSet == expected)
    assert(re.select("batch").distinct().as[Int].collect().toSet == Set(0, 1, 2))
    // no temp/old directories left behind
    assert(!fs.exists(new Path(dir + ".compact.tmp")) && !fs.exists(new Path(dir + ".compact.old")))
    // an epoch replayed AFTER compaction still overwrites its own dir
    (1 to 5).map(i => RawRow(s"m1-$i", "P0", 100L + i)).toDF()
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    assert(spark.read.parquet(dir).filter(col("batch") === 1).count() == 5)

    // crash recovery: simulate dying between the two swap renames —
    // live dir moved aside, tmp never activated. The next run must
    // restore the .compact.old zone instead of losing it.
    val expected2 = spark.read.parquet(dir).select("matchId").as[String].collect().toSet
    assert(fs.rename(new Path(dir), new Path(dir + ".compact.old")))
    Maintenance.compactSmallFiles(spark, dir)
    assert(fs.exists(new Path(dir)), "live zone not restored")
    assert(spark.read.parquet(dir).select("matchId").as[String].collect().toSet == expected2)
    assert(!fs.exists(new Path(dir + ".compact.tmp")) && !fs.exists(new Path(dir + ".compact.old")))
  }
}
