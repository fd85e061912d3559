package graft

import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, Multimodal, Upsert}
import graft.sources.PaginatedSource
import Multimodal.{MediaMeta, MediaRow}

/** Multimodal plumbing, paginated source adapter, keyed upsert. */
class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  test("multimodal: batched feature extraction preserves partitioning and is deterministic") {
    val rows = (0L until 50L).map { i =>
      MediaRow(i, MediaMeta(if (i % 2 == 0) "image" else "audio", 64, 64, 16000),
        Array.tabulate(100 + i.toInt)(j => ((i * 31 + j) % 256).toByte))
    }
    val ds = spark.createDataset(rows).repartition(4)
    val out = Multimodal.extractFeatures(ds, batchSize = 8)
    assert(out.rdd.getNumPartitions == ds.rdd.getNumPartitions) // no shuffle introduced
    val feats = out.collect().sortBy(_.media_id)
    assert(feats.length == 50)
    // histogram mass == payload bytes; thumbnail bounded; frames hashed
    feats.foreach { f =>
      assert(f.histogram.sum == f.n_bytes)
      assert(f.thumbnail.length <= Multimodal.ThumbBytes)
      assert(f.frame_hashes.length == Multimodal.NFrames)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(ds, batchSize = 8).collect().sortBy(_.media_id)
    assert(feats.map(_.frame_hashes.toSeq).toSeq == again.map(_.frame_hashes.toSeq).toSeq)
  }

  test("multimodal: real PNG decode via javax.imageio yields luminance samples") {
    import java.awt.image.BufferedImage
    val (w, h) = (4, 3)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 50) << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray

    val f = Multimodal.extractFeatures(
      spark.createDataset(Seq(MediaRow(7L, MediaMeta("image", w, h, 0), png))))
      .collect().head
    // decoded sample count = pixel count, NOT the PNG container size
    assert(f.n_bytes == w * h && f.n_bytes != png.length)
    // histogram matches integer Rec.601 luminance of the known pixels
    val expected = for (y <- 0 until h; x <- 0 until w)
      yield (((x * 40) * 299 + (y * 50) * 587 + 200 * 114) / 1000).toByte
    val hist = new Array[Long](16)
    expected.foreach(b => hist((b & 0xf0) >> 4) += 1)
    assert(f.histogram.toSeq == hist.toSeq)

    // bytes tagged "audio" that no JDK reader accepts fall back to the
    // deterministic stub (poison-pill tolerance at the codec boundary)
    val f2 = Multimodal.extractFeatures(
      spark.createDataset(Seq(MediaRow(8L, MediaMeta("audio", 0, 0, 16000), png))))
      .collect().head
    assert(f2.n_bytes == png.length)

    // undecodable bytes tagged "image" fall back rather than throwing
    val junk = Array.tabulate(32)(i => (i * 7).toByte)
    val f3 = Multimodal.extractFeatures(
      spark.createDataset(Seq(MediaRow(9L, MediaMeta("image", 0, 0, 0), junk))))
      .collect().head
    assert(f3.n_bytes == junk.length)
  }

  test("multimodal: real WAV decode via javax.sound.sampled yields mono 8-bit samples") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 16-bit little-endian PCM, 2 channels, 100 frames of known samples.
    val nFrames = 100
    val left = Array.tabulate(nFrames)(i => (i * 300 - 15000).toShort)
    val right = Array.tabulate(nFrames)(i => (i * 100 - 5000).toShort)
    val pcm = new Array[Byte](nFrames * 4)
    for (i <- 0 until nFrames) {
      pcm(i * 4) = (left(i) & 0xff).toByte
      pcm(i * 4 + 1) = ((left(i) >> 8) & 0xff).toByte
      pcm(i * 4 + 2) = (right(i) & 0xff).toByte
      pcm(i * 4 + 3) = ((right(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val f = Multimodal.extractFeatures(
      spark.createDataset(Seq(MediaRow(10L, MediaMeta("audio", 0, 0, 16000), wav))))
      .collect().head
    // decoded sample count = frame count, NOT the WAV container size
    assert(f.n_bytes == nFrames && f.n_bytes != wav.length)
    // histogram matches the integer stereo downmix, truncated to the
    // high byte and shifted to unsigned — the documented decode
    val expected = (0 until nFrames).map { i =>
      ((((left(i) + right(i)) / 2) >> 8) + 128).toByte
    }
    val hist = new Array[Long](16)
    expected.foreach(b => hist((b & 0xf0) >> 4) += 1)
    assert(f.histogram.toSeq == hist.toSeq)
  }

  test("multimodal: real animated-GIF video decode yields per-frame luminance + hashes") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // 3-frame animated GIF, each frame a solid GRAY (r=g=b=v, so the
    // integer Rec.601 luminance is exactly v and GIF palette
    // quantization is lossless).
    val (w, h) = (5, 4)
    val grays = Seq(16, 112, 224)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    grays.foreach { v =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    val gif = bos.toByteArray

    // frame-level decode: 3 frames, each w*h samples of its gray value
    val frames = Multimodal.decodeVideoFrames(gif).get
    assert(frames.length == 3)
    frames.zip(grays).foreach { case (fr, v) =>
      assert(fr.length == w * h && fr.forall(_ == v.toByte), s"frame of gray $v")
    }

    // pipeline features: flat sample count = 3 frames, and the frame
    // hashes are REAL per-frame fingerprints (4 sampled from 3 frames
    // -> frame 0 twice, then 1 and 2: exactly 3 distinct hashes)
    val f = Multimodal.extractFeatures(
      spark.createDataset(Seq(MediaRow(11L, MediaMeta("video", w, h, 0), gif))))
      .collect().head
    assert(f.n_bytes == 3 * w * h && f.n_bytes != gif.length)
    assert(f.frame_hashes.length == Multimodal.NFrames)
    assert(f.frame_hashes(0) == f.frame_hashes(1))
    assert(f.frame_hashes.distinct.length == 3)

    // a container with no JDK video codec path (PNG bytes tagged
    // video) keeps honest stub semantics: payload passes through
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val pbos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", pbos))
    val png = pbos.toByteArray
    val f2 = Multimodal.extractFeatures(
      spark.createDataset(Seq(MediaRow(12L, MediaMeta("video", w, h, 0), png))))
      .collect().head
    assert(f2.n_bytes == png.length)
  }

  test("connected components: min-label propagation clusters an undirected edge list") {
    // three components: a path, a pair, a triangle-with-extra-edge
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("src", "dst")
    val out = ConnectedComponents.cluster(edges)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))

    // a diameter-39 chain converges to the global minimum label well
    // inside maxRounds — pointer jumping makes rounds O(log diameter),
    // so 40 nodes need ~6 rounds, not 39
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val c = ConnectedComponents.cluster(chain).as[(Long, Long)].collect().toMap
    assert(c.size == 40 && c.values.forall(_ == 1L))

    // deterministic across runs
    val again = ConnectedComponents.cluster(edges).as[(Long, Long)].collect().toMap
    assert(out == again)
  }

  test("clusterStaged: staged labels ≡ inline, built once, served as a pure scan") {
    // The r16 staging contract (VERDICT r15 #1): the labeling over a
    // staged edge artifact is itself a staged artifact — same labels
    // as the inline operator, built once per key per JVM, and a
    // re-serve is a parquet read with NO propagation machinery in the
    // plan (that is what makes q199 three-labelings-per-serve → zero).
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("src", "dst")
    val key = "cc_spec_edges_v1"
    val staged = ConnectedComponents.clusterStaged(spark, key)(edges)
      .as[(Long, Long)].collect().toMap
    val inline = ConnectedComponents.cluster(edges)
      .as[(Long, Long)].collect().toMap
    assert(staged == inline, "staged labeling diverged from inline")
    // second serve must NOT re-run the build: the by-name build arg
    // throws if forced, and the served plan is a bare file scan
    val again = ConnectedComponents.clusterStaged(spark, key)(
      sys.error("staged labeling was rebuilt on re-serve"))
    assert(again.as[(Long, Long)].collect().toMap == inline)
    val plan = again.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") && !plan.toLowerCase.contains("join"),
      s"re-serve must be a pure staged scan:\n$plan")
  }

  test("connected components match a reference union-find on random graphs") {
    // seeded RNG: reproducible, and the graphs exercise mixtures of
    // singletons-with-self-loops, small cliques, and long paths
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = (1 to n).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      // reference: classic driver-side union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = nodes.map { v =>
        // component id = min node id of the component
        val members = nodes.filter(u => find(u) == find(v))
        v -> members.min
      }.toMap
      val got = ConnectedComponents.cluster(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial (n=$n)")
    }
  }

  test("multimodal: schema carries binary payload + typed metadata") {
    val ds = spark.createDataset(Seq(
      MediaRow(1L, MediaMeta("image", 8, 8, 0), Array[Byte](1, 2, 3))))
    val schema = ds.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
  }

  test("paginated source: walks pages until short page, capped by maxPages") {
    val universe = (0 until 230).map(i => s"match-$i")
    def page(start: Int, count: Int): Seq[String] = universe.slice(start, start + count)
    assert(PaginatedSource.fetchIdPages(page, 50, 10).size == 230)
    assert(PaginatedSource.fetchIdPages(page, 50, 4).size == 200) // reference's 4x50 cap
  }

  test("paginated source: distributed detail fetch with retry") {
    val ids = (0 until 40).map(i => s"id-$i")
    val out = PaginatedSource.fetchDetails[String, (String, Int)](
      spark, ids, id => (id, id.length), parallelism = 4)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.collect().toMap.keySet == ids.toSet)
    // retry: flaky fn succeeds within attempts (deterministic: fails on first call per value)
    var calls = 0
    val got = PaginatedSource.withRetry(3)(() => { calls += 1; if (calls < 3) sys.error("429"); "ok" })
    assert(got == "ok" && calls == 3)
  }

  test("upsert latest-wins keeps highest (version, tiebreak) per key") {
    val base = Seq((1L, "a", 0L, -1L), (2L, "b", 0L, -1L)).toDF("k", "v", "version", "src")
    val updates = Seq((1L, "a2", 5L, 10L), (1L, "a3", 5L, 11L), (3L, "c", 1L, 1L))
      .toDF("k", "v", "version", "src")
    val out = Upsert.latestWins(base, updates, Seq("k"), col("version"), col("src"))
      .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a3"), (2L, "b"), (3L, "c")))
  }

  test("staged pair graph: consumers reuse persisted pairs — no LSH recompute in the read plan") {
    // At production scale the verified near-dup pair graph is a
    // persisted artifact: the LSH pipeline's shuffle is paid once at
    // write time and every consumer (clustering, dedup decisions,
    // PageRank) composes from storage. This pins the pattern: cluster
    // from the staged table, get exactly the inline q68 clusters, and
    // the staged read plan contains none of the signature machinery.
    val sfDir = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_pairs").toString
    try {
      SparkEntry.queries("q33_minhash_lsh_pairs")(spark, sfDir)
        .write.mode("overwrite").parquet(dir)
      val staged = spark.read.parquet(dir)
      val edges = staged.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      edges.collect()
      val plan = edges.queryExecution.executedPlan.toString
      assert(!plan.contains("minhash_slots") && !plan.contains("md5"),
        s"staged read must not recompute signatures:\n$plan")
      val stagedClusters = ConnectedComponents.cluster(edges)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      val inline = SparkEntry.queries("q68_neardup_clusters")(spark, sfDir)
        .select("doc_id", "cluster_id")
      assert(stagedClusters.exceptAll(inline).isEmpty
        && inline.exceptAll(stagedClusters).isEmpty,
        "staged-graph clustering diverged from the inline pipeline")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  test("salted join equals the plain join on random skewed inputs") {
    // Seeded RNG; probe keys drawn Zipf-ishly (half the rows on one
    // hot key) — exactly the distribution the operator exists for.
    // The law: salting changes WHERE rows are joined, never WHICH.
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val probe = (1 to 400).map { i =>
        val k = if (rng.nextBoolean()) 0L else rng.nextInt(20).toLong
        (k, i.toLong)
      }.toDF("k", "pid")
      val build = (0 to 20).flatMap { k =>
        if (rng.nextBoolean()) Some((k.toLong, s"v$k")) else None
      }.toDF("k", "payload")
      val salted = graft.operators.SaltedJoin
        .inner(probe, build, Seq("k"), col("pid"), factor = 4)
        .select("k", "pid", "payload").as[(Long, Long, String)].collect().sorted.toSeq
      val plain = probe.join(build, Seq("k"))
        .select("k", "pid", "payload").as[(Long, Long, String)].collect().sorted.toSeq
      assert(salted == plain, s"trial $trial: salted join changed the result set")
    }
  }

  test("Staged.parquet builds once per key per JVM and replays identically from the stage") {
    import spark.implicits._
    var builds = 0
    def make = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
    val key = "staged-spec-" + System.nanoTime()
    val first = graft.operators.Staged.parquet(spark, key)(make).collect().toSet
    val second = graft.operators.Staged.parquet(spark, key)(make).collect().toSet
    assert(builds == 1, s"stage rebuilt: $builds builds")
    assert(first == second && first.size == 2)
  }

  // ---- image near-dup (aHash + banded Hamming) ---------------------

  private def makeImage(seed: Int, brightness: Int = 0): java.awt.image.BufferedImage = {
    import java.awt.image.BufferedImage
    val (w, h) = (32, 32)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var st = seed
    for (y <- 0 until h; x <- 0 until w) {
      st = st * 1103515245 + 12345 // deterministic LCG pattern
      val v = math.min(255, math.max(0, ((st >>> 16) & 0xff) + brightness))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  test("aHash: re-encode invariant, brightness near-invariant, content-sensitive") {
    def hashOf(bytes: Array[Byte]): Long = {
      val Some((lum, w, h)) = Multimodal.decodeImageWithDims(bytes)
      Multimodal.aHash64(lum, w, h)
    }
    val base = hashOf(encode(makeImage(7), "png"))
    val reenc = hashOf(encode(makeImage(7), "bmp"))
    val bright = hashOf(encode(makeImage(7, brightness = 8), "png"))
    val other = hashOf(encode(makeImage(99), "png"))
    assert(base == reenc, "PNG vs BMP of the same pixels must hash identically")
    assert(Multimodal.hamming64(base, bright) <= 3,
      s"brightness shift moved ${Multimodal.hamming64(base, bright)} bits")
    assert(Multimodal.hamming64(base, other) > 6,
      s"different content only ${Multimodal.hamming64(base, other)} bits apart")
  }

  test("image near-dup pairs: banded candidates find the variants, not the strangers") {
    val rows = Seq(
      MediaRow(0L, MediaMeta("image", 32, 32, 0), encode(makeImage(7), "png")),
      MediaRow(1L, MediaMeta("image", 32, 32, 0), encode(makeImage(7), "bmp")),
      MediaRow(2L, MediaMeta("image", 32, 32, 0), encode(makeImage(7, brightness = 8), "png")),
      MediaRow(3L, MediaMeta("image", 32, 32, 0), encode(makeImage(99), "png")),
      MediaRow(4L, MediaMeta("image", 32, 32, 0), encode(makeImage(1234), "png")),
      // an undecodable payload is skipped, not a poison pill
      MediaRow(5L, MediaMeta("image", 32, 32, 0), Array[Byte](1, 2, 3)),
      // a non-image row never enters the hash path
      MediaRow(6L, MediaMeta("audio", 0, 0, 16000), encode(makeImage(7), "png")))
    val ds = spark.createDataset(rows).repartition(3)
    val hashes = Multimodal.imageHashes(ds)
    assert(hashes.count() == 5, "5 decodable images")
    val pairs = Multimodal.nearDupHashPairs(hashes, maxHam = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the variant cluster {0,1,2} is fully recovered...
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"unexpected pair set $pairs")
    // ...and determinism holds across a recompute
    val again = Multimodal.nearDupHashPairs(hashes, maxHam = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == again)
  }

  private def makePcm(seed: Int, gainShift: Int = 0): Array[Byte] = {
    var st = seed
    Array.tabulate(800) { _ =>
      st = st * 1103515245 + 12345
      val dev = (((st >>> 16) & 0xff) - 128) >> gainShift // deviation around mid
      (128 + dev).toByte
    }
  }

  private def encodeWav8(samples8: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    // 8-bit unsigned mono PCM — decodeAudio round-trips it verbatim
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 16000f, 8, 1, 1, 16000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(samples8), fmt, samples8.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def encodeWav16(samples8: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    // the SAME samples re-encoded at 16-bit signed depth:
    // (u8 - 128) << 8 decodes back to exactly u8 through the
    // high-byte downmix — a bit-depth re-encode, not new content
    val pcm = new Array[Byte](samples8.length * 2)
    samples8.zipWithIndex.foreach { case (b, i) =>
      val s16 = (((b & 0xff) - 128) << 8).toShort
      pcm(i * 2) = (s16 & 0xff).toByte
      pcm(i * 2 + 1) = ((s16 >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, samples8.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio near-dup: bit-depth re-encode identical, gain-scaled near, strangers far") {
    val base = makePcm(7)
    val rows = Seq(
      MediaRow(0L, MediaMeta("audio", 0, 0, 16000), encodeWav8(base)),
      MediaRow(1L, MediaMeta("audio", 0, 0, 16000), encodeWav16(base)),
      MediaRow(2L, MediaMeta("audio", 0, 0, 16000), encodeWav8(makePcm(7, gainShift = 1))),
      MediaRow(3L, MediaMeta("audio", 0, 0, 16000), encodeWav8(makePcm(4242))),
      // a non-audio row never enters the hash path
      MediaRow(4L, MediaMeta("image", 0, 0, 0), encodeWav8(base)))
    val ds = spark.createDataset(rows).repartition(2)
    val hashes = Multimodal.audioHashes(ds)
    val byId = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet == Set(0L, 1L, 2L, 3L), "4 audio rows hashed")
    assert(byId(0L) == byId(1L), "8-bit vs 16-bit encode of the same samples must hash identically")
    assert(Multimodal.hamming64(byId(0L), byId(2L)) <= 3,
      s"gain-scaled clip moved ${Multimodal.hamming64(byId(0L), byId(2L))} bits")
    assert(Multimodal.hamming64(byId(0L), byId(3L)) > 6,
      s"different clip only ${Multimodal.hamming64(byId(0L), byId(3L))} bits apart")
    val pairs = Multimodal.nearDupHashPairs(hashes, maxHam = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)), s"unexpected pair set $pairs")
  }
}
