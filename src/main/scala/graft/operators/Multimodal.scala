package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches —
  * the Scala analog of a Pandas-UDF-over-mapInPandas stage (same
  * contract: schema in, schema out, vectorized batch shape, no
  * shuffle).
  *
  * The codec boundary: `kind == "image"` payloads are REALLY decoded
  * via `javax.imageio` (PNG/BMP/GIF/JPEG readers ship in the JDK)
  * into row-major luminance samples, `kind == "audio"` payloads via
  * `javax.sound.sampled` (WAV/AIFF/AU) into 8-bit mono samples, and
  * `kind == "video"` payloads per-frame via [[decodeVideoFrames]]
  * when the container is an animated GIF (the one multi-frame format
  * with a JDK codec) — no external libs needed for any of them.
  * MP4/WebM/AVI video (genuinely no JDK codec) falls back to
  * [[decodeStub]], a deterministic pass-through that keeps the rest
  * of the pipeline — batching, histogram, resize, frame sampling —
  * fully exercisable.
  *
  * Scale: this is a narrow per-partition map. Content bytes never
  * leave their partition, batches bound peak memory (`batchSize` plays
  * the role of the Arrow batch size), and the output is a compact
  * feature row — the pattern that lets a 100 TB media corpus stream
  * through fixed-size executor memory.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)
  final case class MediaRow(media_id: Long, meta: MediaMeta, content: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      histogram: Array[Long], // 16 buckets over the high nibble
      thumbnail: Array[Byte], // stride-resampled to THUMB_BYTES
      frame_hashes: Array[Long], // one hash per sampled frame
  )

  val ThumbBytes = 16
  val NFrames = 4

  /** STUB for the non-image codec paths (audio/video libraries are not
    * in this container): the deterministic fake treats the payload
    * bytes as already-decoded samples so the surrounding pipeline is
    * fully exercisable and reproducible. */
  def decodeStub(meta: MediaMeta, content: Array[Byte]): Array[Byte] = content

  /** Row-major 8-bit luminance of a decoded image (integer Rec.601:
    * (299 R + 587 G + 114 B) / 1000 — deterministic, no float rounding
    * ambiguity). */
  private def luminance(img: java.awt.image.BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        out(y * w + x) = luma.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode an image payload (PNG/BMP/GIF/JPEG — whatever the JDK's
    * ImageIO readers accept) into row-major 8-bit luminance samples.
    * Undecodable bytes fall back to the stub rather than poisoning the
    * partition — the reference's poison-pill tolerance
    * (transformer_loader/main.py:95-97) applied at the codec
    * boundary. */
  def decodeImage(content: Array[Byte]): Array[Byte] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) content else luminance(img)
    } catch { case scala.util.control.NonFatal(_) => content }

  /** Decode a VIDEO payload into per-frame luminance planes when the
    * container is one the JDK can actually read — an animated GIF
    * (ImageIO's GIF reader exposes every frame via
    * `getNumImages`/`read(i)`). Returns None for any other container
    * (MP4/WebM/AVI have no JDK codec — those keep honest stub
    * semantics). Frames are decoded AS STORED: GIF inter-frame
    * compression may store a smaller changed-region image per frame;
    * feature extraction hashes content, not composited screens, so no
    * disposal-method compositing is performed. */
  def decodeVideoFrames(content: Array[Byte]): Option[Array[Array[Byte]]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          if (!r.getFormatName.equalsIgnoreCase("gif")) None
          else {
            r.setInput(iis)
            val n = r.getNumImages(true)
            if (n <= 0) None
            else Some(Array.tabulate(n)(i => luminance(r.read(i))))
          }
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode an audio payload (WAV/AIFF/AU — whatever the JDK's
    * `javax.sound.sampled` readers accept; no external libs) into
    * 8-bit unsigned mono samples: channels are averaged (integer
    * downmix) and 16-bit PCM is truncated to its high byte — both
    * deterministic integer ops. Undecodable or non-PCM payloads fall
    * back to the stub, the same poison-pill tolerance as
    * [[decodeImage]]. */
  def decodeAudio(content: Array[Byte]): Array[Byte] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val ch = math.max(1, fmt.getChannels)
        val bits = fmt.getSampleSizeInBits
        val raw = in.readAllBytes()
        import javax.sound.sampled.AudioFormat.Encoding
        if (bits == 16 && enc == Encoding.PCM_SIGNED) {
          val bytesPerFrame = 2 * ch
          val nFrames = raw.length / bytesPerFrame
          val out = new Array[Byte](nFrames)
          var f = 0
          while (f < nFrames) {
            var sum = 0
            var c = 0
            while (c < ch) {
              val off = f * bytesPerFrame + c * 2
              val sample =
                if (fmt.isBigEndian) (raw(off) << 8) | (raw(off + 1) & 0xff)
                else (raw(off + 1) << 8) | (raw(off) & 0xff)
              sum += sample
              c += 1
            }
            out(f) = (((sum / ch) >> 8) + 128).toByte // signed 16 → unsigned 8
            f += 1
          }
          out
        } else if (bits == 8 && (enc == Encoding.PCM_SIGNED || enc == Encoding.PCM_UNSIGNED)) {
          val shift = if (enc == Encoding.PCM_SIGNED) 128 else 0
          val nFrames = raw.length / ch
          val out = new Array[Byte](nFrames)
          var f = 0
          while (f < nFrames) {
            var sum = 0
            var c = 0
            while (c < ch) {
              sum += (if (shift == 0) raw(f * ch + c) & 0xff
                      else raw(f * ch + c).toInt + 128)
              c += 1
            }
            out(f) = (sum / ch).toByte
            f += 1
          }
          out
        } else content // compressed/float encodings: no JDK codec — stub semantics
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => content }

  /** Codec dispatch: real ImageIO decode for images, real
    * javax.sound.sampled decode for audio; video decodes per-frame
    * when the container is an animated GIF (the one video container
    * with a JDK codec) and stubs otherwise. */
  def decode(meta: MediaMeta, content: Array[Byte]): Array[Byte] =
    meta.kind match {
      case "image" => decodeImage(content)
      case "audio" => decodeAudio(content)
      case "video" =>
        decodeVideoFrames(content).map(_.flatten.toArray)
          .getOrElse(decodeStub(meta, content))
      case _ => decodeStub(meta, content)
    }

  /** "Resize": stride-resample the decoded samples to `n` bytes. */
  def resizeStub(decoded: Array[Byte], n: Int): Array[Byte] =
    if (decoded.isEmpty) Array.emptyByteArray
    else {
      val m = math.min(n, decoded.length)
      val stride = decoded.length / m
      Array.tabulate(m)(i => decoded(i * stride))
    }

  private def fnv(bytes: Array[Byte], start: Int, end: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = start
    while (i < end) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  /** "Frame sampling": split the payload into `n` equal frames and
    * fingerprint each (rolling FNV-1a). */
  def frameHashes(decoded: Array[Byte], n: Int): Array[Long] = {
    if (decoded.isEmpty) return Array.fill(n)(0L)
    val frameLen = math.max(1, decoded.length / n)
    Array.tabulate(n) { f =>
      val start = math.min(f * frameLen, decoded.length - 1)
      val end = math.min(start + frameLen, decoded.length)
      fnv(decoded, start, end)
    }
  }

  /** Frame sampling over REAL decoded frames (GIF video): `n` frames
    * sampled evenly across the sequence, each fingerprinted whole. */
  def sampledFrameHashes(frames: Array[Array[Byte]], n: Int): Array[Long] =
    if (frames.isEmpty) Array.fill(n)(0L)
    else Array.tabulate(n) { f =>
      val fr = frames(f * frames.length / n)
      fnv(fr, 0, fr.length)
    }

  def extractOne(row: MediaRow): MediaFeatures = {
    // A GIF video keeps its REAL frame boundaries for the frame
    // hashes; every other payload decodes flat and frame-samples by
    // equal split (the stub contract).
    val videoFrames =
      if (row.meta.kind == "video") decodeVideoFrames(row.content) else None
    // videoFrames == None for kind=="video" already means "no JDK
    // codec for this container" — go straight to the stub instead of
    // routing through decode(), whose video arm would parse the same
    // payload a second time just to reach the same conclusion.
    val decoded = videoFrames.map(_.flatten.toArray).getOrElse {
      if (row.meta.kind == "video") decodeStub(row.meta, row.content)
      else decode(row.meta, row.content)
    }
    val hist = new Array[Long](16)
    decoded.foreach(b => hist((b & 0xf0) >> 4) += 1)
    val fh = videoFrames.map(sampledFrameHashes(_, NFrames))
      .getOrElse(frameHashes(decoded, NFrames))
    MediaFeatures(row.media_id, row.meta.kind, decoded.length, hist,
      resizeStub(decoded, ThumbBytes), fh)
  }

  /** The pipeline stage: partition-local, batch-at-a-time feature
    * extraction. `batchSize` bounds how many payloads are materialized
    * at once (the Arrow-batch analog); partitioning is preserved — no
    * shuffle is introduced. */
  def extractFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => batch.iterator.map(extractOne) }
    }
  }

  // ---- image near-dup detection (aHash + banded Hamming) -----------
  // The image-corpus twin of the text near-dup family (q32-q35) and
  // the q184 Hamming kernel: a 64-bit average hash per image, banded
  // into 4×16-bit keys so candidate pairs collide on an equi-join
  // (never all-pairs), then exact Hamming verification. Pigeonhole:
  // two hashes within Hamming ≤ 3 AGREE on at least one of the 4
  // bands — candidate recall is exact up to 3 and probabilistic above
  // (the q33 banding tradeoff). No DuckDB oracle can decode a PNG, so
  // this family is spec-verified (SURVEY §5.3's non-SQL carve-out)
  // against engineered re-encoded / brightness-shifted /
  // different-content fixtures.

  /** Decode an image payload keeping its dimensions (aHash needs the
    * 2-D layout; [[decodeImage]]'s flat plane loses it). None when the
    * JDK has no reader for the bytes — the caller skips the row (a
    * near-dup pass over a corrupt payload has nothing to hash; the
    * poison-pill stance). */
  def decodeImageWithDims(content: Array[Byte]): Option[(Array[Byte], Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None else Some((luminance(img), img.getWidth, img.getHeight))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit average hash: integer 8×8 grid means over the luminance
    * plane, each cell thresholded against the mean of cell means. All
    * integer arithmetic (grid cell sums / counts, floor divisions) —
    * deterministic across JVMs, and a global brightness shift moves
    * every cell mean and the threshold together, so the bit pattern
    * is (near-)invariant to it: the property that makes aHash a
    * near-dup fingerprint rather than a checksum. Re-encodes of the
    * same pixels (PNG → BMP) hash identically because the hash sees
    * decoded luminance, not container bytes. */
  def aHash64(lum: Array[Byte], w: Int, h: Int): Long = {
    require(w > 0 && h > 0 && lum.length >= w * h, s"bad plane ${lum.length} for ${w}x$h")
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val i = gy * 8 + (x * 8 / w)
        sums(i) += (lum(y * w + x) & 0xff)
        cnts(i) += 1
        x += 1
      }
      y += 1
    }
    val means = new Array[Long](64)
    var i = 0
    var total = 0L
    while (i < 64) {
      means(i) = if (cnts(i) == 0) 0L else sums(i) / cnts(i)
      total += means(i)
      i += 1
    }
    val avg = total / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (means(i) > avg) hash |= (1L << i)
      i += 1
    }
    hash
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Per-image hashes for the image rows of a media corpus: media_id,
    * ahash, width, height. Partition-local decode (the
    * [[extractFeatures]] contract — no shuffle introduced);
    * undecodable payloads are skipped. */
  def imageHashes(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter((r: MediaRow) => r.meta.kind == "image")
      .mapPartitions { it =>
        it.flatMap { r =>
          decodeImageWithDims(r.content).map { case (lum, w, h) =>
            (r.media_id, aHash64(lum, w, h), w, h)
          }
        }
      }
      .toDF("media_id", "ahash", "width", "height")
  }

  /** 64-bit average hash of a decoded AUDIO stream (8-bit mono
    * samples): 64 equal time windows, integer window means thresholded
    * at the mean of means — the 1-D analog of [[aHash64]], and the
    * same invariances for the same reason: container re-encodes hash
    * identically (the hash sees decoded samples), and any positive
    * affine gain/offset maps every window mean and the threshold
    * together, so the bit pattern survives volume normalization up to
    * integer-rounding wobble. Empty streams hash to 0. */
  def audioHash64(samples: Array[Byte]): Long = {
    if (samples.isEmpty) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    val n = samples.length
    var i = 0
    while (i < n) {
      val w = (i.toLong * 64 / n).toInt
      sums(w) += (samples(i) & 0xff)
      cnts(w) += 1
      i += 1
    }
    val means = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 64) {
      means(j) = if (cnts(j) == 0) 0L else sums(j) / cnts(j)
      total += means(j)
      j += 1
    }
    val avg = total / 64
    var hash = 0L
    j = 0
    while (j < 64) {
      if (means(j) > avg) hash |= (1L << j)
      j += 1
    }
    hash
  }

  /** Per-clip hashes for the audio rows of a media corpus: media_id,
    * ahash, n_samples. Partition-local decode; payloads the JDK can't
    * read fall through [[decodeAudio]]'s stub (deterministic, still
    * hashable — an exact-duplicate undecodable payload still dedups). */
  def audioHashes(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter((r: MediaRow) => r.meta.kind == "audio")
      .mapPartitions { it =>
        it.map { r =>
          val samples = decodeAudio(r.content)
          (r.media_id, audioHash64(samples), samples.length)
        }
      }
      .toDF("media_id", "ahash", "n_samples")
  }

  /** Verified near-dup pairs over any 64-bit perceptual hash table
    * (`media_id`, `ahash` — image [[imageHashes]] or audio
    * [[audioHashes]]): banded candidate generation (4 × 16-bit bands
    * of the hash as equi-join keys — corpus-linear candidate volume,
    * the q33/q39 device) then exact Hamming ≤ `maxHam` verification,
    * pairs deduped across bands. Pigeonhole: Hamming ≤ 3 guarantees a
    * shared band; recall above 3 is probabilistic (the banding
    * tradeoff). */
  def nearDupHashPairs(hashes: DataFrame, maxHam: Int = 6): DataFrame = {
    import org.apache.spark.sql.functions._
    val banded = hashes.select(col("media_id"), col("ahash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          expr(s"(ahash >> ${16 * b}) & 65535").as("key"))
      }: _*)).as("bk"))
      .select(col("media_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"),
      col("media_id").as("id_a"), col("ahash").as("h_a"))
    val b = banded.select(col("band"), col("key"),
      col("media_id").as("id_b"), col("ahash").as("h_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b")).distinct()
      .withColumn("ham", expr("cast(bit_count(h_a ^ h_b) as int)"))
      .filter(col("ham") <= maxHam)
      .select(col("id_a"), col("id_b"), col("ham"))
  }
}
