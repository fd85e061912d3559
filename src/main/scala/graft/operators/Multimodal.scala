package graft.operators

import org.apache.spark.sql.{Dataset, Encoders}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches —
  * the Scala analog of a Pandas-UDF-over-mapInPandas stage (same
  * contract: schema in, schema out, vectorized batch shape, no
  * shuffle). The real codec step is STUBBED behind [[decodeStub]]
  * (image/audio libraries are not in this container); everything
  * around it — row types, batching, partition preservation, feature
  * schema — is real and tested.
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

  /** STUB for the codec step: a real implementation would decode the
    * container format here (JPEG/PNG/WAV/...); the deterministic fake
    * treats the payload bytes as already-decoded samples so the
    * surrounding pipeline is fully exercisable and reproducible. */
  def decodeStub(meta: MediaMeta, content: Array[Byte]): Array[Byte] = content

  /** "Resize": stride-resample the decoded samples to `n` bytes. */
  def resizeStub(decoded: Array[Byte], n: Int): Array[Byte] =
    if (decoded.isEmpty) Array.emptyByteArray
    else {
      val m = math.min(n, decoded.length)
      val stride = decoded.length / m
      Array.tabulate(m)(i => decoded(i * stride))
    }

  /** "Frame sampling": split the payload into `n` equal frames and
    * fingerprint each (rolling FNV-1a). */
  def frameHashes(decoded: Array[Byte], n: Int): Array[Long] = {
    if (decoded.isEmpty) return Array.fill(n)(0L)
    val frameLen = math.max(1, decoded.length / n)
    Array.tabulate(n) { f =>
      val start = math.min(f * frameLen, decoded.length - 1)
      val end = math.min(start + frameLen, decoded.length)
      var h = 0xcbf29ce484222325L
      var i = start
      while (i < end) { h = (h ^ (decoded(i) & 0xffL)) * 0x100000001b3L; i += 1 }
      h
    }
  }

  def extractOne(row: MediaRow): MediaFeatures = {
    val decoded = decodeStub(row.meta, row.content)
    val hist = new Array[Long](16)
    decoded.foreach(b => hist((b & 0xf0) >> 4) += 1)
    MediaFeatures(row.media_id, row.meta.kind, decoded.length, hist,
      resizeStub(decoded, ThumbBytes), frameHashes(decoded, NFrames))
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
}
