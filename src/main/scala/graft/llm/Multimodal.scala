package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata, plus the feature-extraction plumbing a training pipeline needs.
  *
  * The Spark-side contract is real and tested: binary payload column,
  * per-partition batched decode via `mapPartitions` on a typed Dataset
  * (one decoder init per partition, not per row — the shape that matters at
  * 100 TB), deterministic output schema. The byte-level decode itself is a
  * clearly-marked STUB — this container has no image/audio codecs — that
  * computes deterministic fake features; swapping in a real codec changes
  * only `decodeStub`.
  */
object Multimodal {

  final case class MediaRecord(id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
      checksum: Long, feature: Array[Double])

  /** Attach an opaque binary payload column (here: utf-8 bytes of a text
    * column — stand-in for image/audio bytes) + media-kind metadata. */
  def attachPayload(df: DataFrame, idCol: String, srcCol: String,
      kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      lit(kind).as("kind"),
      encode(col(srcCol), "UTF-8").as("payload"))

  /** Batched per-partition "decode" → features. Partition-level iterator so
    * a real implementation amortizes codec/model initialization. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real pipeline: init decoder/codec ONCE here, reuse across rows
      it.map(decodeStub)
    }
  }

  /** Frame/sample selection stub: pick every `stride`-th byte as a stand-in
    * for frame sampling; a real video path would seek keyframes. */
  def sampleFrames(payload: Array[Byte], stride: Int): Array[Byte] =
    payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray

  /** Resize stub: box-average the payload down to `targetLen` buckets —
    * the shape (fixed output size, averaging pool) of an image resize,
    * over opaque bytes since no codecs exist in this environment. */
  def resize(payload: Array[Byte], targetLen: Int): Array[Double] = {
    if (payload.isEmpty) return Array.fill(targetLen)(0.0)
    Array.tabulate(targetLen) { b =>
      val from = (b.toLong * payload.length / targetLen).toInt
      val to = (((b + 1).toLong * payload.length) / targetLen).toInt max (from + 1)
      var s = 0.0
      var i = from
      while (i < to) { s += (payload(i) & 0xff); i += 1 }
      s / (to - from) / 255.0
    }
  }

  /** STUB decode — deterministic fake features (no codecs in this
    * environment). Rolling-hash checksum + first-4-bytes "feature". */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    var h = 0L
    var i = 0
    while (i < r.payload.length) {
      h = (h * 31 + (r.payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    val feat = Array.tabulate(4)(k =>
      if (k < r.payload.length) (r.payload(k) & 0xff) / 255.0 else 0.0)
    MediaFeatures(r.id, r.kind, r.payload.length.toLong, h, feat)
  }
}
