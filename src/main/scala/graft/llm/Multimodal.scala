package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata, plus the feature-extraction plumbing a training pipeline needs.
  *
  * The Spark-side contract is real and tested: binary payload column,
  * per-partition batched decode via `mapPartitions` on a typed Dataset
  * (one decoder init per partition, not per row — the shape that matters at
  * 100 TB), deterministic output schema.
  *
  * IMAGE decode is REAL: [[decodeImage]] parses PNG/JPEG bytes with the
  * JDK's built-in `javax.imageio` (no external codec needed) into
  * dimensions + per-channel means. Only AUDIO/VIDEO decode remains a
  * clearly-marked STUB ([[decodeStub]] — the container ships no such
  * codecs); swapping in a real codec changes only that function.
  */
object Multimodal {

  final case class MediaRecord(id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
      checksum: Long, feature: Array[Double])
  /** Decoded image facts: dimensions + mean intensity per RGB channel. */
  final case class ImageMeta(id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Attach an opaque binary payload column (here: utf-8 bytes of a text
    * column — stand-in for image/audio bytes) + media-kind metadata. */
  def attachPayload(df: DataFrame, idCol: String, srcCol: String,
      kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      lit(kind).as("kind"),
      encode(col(srcCol), "UTF-8").as("payload"))

  /** Batched per-partition "decode" → generic features for OPAQUE kinds
    * (audio/video — no codecs in this container; images should go through
    * the real [[imageFeatures]]/[[decodeImage]] path instead). Partition-
    * level iterator so a real implementation amortizes codec/model init. */
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

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP):
    * bytes → BufferedImage → (width, height, per-channel means). Exact
    * long-integer channel sums (no float accumulation), divided once at
    * the end — deterministic under any partitioning. Throws on bytes no
    * installed reader accepts (callers route non-image kinds to
    * [[decodeStub]]). */
  def decodeImage(r: MediaRecord): ImageMeta = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"undecodable image payload for id=${r.id}")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageMeta(r.id, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Batched per-partition image decode — same `mapPartitions` shape as
    * [[extractFeatures]] (decoder state amortized per partition). */
  def imageFeatures(ds: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // javax.imageio readers are looked up per call; a partition-scoped
      // cache would hook in here for a stateful codec
      it.map(decodeImage)
    }
  }

  /** Deterministic PNG generator (encode side of the imageio round-trip,
    * used by tests and the oracle-checked q_image_meta): a solid-fill RGB
    * image whose dimensions and fill color are pure functions of `id` —
    *   width = 8 + id mod 5, height = 8 + id mod 3,
    *   (r, g, b) = (37·id, 59·id, 83·id) mod 256
    * — so dimensions AND channel means are SQL-expressible facts an
    * oracle can recompute without decoding anything. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (8 + Math.floorMod(id, 5L)).toInt
    val h = (8 + Math.floorMod(id, 3L)).toInt
    val (r, g, b) = (Math.floorMod(37 * id, 256L).toInt,
      Math.floorMod(59 * id, 256L).toInt, Math.floorMod(83 * id, 256L).toInt)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** STUB decode — deterministic fake features, used for the kinds this
    * container genuinely cannot decode (audio/video; images go through
    * the real [[decodeImage]]). Rolling-hash checksum + first-4-bytes
    * "feature". */
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
