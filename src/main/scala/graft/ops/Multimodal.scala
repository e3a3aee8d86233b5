package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. */
case class MediaRow(doc_id: Long, kind: String, n_bytes: Long, media: Array[Byte])

/** Extracted features for one media object. */
case class MediaFeatures(
    doc_id: Long,
    kind: String,
    n_bytes: Long,
    media_md5: String,
    features: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The DECODE step is a STUB — this container ships no image/audio codecs —
  * but everything around it is real and tested: the (id, kind, n_bytes,
  * media) schema, the partition-parallel batch loop (`mapPartitions` over a
  * typed Dataset — the Scala analogue of `mapInPandas`), and the
  * fixed-width feature-vector output shape a downstream ANN index consumes.
  * Swap [[decodeStub]] for a JNI/ONNX decoder without touching the plumbing.
  */
object Multimodal {

  /** STUB decoder: deterministic pseudo-features from the raw bytes (first 8
    * bytes scaled to [0,1]). A real deployment replaces this with the actual
    * image/audio decode + model forward pass; signature stays
    * `Array[Byte] => Array[Float]`.
    */
  def decodeStub(media: Array[Byte]): Array[Float] = {
    val n = 8
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = if (i < media.length) (media(i) & 0xff) / 255.0f else 0.0f
      i += 1
    }
    out
  }

  /** Wrap a text/binary column as a media table. In production the media
    * bytes come from object-store files; the layout contract is the same.
    */
  def asMedia(
      docs: DataFrame,
      binCol: String,
      kind: String,
      idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit(kind).as("kind"),
      octet_length(col(binCol).cast("binary")).cast("long").as("n_bytes"),
      col(binCol).cast("binary").as("media"))

  /** Batch feature extraction: one decoder instance per partition, streamed
    * over the partition's rows — the mapPartitions batch shape that
    * amortizes model/codec setup at scale.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup happens here (codec / model init in real life)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val md5hex = digest.digest(r.media).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.kind, r.n_bytes, md5hex, decodeStub(r.media))
      }
    }
  }
}
