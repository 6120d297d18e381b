package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque media payload + typed metadata: the multimodal column model.
  * Image/audio/video ride as `payload: Array[Byte]` next to structured
  * metadata, exactly like a `binary` column in a 100 TB lakehouse table. */
case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte],
    byte_len: Int)

/** Decoded (stub) features per record. */
case class MediaFeatures(doc_id: Long, modality: String, byte_len: Int,
    f0: Int, f1: Int, f2: Int)

/** Multimodal column plumbing (north-star addition).
  *
  * The decode step is a per-partition batch pipeline — the Spark shape
  * for media decoding (a JVM-side analog of `mapInPandas`): records
  * stream through an iterator per partition, so a real decoder would
  * amortize model/codec init once per partition, never per row. This
  * container has no image/audio codecs, so `decodeStub` is a clearly
  * marked deterministic FAKE; the schema, batching, partitioning, and
  * column plumbing around it are real and oracle-verified
  * (`llm_multimodal_binary`).
  */
object Multimodal {

  /** documents → media records: utf-8 payload bytes + metadata. */
  def toMedia(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        lit("text").as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        octet_length(col("text")).as("byte_len"))
      .as[MediaRecord]
  }

  /** STUB decoder — stands in for image resize / audio feature-extract /
    * video frame-sample. Deterministic fake features derived from the
    * payload bytes so the driver oracle can verify the plumbing:
    * f0/f1 = payload length split, f2 = first byte. A production build
    * swaps ONLY this function for a codec-backed one. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) =
    (payload.length % 256, payload.length / 256,
      if (payload.isEmpty) 0 else payload(0) & 0xff)

  /** Per-partition batch decode: one iterator pass per partition (codec
    * init would happen once here, before the iterator map). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init site (e.g. codec/model handle) goes here
      it.map { r =>
        val (f0, f1, f2) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.modality, r.byte_len, f0, f1, f2)
      }
    }
  }
}
