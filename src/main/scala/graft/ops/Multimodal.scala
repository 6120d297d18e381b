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

/** REAL decoded image features per record: dimensions and lead pixel as
  * read back by the JDK PNG codec. */
case class ImageFeatures(doc_id: Long, width: Int, height: Int,
    px_r: Int, px_g: Int, px_b: Int)

/** Multimodal column plumbing (north-star addition).
  *
  * The decode step is a per-partition batch pipeline — the Spark shape
  * for media decoding (a JVM-side analog of `mapInPandas`): records
  * stream through an iterator per partition, so a real decoder would
  * amortize model/codec init once per partition, never per row. Two
  * decode paths share the seam: `decodeImages` is a REAL codec round
  * trip (the JDK's `javax.imageio` PNG reader — no stub), verified
  * end-to-end by `llm_multimodal_image`; `decodeStub` stands in for
  * codecs the JDK doesn't ship (audio/video) and is a clearly marked
  * deterministic FAKE with the plumbing oracle-verified
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

  /** documents → one REAL PNG per doc: width, height, and fill color are
    * deterministic functions of doc_id (the oracle recomputes them in
    * SQL), encoded executor-side with `javax.imageio` — the binary
    * column a multimodal lakehouse table holds, minus the object store. */
  def toPngMedia(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val bytes = pngBytes(id)
        MediaRecord(id, "image", bytes, bytes.length)
      }
    }
  }

  /** A w×h solid-fill PNG: w = 1 + id%4, h = 1 + id%3, RGB =
    * (id·7, id·13, id·31) mod 256 — arithmetic any SQL engine can
    * replay, so the decode below is checkable without a codec. */
  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val w = 1 + (id % 4).toInt
    val h = 1 + (id % 3).toInt
    val rgb = (((id * 7) % 256).toInt << 16) |
      (((id * 13) % 256).toInt << 8) | ((id * 31) % 256).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode behind the per-partition seam — the JDK PNG codec
    * reads each payload back to (width, height, lead pixel). A decoder
    * that returned anything but the true pixels fails the oracle. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init site (codec handles, color models) goes here
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null,
          s"doc ${r.doc_id}: payload is not a decodable image")
        val p = img.getRGB(0, 0)
        ImageFeatures(r.doc_id, img.getWidth, img.getHeight,
          (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      }
    }
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
