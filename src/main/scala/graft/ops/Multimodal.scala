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

/** REAL decoded audio features per record: format and edge samples as
  * read back by the JDK WAV codec. */
case class AudioFeatures(doc_id: Long, sample_rate: Int, n_frames: Int,
    s_first: Int, s_last: Int)

/** Multimodal column plumbing (north-star addition).
  *
  * The decode step is a per-partition batch pipeline — the Spark shape
  * for media decoding (a JVM-side analog of `mapInPandas`): records
  * stream through an iterator per partition, so a real decoder would
  * amortize model/codec init once per partition, never per row. Three
  * decode paths share the seam: `decodeImages` is a REAL codec round
  * trip (the JDK's `javax.imageio` PNG reader — no stub), verified
  * end-to-end by `llm_multimodal_image`; `decodeAudio` likewise round
  * trips REAL RIFF/WAVE files through `javax.sound.sampled`
  * (`llm_multimodal_audio`); `decodeStub` stands in only for codecs the
  * JDK doesn't ship (video) and is a clearly marked deterministic FAKE
  * with the plumbing oracle-verified (`llm_multimodal_binary`).
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

  /** documents → one REAL RIFF/WAVE file per doc: sample rate, frame
    * count, and the 16-bit PCM samples are deterministic functions of
    * doc_id (the oracle recomputes them in SQL), encoded executor-side
    * with `javax.sound.sampled` — the audio analog of `toPngMedia`. */
  def toWavMedia(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val bytes = wavBytes(id)
        MediaRecord(id, "audio", bytes, bytes.length)
      }
    }
  }

  /** A mono 16-bit little-endian PCM WAV: rate = 8000 + (id%3)·4000,
    * frames = 4 + id%5, sample i = ((id·31 + i·17) mod 65536) − 32768 —
    * arithmetic any SQL engine can replay, so the decode below is
    * checkable without a codec. */
  private[graft] def wavBytes(id: Long): Array[Byte] = {
    val rate = 8000 + (id % 3).toInt * 4000
    val frames = 4 + (id % 5).toInt
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = (((id * 31 + i * 17) % 65536) - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte          // little-endian lo
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte // hi
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false) // 16-bit mono signed LE
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode behind the per-partition seam — the JDK WAV codec
    * parses each payload's RIFF header and PCM frames back to (sample
    * rate, frame count, first/last sample). A decoder that returned
    * anything but the true samples fails the oracle. */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init site (codec handles, resamplers) goes here
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian,
          s"doc ${r.doc_id}: payload is not 16-bit mono LE PCM")
        val frames = ais.getFrameLength.toInt
        val pcm = ais.readAllBytes()
        require(pcm.length == frames * 2,
          s"doc ${r.doc_id}: frame count ${frames} != ${pcm.length / 2}")
        def sample(i: Int): Int =
          ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff))
        AudioFeatures(r.doc_id, fmt.getSampleRate.toInt, frames,
          sample(0), sample(frames - 1))
      }
    }
  }

  /** STUB decoder — stands in for video frame-sample (the one modality
    * with no JDK codec; image and audio decode for real above).
    * Deterministic fake features derived from the
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
