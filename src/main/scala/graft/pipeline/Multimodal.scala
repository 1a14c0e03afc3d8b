package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) ride as opaque
  * `binary` columns with typed metadata; decode/feature-extraction runs as
  * batched per-partition transforms.
  *
  * Two decode tiers:
  *  - [[ImageDecoder]] / [[AudioDecoder]]: REAL decoders over real bytes —
  *    `javax.imageio` and `javax.sound.sampled` ship WITH the JDK, so
  *    PNG/JPEG/BMP/GIF image headers and WAV audio decode with zero
  *    external dependencies (header-only parse: width/height/format come
  *    from the stream metadata without materializing pixels).
  *  - [[StubDecoder]]: deterministic stand-in for codecs that genuinely
  *    need native libraries (video frame sampling, resampling) — the
  *    Spark-side shape (schema, binary transport, partition-wise batching)
  *    is identical, so swapping in a JNI/ONNX codec touches nothing else.
  */
object Multimodal {

  /** Typed metadata emitted by a decoder. */
  final case class MediaMeta(
      id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      frames: Int
  )

  /** Deterministic stand-in for codecs that genuinely need native
    * libraries (video frame sampling): derives fake dimensions purely from
    * the byte payload length. [[ImageDecoder]]/[[AudioDecoder]] above are
    * the REAL replacements for the formats the JDK decodes natively.
    */
  object StubDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (n % 640, (n * 7) % 480, n % 16)
    }
  }

  /** Typed metadata of a decoded image. */
  final case class ImageMeta(id: Long, width: Int, height: Int, format: String)

  /** Typed metadata of a decoded audio clip. */
  final case class AudioMeta(
      id: Long, frames: Long, sample_rate: Int, channels: Int)

  /** REAL image decoder over the JDK's `javax.imageio` (no external
    * libraries): header-only parse of PNG/JPEG/BMP/GIF payloads — the
    * reader reports dimensions and format without decoding pixel data.
    */
  object ImageDecoder extends Serializable {
    /** Some((width, height, format)) or None for undecodable bytes. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, String)] = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(in)
          try Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
          finally r.dispose()
        }
      } catch { case _: java.io.IOException => None }
      finally in.close()
    }
  }

  /** REAL audio decoder over the JDK's `javax.sound.sampled`: WAV/AIFF/AU
    * header parse → frame count, sample rate, channels.
    */
  object AudioDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Option[(Long, Int, Int)] =
      try {
        val f = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        Some((f.getFrameLength.toLong, f.getFormat.getSampleRate.toInt,
          f.getFormat.getChannels))
      } catch { case _: Exception => None }
  }

  /** Deterministic synthetic PNG: a (w × h) gradient rendered and encoded
    * by the JDK — REAL image bytes for the decode entries/specs.
    */
  def syntheticPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((x * 31 + y * 17 + seed) & 0xffffff)).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic synthetic 16-bit mono WAV with `frames` frames. */
  def syntheticWav(frames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val v = ((seed * 31 + i * 997) % 32768).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Batched REAL image decode: per-partition iteration, header-only parse
    * per payload — undecodable payloads are dropped (a pipeline would side
    * -output them).
    */
  def decodeImages(
      spark: SparkSession, df: DataFrame, idCol: String, binCol: String
  ): Dataset[ImageMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          ImageDecoder.decode(bytes).map { case (w, h, f) => ImageMeta(id, w, h, f) }
        }
      }
  }

  /** Batched REAL audio decode (same shape). */
  def decodeAudio(
      spark: SparkSession, df: DataFrame, idCol: String, binCol: String
  ): Dataset[AudioMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          AudioDecoder.decode(bytes).map { case (fr, sr, ch) => AudioMeta(id, fr, sr, ch) }
        }
      }
  }

  /** Attach a binary payload column from a string column (UTF-8) — the
    * transport shape used when media already live in the table.
    */
  def withBinary(df: DataFrame, srcCol: String, binCol: String): DataFrame =
    df.withColumn(binCol, encode(col(srcCol), "UTF-8"))

  /** Batched metadata extraction: per-partition iteration over binary
    * payloads (one decoder instance per partition, streaming, constant
    * memory) — the `mapInPandas`-equivalent shape in Scala.
    */
  def extractMeta(
      spark: SparkSession, df: DataFrame, idCol: String, binCol: String
  ): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = StubDecoder // one decoder per partition
        it.map { case (id, bytes) =>
          val (w, h, f) = dec.decode(bytes)
          MediaMeta(id, bytes.length.toLong, w, h, f)
        }
      }
  }
}
