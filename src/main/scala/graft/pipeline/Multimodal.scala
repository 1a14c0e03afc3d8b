package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) ride as opaque
  * `binary` columns with typed metadata; decode/feature-extraction runs as
  * batched per-partition transforms. The actual codec is STUBBED (no media
  * libraries in this container) behind [[StubDecoder]] — a deterministic
  * fake — but the Spark-side shape (schema, binary transport, partition-wise
  * batching, metadata extraction) is real and tested.
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

  /** Deterministic stand-in for an image/video decoder: derives fake
    * dimensions purely from the byte payload length. A real decoder (JNI
    * codec, JEP/ONNX bridge) replaces `decode` without touching the pipeline.
    */
  object StubDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (n % 640, (n * 7) % 480, n % 16)
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
