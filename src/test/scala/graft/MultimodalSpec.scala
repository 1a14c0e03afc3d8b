package graft

import graft.pipeline.Multimodal

/** Real multimodal decode (JDK-native codecs — no external libraries):
  * synthetic PNG/WAV bytes round-trip through header-only decoders.
  */
class MultimodalSpec extends SparkTestBase {

  test("ImageDecoder: real PNG bytes round-trip; garbage rejected") {
    for ((w, h) <- Seq((16, 16), (33, 47), (640, 2), (1, 1))) {
      val bytes = Multimodal.syntheticPng(w, h, seed = w * 1000L + h)
      // PNG magic really present — these are real image files
      assert((bytes(1) & 0xff) == 'P' && (bytes(2) & 0xff) == 'N')
      assert(Multimodal.ImageDecoder.decode(bytes).contains((w, h, "png")))
    }
    assert(Multimodal.ImageDecoder.decode("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageDecoder.decode(Array.emptyByteArray).isEmpty)
  }

  test("AudioDecoder: real WAV bytes round-trip; garbage rejected") {
    for ((frames, rate) <- Seq((100, 8000), (999, 16000), (1, 44100))) {
      val bytes = Multimodal.syntheticWav(frames, rate, seed = frames)
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
      assert(Multimodal.AudioDecoder.decode(bytes)
        .contains((frames.toLong, rate, 1)))
    }
    assert(Multimodal.AudioDecoder.decode("noise".getBytes).isEmpty)
  }

  test("batched decode: distributed pass over binary payloads") {
    import spark.implicits._
    val imgs = (0L until 50L).toDF("id").as[Long]
      .map(id => (id, Multimodal.syntheticPng((id % 7 + 3).toInt, 5, id)))
      .toDF("id", "png")
    val metas = Multimodal.decodeImages(spark, imgs, "id", "png").collect()
    assert(metas.length == 50)
    metas.foreach(m => assert(m.width == (m.id % 7 + 3).toInt &&
      m.height == 5 && m.format == "png"))
    // undecodable rows drop instead of failing the job
    val mixed = imgs.withColumn("png",
      org.apache.spark.sql.functions.when($"id" % 2 === 0, $"png")
        .otherwise(org.apache.spark.sql.functions.lit("junk".getBytes)))
    assert(Multimodal.decodeImages(spark, mixed, "id", "png").count() == 25)
  }
}
