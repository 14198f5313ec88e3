package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode pipeline emits one typed meta row per media blob") {
    val meta = Multimodal.decodePipeline(spark, sf0001)
    val rows = meta.as[Multimodal.MediaMeta].collect()
    assert(rows.length == 500)
    assert(rows.forall(m => m.n_bytes > 0 && m.width >= 1 &&
      m.height >= 1 && Set("jpeg", "png", "wav", "mp4")(m.format)))
    // deterministic stub: re-running decodes to identical checksums
    val again = Multimodal.decodePipeline(spark, sf0001)
      .as[Multimodal.MediaMeta].collect()
    assert(rows.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("frame sampling slices n frames from the binary payload") {
    val df = Seq(("x" * 1000)).toDF("t")
      .select(col("t").cast("binary").as("media"))
    val frames = df.select(Multimodal.sampleFrames(col("media"), 4, 16)
      .as("frames"))
      .select(size(col("frames"))).as[Int].collect().head
    assert(frames == 4)
  }
}
