package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark

/** The multimodal plumbing under test: schema contract, determinism, null-free
  * metadata extraction, resize arithmetic, frame-sampling shape. The decode itself is
  * a documented deterministic stub (no codecs in the container).
  */
class MultimodalSpec extends AnyFunSuite {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "a much longer document body with more bytes"),
      (3L, "hello world")).toDF("id", "text"),
    "id", "text", "image/fake")

  test("decode emits the typed metadata contract, payload dropped") {
    val out = Multimodal.decode(media)
    assert(out.columns.toSeq ===
      Seq("media_id", "mime", "n_bytes", "width", "height", "n_frames", "fingerprint"))
    val rows = out.orderBy("media_id").collect()
    assert(rows.length === 3)
    assert(rows.forall(!_.anyNull))
    assert(rows(0).getAs[Long]("n_bytes") === 11L)
    // determinism: identical payloads -> identical decode output
    assert(rows(0).getAs[String]("fingerprint") === rows(2).getAs[String]("fingerprint"))
    assert(rows(0).getAs[Int]("width") === rows(2).getAs[Int]("width"))
    // dims in the stub's documented range
    assert(rows.forall { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      w >= 16 && w < 1040 && h >= 16 && h < 1040 && r.getAs[Int]("n_frames") >= 1
    })
  }

  test("resizePlan preserves aspect ratio against the max edge") {
    val decoded = Seq((1L, 1000, 500), (2L, 100, 50)).toDF("media_id", "width", "height")
    val out = Multimodal.resizePlan(decoded, maxEdge = 256).orderBy("media_id").collect()
    // 1000x500 -> 256x128; 100x50 unchanged (scale capped at 1.0)
    assert(out(0).getAs[Int]("out_width") === 256 && out(0).getAs[Int]("out_height") === 128)
    assert(out(1).getAs[Int]("out_width") === 100 && out(1).getAs[Int]("out_height") === 50)
  }

  test("sampleFrames emits stride-spaced indices capped at maxFrames") {
    val decoded = Seq((1L, 35), (2L, 3), (3L, 500)).toDF("media_id", "n_frames")
    val out = Multimodal.sampleFrames(decoded, stride = 10, maxFrames = 4)
      .groupBy("media_id").agg(sort_array(collect_list("frame_idx")).as("idx"))
      .orderBy("media_id").collect()
    assert(out(0).getSeq[Long](1) === Seq(0L, 10L, 20L, 30L))
    assert(out(1).getSeq[Long](1) === Seq(0L))
    assert(out(2).getSeq[Long](1) === Seq(0L, 10L, 20L, 30L)) // capped at 4 frames
  }
}
