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

  test("real decode: synthesized BMP dims equal the synthesized header's") {
    // ids 0..3 sweep all four BMP row-padding cases (w=16..19); the larger ids
    // exercise both dim formulas' wrap-around
    val ids = Seq(0L, 1L, 2L, 3L, 500L, 97L * 89L + 5L)
    val media = spark.sparkContext
      .parallelize(ids.map(id => (id, "image/bmp", Multimodal.syntheticBmp(id))))
      .toDF("media_id", "mime", "payload")
    val rows = Multimodal.decode(media).orderBy("media_id").collect()
    assert(rows.length === ids.length)
    for ((r, id) <- rows.zip(ids.sorted)) {
      val expW = 16 + java.lang.Math.floorMod(id, 97L).toInt
      val expH = 16 + java.lang.Math.floorMod(id / 97L, 89L).toInt
      assert(r.getAs[Int]("width") === expW, s"width of id=$id")
      assert(r.getAs[Int]("height") === expH, s"height of id=$id")
      assert(r.getAs[Int]("n_frames") === 1) // a still image, not the md5 fake
      assert(r.getAs[Long]("n_bytes") === Multimodal.syntheticBmp(id).length.toLong)
    }
  }

  test("realDecode unit: valid BMP parses, truncated/garbage fall back to None") {
    assert(Multimodal.realDecode(Multimodal.syntheticBmp(42L)) === Some((58, 16, 1)))
    assert(Multimodal.realDecode(Multimodal.syntheticBmp(42L).take(20)) === None)
    assert(Multimodal.realDecode("BMnot really a bitmap header".getBytes("UTF-8")) === None)
    assert(Multimodal.realDecode("plain text".getBytes("UTF-8")) === None)
  }

  test("real decode: synthesized multi-frame GIF frame count equals the synthesized one") {
    // r17: n_frames is real for GIF (getNumImages on the open reader); ids
    // sweep the frame-count formula's range including its wrap-around
    val ids = Seq(0L, 1L, 5L, 6L, 7L, 40L)
    val media = spark.sparkContext
      .parallelize(ids.map(id => (id, "image/gif", Multimodal.syntheticGif(id))))
      .toDF("media_id", "mime", "payload")
    val rows = Multimodal.decode(media).orderBy("media_id").collect()
    for ((r, id) <- rows.zip(ids.sorted)) {
      assert(r.getAs[Int]("n_frames") ===
        2 + java.lang.Math.floorMod(id, 7L).toInt, s"n_frames of id=$id")
      assert(r.getAs[Int]("width") === 8 + java.lang.Math.floorMod(id, 13L).toInt)
      assert(r.getAs[Int]("height") === 8 + java.lang.Math.floorMod(id, 11L).toInt)
    }
    // unit level too, incl. a still GIF's count staying 1-based and real
    val one = Multimodal.realDecode(Multimodal.syntheticGif(12L))
    assert(one === Some((8 + 12, 8 + 1, 2 + 5)))
  }

  test("decode branch gating: image/* garbage falls back to fake; text/plain " +
    "payloads never attempt the codec even with an image magic") {
    val garbageImage = Seq((1L, "garbage bytes under an image mime"))
      .toDF("id", "text")
    val fakeOut = Multimodal.decode(
      Multimodal.asMedia(garbageImage, "id", "text", "image/png"))
      .collect().head
    // the fake's md5-derived fields, not a codec's (the payload is undecodable)
    // fake values recomputed via the documented md5 contract:
    val (fw, fh, ff, ffp) = {
      val bytes = "garbage bytes under an image mime".getBytes("UTF-8")
      val h = graft.functions.TokenHash.md5(bytes)
      def v(i: Int) = ((h(i) & 0xff) << 8) | (h(i + 1) & 0xff)
      (16 + v(0) % 1024, 16 + v(2) % 1024, 1 + v(4) % 240,
        h.take(8).map(b => f"${b & 0xff}%02x").mkString)
    }
    assert(fakeOut.getAs[Int]("width") === fw)
    assert(fakeOut.getAs[Int]("height") === fh)
    assert(fakeOut.getAs[Int]("n_frames") === ff)
    assert(fakeOut.getAs[String]("fingerprint") === ffp)
    // "BM"-leading TEXT payload: the mime gate keeps it on the fake branch —
    // the oracle's m02 rows must be a pure function of md5(payload)
    val bmText = Seq((2L, "BM is how this text begins, 54+ bytes of it to be safe here"))
      .toDF("id", "text")
    val out = Multimodal.decode(
      Multimodal.asMedia(bmText, "id", "text", "text/plain")).collect().head
    val hb = graft.functions.TokenHash.md5(
      "BM is how this text begins, 54+ bytes of it to be safe here".getBytes("UTF-8"))
    def vb(i: Int) = ((hb(i) & 0xff) << 8) | (hb(i + 1) & 0xff)
    assert(out.getAs[Int]("width") === 16 + vb(0) % 1024)
    assert(out.getAs[Int]("n_frames") === 1 + vb(4) % 240)
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
