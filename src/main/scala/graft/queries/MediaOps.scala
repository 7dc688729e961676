package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal pipeline queries: the documents table's text bytes stand in for media
  * payloads (no codec libs in the container — Multimodal.decode is a deterministic
  * stub over real partition-local plumbing). The stub derives every output from
  * md5(payload) with portable hex arithmetic, so all three queries are fully
  * oracle-checked in DuckDB — swapping in a real codec later changes only the
  * kernel, not the plumbing or the checks.
  */
object MediaOps {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private def decoded(s: SparkSession, d: String): DataFrame =
    Multimodal.decode(Multimodal.asMedia(documents(s, d), "doc_id", "text", "text/plain"))

  val queries: Map[String, Q] = Map(
    // Decode: binary payload -> typed metadata; payload dropped before any shuffle.
    "m02_media_decode" -> ((s, d) =>
      decoded(s, d)
        .select("media_id", "mime", "n_bytes", "width", "height", "n_frames", "fingerprint")
        .orderBy("media_id")),

    // Resize planning over decoded dims: pure codegen arithmetic, no payload access.
    "m03_resize_plan" -> ((s, d) =>
      Multimodal.resizePlan(decoded(s, d), maxEdge = 256)
        .orderBy("media_id")),

    // Frame sampling plan: every 10th frame, max 8 per item, one row per frame.
    "m04_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(decoded(s, d), stride = 10, maxFrames = 8)
        .orderBy("media_id", "frame_idx")),
  )

  /** Hex digits [o, o+3] of md5 hex string `h` as a 16-bit int (mirrors
    * Multimodal.fakeDecode's digest-byte arithmetic).
    */
  private def hexv(o: Int): String = OracleSql.hex16("h", o.toString)

  /** DuckDB CTE mirroring [[Multimodal.fakeDecode]] over the documents payload. */
  private val DecCte =
    "WITH raw AS (SELECT doc_id AS media_id, 'text/plain' AS mime, " +
      "CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, md5(text) AS h FROM documents), " +
      "dec AS (SELECT media_id, mime, n_bytes, " +
      s"CAST(16 + (${hexv(1)} % 1024) AS INTEGER) AS width, " +
      s"CAST(16 + (${hexv(5)} % 1024) AS INTEGER) AS height, " +
      s"CAST(1 + (${hexv(9)} % 240) AS INTEGER) AS n_frames, " +
      "substr(h, 1, 16) AS fingerprint FROM raw)"

  val oracles: Map[String, String] = Map(
    "m02_media_decode" ->
      (DecCte + " SELECT media_id, mime, n_bytes, width, height, n_frames, fingerprint " +
        "FROM dec ORDER BY media_id"),
    "m03_resize_plan" ->
      (DecCte + ", rp AS (SELECT media_id, width, height, " +
        "least(1.0, 256.0 / greatest(CAST(width AS DOUBLE), CAST(height AS DOUBLE))) AS scale FROM dec) " +
        "SELECT media_id, width, height, " +
        "CAST(round(width * scale) AS INTEGER) AS out_width, " +
        "CAST(round(height * scale) AS INTEGER) AS out_height " +
        "FROM rp ORDER BY media_id"),
    "m04_frame_sample" ->
      (DecCte + " SELECT media_id, unnest(range(0, least(n_frames - 1, 70) + 1, 10)) AS frame_idx " +
        "FROM dec ORDER BY media_id, frame_idx"),
  )
}
