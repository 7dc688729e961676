package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal pipeline queries: the documents table's text bytes stand in for media
  * payloads (no codec libs in the container — Multimodal.decode is a deterministic
  * stub over real partition-local plumbing). The decode step is not expressible in
  * DuckDB SQL (FNV-1a over bytes), so these queries have NO oracleSql entry — the
  * driver records the weaker rows-only check, by design.
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
        .select("media_id", "mime", "n_bytes", "width", "height", "n_frames")
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

  /** Not SQL-expressible (stub decode is FNV-1a over payload bytes) — no oracles. */
  val oracles: Map[String, String] = Map.empty
}
