package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through the engine as
  * opaque `binary` columns with typed metadata, and per-item media work (decode,
  * feature extraction, resize, frame sampling) runs as a partition-local batch
  * operator — the Scala analog of `mapInPandas`: one iterator of rows in, one out,
  * no per-row JVM/interpreter crossings, executor-parallel by partition.
  *
  * The actual codecs are NOT in this container, so `fakeDecode` is a clearly-marked
  * DETERMINISTIC FAKE (pure function of the bytes) standing in for e.g. libjpeg: the
  * schema contract, batch shape, partitioning, and null handling — the parts that
  * must survive a 100 TB run — are real and tested; swap `fakeDecode` for a real
  * codec binding and nothing else changes. The fake derives its outputs from
  * md5(payload) with portable hex arithmetic, so DuckDB oracles reproduce every
  * value exactly (same contract trick as `token_hash16`).
  *
  * At scale: payload bytes dominate, so operators never shuffle the binary column —
  * decode/resize/sample are narrow (partition-local) transformations; only the
  * extracted compact features (dims, hashes, embeddings) ever enter a shuffle.
  */
object Multimodal {

  /** Decoded-media metadata produced per item. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("fingerprint", StringType, nullable = false)))

  /** STUB — deterministic fake decode. A real build links an image/audio codec here;
    * this fake derives plausible dimensions from md5(payload) only, so tests and
    * DuckDB oracles reproduce it exactly: with `h` = md5 hex string and
    * `v(k)` = hex digits [k, k+3] as a 16-bit int (digest bytes 2⌊k/4⌋, 2⌊k/4⌋+1),
    * width = 16 + v(1) % 1024, height = 16 + v(5) % 1024,
    * n_frames = 1 + v(9) % 240, fingerprint = substr(h, 1, 16).
    */
  private[multimodal] def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val h = graft.functions.TokenHash.md5(bytes)
    def v(i: Int) = ((h(i) & 0xff) << 8) | (h(i + 1) & 0xff)
    val w = 16 + v(0) % 1024
    val ht = 16 + v(2) % 1024
    val frames = 1 + v(4) % 240
    val fp = h.take(8).map(b => f"${b & 0xff}%02x").mkString
    (w, ht, frames, fp)
  }

  /** Decode a media table `(media_id long, mime string, payload binary)` into
    * [[decodedSchema]]. Partition-local batch operator: the lambda receives a whole
    * partition's iterator (the `mapInPandas` batch analog), touches each payload
    * once, and emits compact metadata — the binary column does not survive into the
    * output, so downstream shuffles move only small rows.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mime, bytes) =>
          val (w, h, f, fp) = fakeDecode(bytes)
          (id, mime, bytes.length.toLong, w, h, f, fp)
        }
      }
      .toDF("media_id", "mime", "n_bytes", "width", "height", "n_frames", "fingerprint")
  }

  /** Resize planning: compute target dims preserving aspect ratio against a max edge.
    * Pure column arithmetic over decoded metadata (no payload access) — stays in
    * whole-stage codegen.
    */
  def resizePlan(decoded: DataFrame, maxEdge: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxEdge) / greatest(col("width").cast("double"), col("height").cast("double")))
    decoded.select(col("media_id"),
      col("width"), col("height"),
      round(col("width") * scale).cast("int").as("out_width"),
      round(col("height") * scale).cast("int").as("out_height"))
  }

  /** Frame sampling plan for video-like media: every `stride`-th frame index up to
    * `maxFrames`, exploded to one row per sampled frame. Array arithmetic — the
    * payload is untouched; a real pipeline would pass (media_id, frame_idx) to a
    * partition-local extractor exactly like [[decode]].
    */
  def sampleFrames(decoded: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    decoded
      .filter(col("n_frames").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0), least(col("n_frames") - 1, lit((maxFrames - 1).toLong * stride)),
          lit(stride.toLong))).as("frame_idx"))

  /** Wrap any table into the media contract by treating a string column's UTF-8
    * bytes as the payload — how the test tables (no real images in the container)
    * exercise the pipeline end-to-end.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mime).as("mime"),
      encode(col(textCol), "UTF-8").as("payload"))
}
