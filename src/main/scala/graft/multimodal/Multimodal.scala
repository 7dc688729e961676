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
  * The decode kernel is REAL for the image formats whose codecs ship in the JDK
  * (r16): payloads that declare an image mime AND carry a known magic
  * (BMP/PNG/JPEG/GIF) get their true width/height from a `javax.imageio` header
  * read inside the partition-local batch — [[realDecode]]; MultimodalSpec pins it
  * against synthesized BMPs whose header dims are a pure function of the id.
  * Everything else falls back to `fakeDecode`, a clearly-marked DETERMINISTIC FAKE
  * (pure function of the bytes) standing in for the codecs NOT in this container
  * (video/audio): it derives its outputs from md5(payload) with portable hex
  * arithmetic, so DuckDB oracles reproduce every value exactly (same contract
  * trick as `token_hash16`). The oracle-checked m-queries feed text payloads under
  * `text/plain`, so they exercise the plumbing through the fake branch and stay
  * reproducible in SQL; the mime gate (not just the magic sniff) is what keeps
  * that deterministic — a document whose text happens to start with "BM" must not
  * flip branches on content alone.
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
    (w, ht, frames, fingerprintOf(bytes))
  }

  /** Content fingerprint — md5-prefix of the raw payload bytes, format-agnostic
    * (a REAL fingerprint: identical payloads dedupe at any scale), shared by both
    * decode branches.
    */
  private def fingerprintOf(bytes: Array[Byte]): String =
    graft.functions.TokenHash.md5(bytes).take(8).map(b => f"${b & 0xff}%02x").mkString

  /** Magic sniff for the image formats whose readers ship in the JDK. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 'B'.toByte && b(1) == 'M'.toByte) || // BMP
        (b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte) || // PNG
        (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) || // JPEG
        (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte)) // GIF

  /** REAL image header decode via `javax.imageio` (in-JDK codecs: BMP, PNG, JPEG,
    * GIF): the reader parses the actual format header for width/height without
    * materializing pixels — the honest decode step of a metadata-extraction pass,
    * and the seam where a full pixel pipeline (features, thumbnails) would hang
    * off the same reader. Memory-backed input stream, never ImageIO's default
    * FILE cache — an executor thread must not create a temp file per payload.
    * Returns None (→ fake fallback) for unknown magics, truncated/corrupt
    * headers, or absurd parsed dims.
    *
    * `n_frames` is REAL too (r17) for the one in-JDK format where multi-frame
    * is a real thing: GIF payloads get `ImageReader.getNumImages(true)` on the
    * already-open reader — a block-structure walk over the in-memory stream,
    * still no pixel decode. BMP/PNG/JPEG are single-frame by format (ImageIO
    * has no APNG reader), so their frame count is the constant 1, not a probe.
    */
  private[multimodal] def realDecode(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    if (!looksLikeImage(bytes)) None
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            // seekForwardOnly=false (the second argument) is required so
            // getNumImages(allowSearch=true) below can walk the stream's
            // block structure backwards-and-forwards; safe here because the
            // stream is a bounded in-memory buffer, so the walk is a bounded
            // header scan, not I/O
            r.setInput(iis, false, true)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val frames =
              if (bytes(0) == 'G'.toByte) math.max(1, r.getNumImages(true))
              else 1
            if (w > 0 && h > 0 && w <= (1 << 24) && h <= (1 << 24))
              Some((w, h, frames))
            else None
          } finally r.dispose()
        }
      } catch {
        case scala.util.control.NonFatal(_) => None
      } finally iis.close()
    }

  /** Deterministic 24-bit BMP payload, a pure function of `id` — the synthesized
    * stand-in for a real image corpus (no image files ship in the container):
    * width = 16 + id mod 97, height = 16 + (id div 97) mod 89, pixel (x, y) =
    * BGR((id+x) mod 256, (id+y) mod 256, (x xor y) mod 256), rows bottom-up and
    * 4-byte padded per the format. MultimodalSpec decodes these through
    * [[realDecode]] and asserts the parsed dims equal this header's.
    */
  def syntheticBmp(id: Long): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(id, 97L).toInt
    val h = 16 + java.lang.Math.floorMod(id / 97L, 89L).toInt
    val pad = (4 - (w * 3) % 4) % 4
    val imgSize = (w * 3 + pad) * h
    val buf = java.nio.ByteBuffer.allocate(54 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-array offset
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24) // BITMAPINFOHEADER
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        buf.put(((id + x) & 0xff).toByte)
          .put(((id + y) & 0xff).toByte)
          .put(((x ^ y) & 0xff).toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y += 1
    }
    buf.array()
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
          // mime gate BEFORE the magic sniff: text payloads must stay on the
          // deterministic fake branch even when their bytes start like an
          // image (see the object scaladoc — the oracle depends on it)
          val real =
            if (mime != null && mime.startsWith("image/")) realDecode(bytes)
            else None
          real match {
            case Some((w, h, frames)) =>
              (id, mime, bytes.length.toLong, w, h, frames, fingerprintOf(bytes))
            case None =>
              val (w, h, f, fp) = fakeDecode(bytes)
              (id, mime, bytes.length.toLong, w, h, f, fp)
          }
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

  /** Deterministic animated GIF payload, a pure function of `id` — the
    * multi-frame analog of [[syntheticBmp]], written through the JDK's own GIF
    * encoder (so the bytes are a real GIF89a the decode path must genuinely
    * parse): frame count = 2 + id mod 7, dims = (8 + id mod 13, 8 + id mod 11),
    * frame f's pixels a pure function of (id, f, x, y). MultimodalSpec decodes
    * these through [[realDecode]] and asserts the parsed frame count equals
    * this function's.
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val frames = 2 + java.lang.Math.floorMod(id, 7L).toInt
    val w = 8 + java.lang.Math.floorMod(id, 13L).toInt
    val h = 8 + java.lang.Math.floorMod(id, 11L).toInt
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (((id + f + x) & 0xff) << 16 |
              ((id + y) & 0xff).toInt << 8 | ((x ^ y) & 0xff).toInt).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

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
