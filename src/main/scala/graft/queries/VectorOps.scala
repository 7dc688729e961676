package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding: array<float>`).
  *
  * Two paths, mirroring a production ANN stack:
  *  - s01: brute-force cosine top-k — the exactness baseline. One broadcast of the
  *    query vector, one scan, one top-k sort; no shuffle of the embedding column.
  *  - s02: LSH-bucketed ANN — sign-bit hyperplane bucketing (axis-aligned LSH): only
  *    vectors in the query's bucket are scored. At 100 TB the bucket id becomes the
  *    storage partition key, so the scan prunes to one bucket.
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd, sequential fold — same
  * accumulation order as the DuckDB oracle's positional unnest sum).
  */
object VectorOps {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private def dotCos: Column = {
    val dot = aggregate(
      zip_with(col("embedding"), col("qe"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (a, v) => a + v)
    val sa = aggregate(col("embedding"), lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))
    val sq = aggregate(col("qe"), lit(0.0), (a, y) => a + y.cast("double") * y.cast("double"))
    round(dot / (sqrt(sa) * sqrt(sq)), 5)
  }

  /** 8-bit sign bucket over the first 8 dims (deterministic axis-aligned LSH). */
  private def signBucket(c: Column): Column =
    concat((1 to 8).map(i => when(element_at(c, i) >= 0, "1").otherwise("0")): _*)

  val queries: Map[String, Q] = Map(
    "s01_cosine_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      emb.crossJoin(broadcast(q))
        .select(col("vec_id"), dotCos.as("cos"))
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(10)
    }),

    "s02_ann_bucket" -> ((s, d) => {
      val emb = embeddings(s, d).withColumn("bucket", signBucket(col("embedding")))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("bucket").as("qb"))
      emb.join(broadcast(q), col("bucket") === col("qb"))
        .select(col("vec_id"), dotCos.as("cos"))
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(5)
    }),

    // Embedding-cosine near-dup (dedup family #5): sign-bucket LSH candidate pairs
    // (same-bucket equi-join, id_a < id_b — never all-pairs), scored exactly, kept
    // above a cosine threshold. The bucket is the shuffle key; at 100 TB it becomes
    // the storage partition key so candidate scoring is partition-local.
    "d08_embed_neardup" -> ((s, d) => {
      val emb = embeddings(s, d).withColumn("bucket", signBucket(col("embedding")))
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("bucket"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"), col("bucket"))
      val dot = aggregate(
        zip_with(col("ea"), col("eb"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val na = aggregate(col("ea"), lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
      val nb = aggregate(col("eb"), lit(0.0), (acc, y) => acc + y.cast("double") * y.cast("double"))
      a.join(b, "bucket").filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), round(dot / (sqrt(na) * sqrt(nb)), 5).as("cos"))
        .filter(col("cos") >= 0.25)
        .orderBy("id_a", "id_b")
    }),
  )

  private val CosSql =
    "round(dot / (sqrt(sa) * sqrt(sq)), 5)"

  val oracles: Map[String, String] = Map(
    "s01_cosine_topk" ->
      ("WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), " +
        "z AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y FROM embeddings e CROSS JOIN q), " +
        "s AS (SELECT vec_id, sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot, " +
        "sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sa FROM z GROUP BY vec_id), " +
        "qs AS (SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS sq FROM (SELECT unnest(qe) AS y FROM q)) " +
        s"SELECT vec_id, $CosSql AS cos FROM s CROSS JOIN qs ORDER BY cos DESC, vec_id LIMIT 10"),
    "s02_ann_bucket" ->
      ("WITH b AS (SELECT vec_id, embedding, " +
        (1 to 8).map(i => s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
          .mkString("concat(", ", ", ")") + " AS bucket FROM embeddings), " +
        "q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0), " +
        "c AS (SELECT b.vec_id, b.embedding, q.qe FROM b JOIN q ON b.bucket = q.qb), " +
        "z AS (SELECT c.vec_id, unnest(c.embedding) AS x, unnest(c.qe) AS y FROM c), " +
        "s AS (SELECT vec_id, sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot, " +
        "sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sa FROM z GROUP BY vec_id), " +
        "qs AS (SELECT sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS sq FROM (SELECT unnest(qe) AS y FROM q)) " +
        s"SELECT vec_id, $CosSql AS cos FROM s CROSS JOIN qs ORDER BY cos DESC, vec_id LIMIT 5"),
    "d08_embed_neardup" ->
      ("WITH b AS (SELECT vec_id, embedding, " +
        (1 to 8).map(i => s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
          .mkString("concat(", ", ", ")") + " AS bucket FROM embeddings), " +
        "p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.embedding AS ea, b2.embedding AS eb " +
        "FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id), " +
        "z AS (SELECT id_a, id_b, unnest(ea) AS x, unnest(eb) AS y FROM p), " +
        "s AS (SELECT id_a, id_b, sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot, " +
        "sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na, sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb " +
        "FROM z GROUP BY id_a, id_b) " +
        "SELECT id_a, id_b, cos FROM (SELECT id_a, id_b, round(dot / (sqrt(na) * sqrt(nb)), 5) AS cos FROM s) " +
        "WHERE cos >= 0.25 ORDER BY id_a, id_b"),
  )
}
