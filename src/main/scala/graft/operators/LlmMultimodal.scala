package graft.operators

import org.apache.spark.sql.{functions => F}

/** Multimodal-column convention (SURVEY.md §2.4): an asset is an opaque
  * `binary` payload plus a typed `struct` metadata column. The decode /
  * feature-extraction step is a stub (no image/audio libs in this
  * environment — see [[graft.multimodal.StubDecoder]] for the
  * mapPartitions plumbing); everything Spark-side (schema, projection,
  * metadata filter, payload hashing) is real.
  *
  * Scale notes: the asset table pattern keeps payloads as parquet binary —
  * scans that only touch metadata prune the payload column entirely
  * (columnar projection), so "find all 3-channel images wider than X" never
  * reads a byte of pixel data. Payload-touching stages (hashing, decode)
  * are narrow per-row work that scales linearly with no shuffle.
  */
object LlmMultimodal extends Catalog {

  val queries: Map[String, Q] = Map(
    // Build asset rows (payload = utf-8 bytes of the document as a
    // deterministic stand-in for image bytes; metadata derived from
    // document stats), filter on metadata, project decoded primitives.
    "llm_multimodal" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(F.col("doc_id"),
          F.to_binary(F.col("text"), F.lit("utf-8")).as("payload"),
          F.struct(
            F.lit("img/fake").as("fmt"),
            (F.pmod(F.col("n_chars"), F.lit(512)) + 64).as("width"),
            (F.pmod(F.col("doc_id"), F.lit(256)) + 32).as("height"),
            F.lit(3).as("channels")).as("meta"))
        .filter(F.col("meta.width") >= 128)
        .select(F.col("doc_id"),
          F.col("meta.fmt").as("fmt"),
          F.col("meta.width").as("width"),
          F.col("meta.height").as("height"),
          F.col("meta.channels").as("channels"),
          (F.col("meta.width") * F.col("meta.height") * F.col("meta.channels"))
            .as("n_pixels"),
          F.length(F.col("payload")).cast("long").as("n_bytes"),
          F.md5(F.col("payload")).as("payload_hash"))
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    // encode(text) is the same utf-8 byte payload; DuckDB 1.0 has no
    // md5(BLOB), and md5(text) hashes those identical bytes.
    "llm_multimodal" ->
      """WITH assets AS (
           SELECT doc_id,
                  'img/fake' AS fmt,
                  (n_chars % 512) + 64 AS width,
                  (doc_id % 256) + 32 AS height,
                  3 AS channels,
                  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                  md5(text) AS payload_hash
           FROM documents)
         SELECT doc_id, fmt, width, height, channels,
                width * height * channels AS n_pixels,
                n_bytes, payload_hash
         FROM assets WHERE width >= 128 ORDER BY doc_id"""
  )
}
