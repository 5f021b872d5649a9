package graft.operators

import graft.QueryRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column family wired to the driver gate (X5). The decode stub
  * itself is exercised in ScalaTest (no SQL surface); these queries verify
  * the binary-column plumbing that IS oracle-checkable.
  */
object MultimodalQueries extends QueryRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X5: binary payload + typed metadata — sizes, content hash, format stats
    "mm_binary_meta" -> ((s, dir) =>
      Multimodal.mediaTable(s, dir).select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_md5"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))),
    // X5: per-format aggregate over media metadata
    "mm_format_stats" -> ((s, dir) =>
      Multimodal.mediaTable(s, dir)
        .select(col("meta.format").as("format"),
          length(col("media")).cast("long").as("n_bytes"),
          (col("meta.width") * col("meta.height")).cast("long").as("pixels"))
        .groupBy("format")
        .agg(count(lit(1)).as("n"),
          sum("n_bytes").as("total_bytes"),
          round(avg("pixels"), 6).as("avg_pixels"))))

  private val metaSql =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | md5(text) AS content_md5,
      | CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
      |      WHEN doc_id % 3 = 1 THEN 'png' ELSE 'webp' END AS format,
      | CAST(64 + (doc_id % 8) * 32 AS INT) AS width,
      | CAST(64 + (doc_id % 5) * 48 AS INT) AS height
      |FROM documents""".stripMargin

  def oracles: Map[String, String] = Map(
    "mm_binary_meta" -> metaSql,
    "mm_format_stats" ->
      s"""SELECT format, count(*) AS n,
         | CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         | round(avg(width * height), 6) AS avg_pixels
         |FROM ($metaSql) GROUP BY 1""".stripMargin)
}
