package graft.operators

import graft.QueryRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sequence-assembly operator family wired to the driver gate ([EXT]):
  * concat-and-chunk packing manifest + per-document overlapping windows.
  * Oracles run the single-window form of the same integral arithmetic —
  * bitwise-equal to the two-phase distributed prefix sum by construction.
  */
object PackingQueries extends QueryRegistry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // packing manifest at 256-token sequences; tok_start comes from the
    // two-phase prefix sum (see Packing.tokenOffsets' 100 TB note)
    "text_pack" -> ((s, dir) => Packing.packStats(docs(s, dir), 256)),
    // 64-token windows advancing by 48 (16 tokens of shared context)
    "text_chunk" -> ((s, dir) => Packing.chunk(docs(s, dir), 64, 48)))

  def oracles: Map[String, String] = Map(
    "text_pack" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, n,
        |  sum(n) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS tok_start
        |  FROM d)
        |SELECT CAST(tok_start // 256 AS BIGINT) AS pack_id, count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1""".stripMargin,
    "text_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, t, n,
        |  CASE WHEN n <= 64 THEN 1
        |       ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) + 1 END AS nc
        |  FROM t),
        |e AS (SELECT doc_id, t, n,
        |  unnest(generate_series(0, nc - 1)) AS chunk_idx FROM c)
        |SELECT doc_id, chunk_idx, chunk_idx * 48 AS chunk_start,
        |  least(64, n - chunk_idx * 48) AS chunk_len,
        |  md5(array_to_string(
        |    t[chunk_idx * 48 + 1 : chunk_idx * 48 + least(64, n - chunk_idx * 48)],
        |    ' ')) AS chunk_md5
        |FROM e""".stripMargin)
}
