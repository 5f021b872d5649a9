package graft.operators

import graft.QueryRegistry
import graft.sources.Lake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake / dataset-versioning query family ([EXT]): the snapshot audit
  * side of the publishing discipline `sources/Lake` implements (the
  * write side is spec-tested in `LakeSpec`; diffing is the read side a
  * gate can oracle-check).
  */
object LakeQueries extends QueryRegistry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // [EXT] snapshot diff: v2 is derived deterministically from the
    // fixture (every 70th doc removed, every 40th survivor edited, every
    // 50th re-published under a new id) so both engines diff the same
    // two versions. Output = the added/removed/changed ledger only.
    "lake_snapshot_diff" -> ((s, dir) => {
      val v1 = docs(s, dir).select("doc_id", "text")
      val v2 = v1.filter(col("doc_id") % 70 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 40 === 0, concat(col("text"), lit(" [v2]")))
            .otherwise(col("text")).as("text"))
        .union(v1.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      Lake.snapshotDiff(v1, v2, "doc_id", "text")
    }))

  def oracles: Map[String, String] = Map(
    "lake_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 40 = 0 THEN text || ' [v2]' ELSE text END AS text
        |  FROM v1 WHERE doc_id % 70 <> 0
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, text FROM v1 WHERE doc_id % 50 = 0),
        |o AS (SELECT doc_id, md5(text) AS old_hash FROM v1),
        |n AS (SELECT doc_id, md5(text) AS new_hash FROM v2),
        |j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |        o.doc_id AS oid, n.doc_id AS nid, old_hash, new_hash
        |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id),
        |c AS (SELECT doc_id,
        |    CASE WHEN oid IS NULL THEN 'added'
        |         WHEN nid IS NULL THEN 'removed'
        |         WHEN old_hash IS DISTINCT FROM new_hash THEN 'changed'
        |         ELSE 'unchanged' END AS change,
        |    old_hash, new_hash FROM j)
        |SELECT doc_id, change, old_hash, new_hash FROM c
        |WHERE change <> 'unchanged'""".stripMargin)
}
