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
    "text_chunk" -> ((s, dir) => Packing.chunk(docs(s, dir), 64, 48)),
    // [EXT] training-order resharding: every doc gets a deterministic
    // md5-derived shuffle key; shard = key mod 8 (the reproducible
    // global permutation a training run needs — same corpus, same
    // shards, any cluster size). Per-shard accounting is ONE hash
    // aggregate — counts, token mass, and the order-head doc via
    // min_by on the unique key — no window, no per-shard sort; at
    // 100 TB the within-shard order is realized by the lake writer's
    // in-file sort on the same key (sources/Lake.scala), so shard
    // files stream in training order without any global sort.
    "train_shards" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      // the order key is the NUMERIC 60-bit md5 prefix, not the hex
      // string: a string-ordered min/min_by carries a string aggregation
      // buffer, which HashAggregate can't mutate in place — Spark falls
      // back to SortAggregate and every partition pays a sort by shard.
      // All-long buffers keep the accounting a true hash aggregate
      // (plan-pinned in PlanAuditSpec). Numeric order ≡ lexicographic
      // order on the fixed-width lowercase hex prefix.
      val key = md5(concat(lit("shard:"), col("doc_id").cast("string")))
      docs(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          conv(substring(key, 1, 15), 16, 10).cast("long").as("k"))
        .withColumn("shard", pmod(col("k"), lit(8L)))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          min_by(col("doc_id"), col("k")).as("head_doc"),
          min(col("k")).as("head_key"))
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          col("head_doc"), col("head_key"))
    },
    // [EXT] exact-quota stratified train/val/test split: within each
    // lang, docs in salted-hash order fill train to ceil(0.8·n) then
    // val to ceil(0.9·n) — reproducible without coordination (the
    // assignment is a pure function of doc_id) and audit-exact per
    // stratum. The oracle reruns the identical rank-and-ceil
    // arithmetic, so the hash pins quota edges, not just proportions.
    "train_split_stratified" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      Split.stratified(
        docs(s, dir).select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok")),
        Seq("lang"), col("doc_id"), 0.8, 0.1)
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
    },
    // [EXT] deterministic mixture resampling (the data-mixing step): de
    // halved, en quartered, zh upweighted to 2.5 EPOCHS (two full
    // copies + a deterministic half), fr/es untouched — all from one
    // pure map + explode. The rates are chosen with exact binary
    // fractions so both engines' floor/remainder arithmetic agrees
    // bit-for-bit; max_copy pins that upsampling really emitted
    // repetition indices, not just weights.
    "train_mixture" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      Split.mixture(
        docs(s, dir).select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok")),
        "lang", Map("de" -> 0.5, "en" -> 0.25, "zh" -> 2.5), col("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("doc_id").as("n_docs"),
          sum("n_tok").as("n_tokens"), max("mix_copy").as("max_copy"))
    })

  def oracles: Map[String, String] = Map(
    // mirror of the md5 shard key: 15 hex chars < 2⁶⁰ fit a BIGINT in
    // both engines; arg_min ≡ min_by (key is unique per doc — no ties)
    "train_shards" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  ('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::BIGINT
        |    AS k FROM documents),
        |sh AS (SELECT doc_id, n_tok, k, k % 8 AS shard FROM d)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  arg_min(doc_id, k) AS head_doc, min(k) AS head_key
        |FROM sh GROUP BY 1""".stripMargin,
    // the fraction arithmetic is forced to DOUBLE on the oracle side:
    // DuckDB's bare 0.8 literal is DECIMAL, whose exact 0.9·n differs
    // from the binary double 0.9000…01·n Spark computes at quota edges
    "train_split_stratified" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
        |    AS k FROM documents),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY lang ORDER BY k) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n FROM d),
        |a AS (SELECT lang, n_tok, doc_id,
        |  CASE WHEN rn <= ceil(n * CAST(0.8 AS DOUBLE)) THEN 'train'
        |       WHEN rn <= ceil(n * (CAST(0.8 AS DOUBLE)
        |                            + CAST(0.1 AS DOUBLE))) THEN 'val'
        |       ELSE 'test' END AS split FROM r)
        |SELECT lang, split, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM a GROUP BY 1, 2""".stripMargin,
    "train_mixture" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  (('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 15))::BIGINT
        |     % 1000000) / 1000000.0 AS b FROM documents),
        |r AS (SELECT *, CASE lang WHEN 'de' THEN 0.5 WHEN 'en' THEN 0.25
        |                 WHEN 'zh' THEN 2.5 ELSE 1.0 END AS rate FROM d),
        |c AS (SELECT *, CAST(floor(rate) AS BIGINT)
        |  + CASE WHEN b < rate - floor(rate) THEN 1 ELSE 0 END AS copies
        |  FROM r),
        |e AS (SELECT doc_id, lang, n_tok,
        |  unnest(generate_series(0, copies - 1)) AS mix_copy
        |  FROM c WHERE copies > 0)
        |SELECT lang, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  max(mix_copy) AS max_copy
        |FROM e GROUP BY 1""".stripMargin,
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
