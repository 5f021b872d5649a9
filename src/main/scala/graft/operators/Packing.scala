package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence assembly over a document lake: global token offsets
  * (distributed prefix sum), concat-and-chunk packing, and per-document
  * overlapping windows (SURVEY.md §2.10 [EXT] — the step between a curated
  * corpus and a token-budgeted training run).
  *
  * 100 TB design — the prefix sum is the interesting part. A naive
  * `sum(n) OVER (ORDER BY doc_id)` is a single-partition window: the whole
  * corpus sorts through one task. Here it is two-phase:
  *   1. per-bucket token sums (`doc_id div bucketSize`) — one hash
  *      aggregate with map-side partials, ~n/bucketSize rows out;
  *   2. an exclusive cumsum over the (tiny) bucket-sum table — the only
  *      unpartitioned window, over n/bucketSize rows, broadcast back;
  *   3. a within-bucket cumsum window, partitioned by bucket — parallel.
  * At 10⁹ docs and bucketSize 2¹⁰ the serial step sees ~10⁶ rows; if that
  * ever dominates, apply the same split recursively (bucket-of-buckets).
  * All arithmetic is integral, so the result is bitwise-equal to the
  * single-window form the oracle runs.
  */
object Packing {

  /** Two-phase exclusive prefix sum of `n` in doc_id order over any
    * (doc_id, n) frame — the shared core of token packing and byte
    * sharding. Returns (doc_id, n, start).
    */
  private def prefixSum(items: DataFrame, bucketSize: Int): DataFrame = {
    val d = items.select(col("doc_id"), col("n"),
      expr(s"cast(doc_id as bigint) div $bucketSize").as("bucket"))
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = d.groupBy("bucket").agg(sum("n").as("bn"))
      .withColumn("boff", coalesce(sum("bn").over(wOff), lit(0L)))
      .select("bucket", "boff")
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    d.withColumn("cum_in", sum("n").over(wIn))
      .join(broadcast(bucketOffsets), "bucket")
      .select(col("doc_id"), col("n"),
        (col("boff") + col("cum_in") - col("n")).as("start"))
  }

  /** (doc_id, n, tok_start) — n = whitespace token count, tok_start = the
    * document's global token offset in doc_id order (exclusive prefix sum).
    */
  def tokenOffsets(docs: DataFrame, bucketSize: Int = 1024): DataFrame =
    prefixSum(
      docs.select(col("doc_id"),
        size(TextDedup.tokens(col("text"))).cast("long").as("n")),
      bucketSize)
      .select(col("doc_id"), col("n"), col("start").as("tok_start"))

  /** WebDataset-style byte-budget shard manifest: items (doc_id, nbytes)
    * are laid out in doc_id order and cut into `shardBytes`-sized shards —
    * an item belongs to the shard where its first byte lands. Returns the
    * per-shard manifest (counts, byte volume, id range) a shard writer and
    * a training loader both consume. Same distributed prefix-sum core as
    * token packing — the serial step sees n/bucketSize rows only.
    */
  def shardManifest(items: DataFrame, shardBytes: Long,
      bucketSize: Int = 1024): DataFrame =
    prefixSum(items.select(col("doc_id"), col("nbytes").cast("long").as("n")),
      bucketSize)
      .select(col("doc_id"), col("n"),
        expr(s"start div $shardBytes").as("shard_id"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_items"), sum("n").as("n_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))

  /** GPT-style concat-and-chunk packing: the corpus is one long token
    * stream in doc_id order, cut into fixed `packSize`-token sequences; a
    * document belongs to the pack where its first token lands. Returns
    * per-pack occupancy stats (the packing manifest a loader shards on).
    */
  def packStats(docs: DataFrame, packSize: Int,
      bucketSize: Int = 1024): DataFrame =
    packStatsItems(
      docs.select(col("doc_id"),
        size(TextDedup.tokens(col("text"))).cast("long").as("n")),
      packSize, bucketSize)

  /** Packing over an explicit (doc_id, n) length table — the entry point
    * for callers whose lengths are NOT whitespace counts (e.g. trained-
    * tokenizer token counts, see `text_pack_bpe`). Same two-phase prefix
    * sum, same manifest shape.
    */
  def packStatsItems(items: DataFrame, packSize: Int,
      bucketSize: Int = 1024): DataFrame =
    prefixSum(items.select(col("doc_id"), col("n").cast("long").as("n")),
      bucketSize)
      .select(col("doc_id"), col("n"),
        expr(s"start div $packSize").as("pack_id"))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))

  /** Per-document overlapping token windows (`chunkLen` tokens, advancing
    * by `stride` < chunkLen): every token is covered, consecutive chunks
    * share `chunkLen - stride` tokens of context, and the last chunk is
    * the remainder. Narrow explode — no shuffle; chunk identity is the
    * md5 of the re-joined slice so downstream exact-dedup composes.
    */
  def chunk(docs: DataFrame, chunkLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= chunkLen,
      s"stride must be in [1, chunkLen], got stride=$stride len=$chunkLen")
    val t = TextDedup.tokens(col("text"))
    val n = size(t)
    // #chunks >= 1 always (a short doc is one chunk), so sequence() never
    // sees start > stop (which would step DOWNWARD — the text_decontam
    // lesson)
    val nChunks = when(n <= chunkLen, lit(1L)).otherwise(
      ceil((n - lit(chunkLen)).cast("double") / stride) + lit(1L))
    docs
      .select(col("doc_id"), t.as("t"), n.cast("long").as("n"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("chunk_start"),
        least(lit(chunkLen.toLong), col("n") - col("chunk_idx") * stride)
          .as("chunk_len"),
        md5(array_join(
          slice(col("t"), (col("chunk_idx") * stride + 1).cast("int"),
            least(lit(chunkLen.toLong), col("n") - col("chunk_idx") * stride)
              .cast("int")),
          " ")).as("chunk_md5"))
  }
}
