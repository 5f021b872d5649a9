package graft.streaming

import graft.operators.TextDedup
import org.apache.spark.sql.{DataFrame, Dataset, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming incremental MinHash-LSH near-duplicate detection — the
  * streaming composition of the batch [[TextDedup.minhashLshPairs]] shape:
  * documents arrive as a stream, every micro-batch's docs are signed and
  * banded with the IDENTICAL signature/band-key arithmetic as batch (so
  * the candidate set converges to the batch candidate set), and the LSH
  * bucket index lives in Structured Streaming keyed state
  * (`flatMapGroupsWithState` per (band, bucket)) instead of a self-join.
  *
  * A new doc emits one candidate pair per prior occupant of any bucket it
  * lands in — incremental work is O(new × bucket occupancy), never a
  * rescan of the accumulated corpus. Exact-Jaccard verification joins the
  * (id-only) candidates back to the document store per micro-batch
  * ([[verifyPairs]], a stream-static/foreachBatch join): texts stay in the
  * lake, keyed state holds only bucket→ids.
  *
  * 100 TB / continuous-ingest design:
  * - state per (band, bucket) is an id array — bands × n longs total,
  *   partitioned by bucket key across executors; RocksDB state store
  *   ([[CdcStream.useRocksDBStateStore]]) keeps it off-heap at scale.
  * - `maxBucket` caps a degenerate (boilerplate) bucket's occupancy:
  *   arrivals beyond the cap enter neither the pair set nor state — a
  *   bucket emits O(cap²) pairs total even when one catch-up batch dumps
  *   B ≫ cap docs into it, exactly like the batch df-cap defends the
  *   containment join. Capped drops are OBSERVABLE: pass `droppedDocs`
  *   (a driver-registered accumulator) and alert on nonzero — a capped
  *   bucket means the stream's pair set has diverged from batch
  *   `minhashLshPairs`, which has no cap (plus one stderr warning on the
  *   crossing batch).
  * - `idleTtlMs` bounds TOTAL state on a continuous ingest: a bucket
  *   untouched for the TTL is evicted (ProcessingTimeTimeout — eviction
  *   advances even when the bucket's key never reappears). Semantics of
  *   a post-eviction arrival: it pairs only with docs that arrive AFTER
  *   it — pairs against evicted occupants are missed (bounded recall
  *   loss, the deliberate trade for bounded state). A pipeline that
  *   cannot accept the loss re-seeds instead: run the batch
  *   `LshIndex.probe` of the new window against the persisted lake index
  *   (the daily-compaction complement), which re-finds any pair the
  *   evicted state missed. Without `idleTtlMs` the index grows with the
  *   distinct-bucket count forever — only correct for bounded corpora.
  * - the per-row signature uses the HOF (non-exploded) form: streaming
  *   micro-batches are latency-bound, not throughput-bound, and the HOF
  *   form needs no per-batch shuffle before the stateful stage (the only
  *   shuffle is the groupByKey on bucket).
  */
object StreamDedup {

  case class DocIn(doc_id: Long, text: String)
  case class BandRow(b: Int, bkey: String, doc_id: Long)
  case class CandPair(doc_a: Long, doc_b: Long)

  /** Per-row MinHash signature + band-bucket keys, unpivoted to one row
    * per (doc, band). Mirrors the batch band key bit-for-bit:
    * md5(concat_ws("|", band's signature slice as strings)).
    */
  def bandRows(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4): Dataset[BandRow] = {
    import docs.sparkSession.implicits._
    val rows = k / bands
    // a doc with no bigram shingles (< 2 tokens) has an ALL-NULL signature
    // — concat_ws would collapse every such doc into one shared bucket per
    // band (state blowup + n² spurious candidates). Batch semantics drop
    // shingle-less docs (they aggregate to no signature row); mirror that.
    // The shingle array is projected ONCE and reused by the filter and the
    // signature — shingling dominates the per-row cost on this
    // latency-bound path.
    val withSig = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextDedup.bigramShingles(col(textCol)).as("shingles"))
      .filter(size(col("shingles")) >= 1)
      .select(col("doc_id"),
        TextDedup.minhashSignature(col("shingles"), k).as("sig"))
    // band keys come from the ONE shared construction (TextDedup.bandKey)
    // so the streaming and batch bucket assignments agree bit-for-bit
    val withBands = withSig.select(
      col("doc_id") +: (0 until bands).map(b =>
        TextDedup.bandKey((0 until rows).map(r =>
          element_at(col("sig"), b * rows + r + 1)))
          .as(s"bk$b")): _*)
    val stackArgs = (0 until bands).map(b => s"$b, bk$b").mkString(", ")
    withBands
      .selectExpr(s"stack($bands, $stackArgs) as (b, bkey)", "doc_id")
      .select("b", "bkey", "doc_id")
      .as[BandRow]
  }

  /** Stateful candidate generation: keyed state per (band, bucket) holds
    * the bucket's occupant ids; each arriving doc pairs with every prior
    * occupant (and earlier arrivals in the same batch), then joins the
    * bucket. Pairs are canonical (doc_a < doc_b); the SAME pair may be
    * emitted by several buckets/batches — the verify/sink stage dedups by
    * pair key, exactly as the batch shape dedups candidates before the
    * Jaccard join.
    */
  /** Bucket-state seed built from a persisted [[graft.operators.LshIndex]]
    * table — the lake→stream bridge: a stream started with this initial
    * state pairs its very first arrivals against the settled corpus
    * (new×old), where a cold stream would silently emit only new×new
    * until the corpus re-streamed through it. The batch lifecycle builds
    * and compacts the index; the stream inherits it at startup.
    *
    * One aggregate over the index (collect per bucket), shuffled by the
    * same (band, bucket) key the stateful operator groups on. Seeded
    * buckets larger than the stream's `maxBucket` stay intact in state
    * but emit no further pairs (room = 0) — consistent with the cap's
    * within-stream behavior. With `idleTtlMs` armed, a seeded bucket's
    * idle clock starts at its FIRST touch (initial state registers no
    * timeout) — bound the seed corpus via the index's own df-cap
    * discipline, not the TTL.
    */
  def initialStateFromIndex(
      spark: SparkSession, table: String)
      : KeyValueGroupedDataset[(Int, String), Array[Long]] = {
    import spark.implicits._
    spark.table(table)
      .groupBy("ikey").agg(sort_array(collect_set("doc_id")).as("ids"))
      .as[(String, Array[Long])]
      .map { case (ikey, ids) =>
        val i = ikey.indexOf(':')
        ((ikey.substring(0, i).toInt, ikey.substring(i + 1)), ids)
      }
      .groupByKey(_._1).mapValues(_._2)
  }

  def candidates(
      banded: Dataset[BandRow],
      maxBucket: Int = 1024,
      idleTtlMs: Option[Long] = None,
      droppedDocs: Option[org.apache.spark.util.LongAccumulator] = None,
      initialState: Option[KeyValueGroupedDataset[(Int, String), Array[Long]]] =
        None): Dataset[CandPair] = {
    import banded.sparkSession.implicits._
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val grouped = banded.groupByKey(r => (r.b, r.bkey))
    def stateful(
        f: ((Int, String), Iterator[BandRow], GroupState[Array[Long]])
          => Iterator[CandPair]): Dataset[CandPair] = initialState match {
      case Some(init) => grouped.flatMapGroupsWithState[Array[Long], CandPair](
        OutputMode.Append, timeoutConf, init)(f)
      case None => grouped.flatMapGroupsWithState[Array[Long], CandPair](
        OutputMode.Append, timeoutConf)(f)
    }
    // cap/TTL/emit semantics live in the ONE shared step
    // (BucketState.pairArrivals) so the text and embedding streams
    // cannot drift apart
    stateful {
        case (_, rows, state: GroupState[Array[Long]]) =>
          BucketState.pairArrivals(rows.map(_.doc_id), state, maxBucket,
              idleTtlMs, droppedDocs, "StreamDedup")
            .map { case (a, b) => CandPair(a, b) }
      }
  }

  /** Exact-Jaccard verification of (deduped) candidate pairs against a
    * document table — the batch-side member of the foreachBatch
    * stream-static join. Identical semantics to the verify tail of
    * [[TextDedup.minhashLshPairs]]: distinct bigram shingles, |∩| / |∪|,
    * threshold filter.
    */
  def verifyPairs(
      cand: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextDedup.bigramShingles(col(textCol))).as("s"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // the Jaccard semantics live in ONE place (TextDedup.verifyJaccardCore)
    // so streaming and batch verification cannot drift apart
    TextDedup.verifyJaccardCore(
      cand.select("doc_a", "doc_b").distinct(), sh, sz, threshold)
  }
}
