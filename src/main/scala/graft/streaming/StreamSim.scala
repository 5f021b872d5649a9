package graft.streaming

import graft.Materialize.Ops
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding near-duplicate detection — the embedding analog of
  * [[StreamDedup]], composing [[Similarity.nearDupPairs]]'s batch shape
  * over a continuous ingest: vectors arrive in micro-batches, each is
  * assigned to its IVF cell against a FIXED offline-trained quantizer
  * (the [[Similarity.kmeansCentroids]] artifact — training stays a batch
  * job, exactly as the LSH stream inherits the batch index), and the cell
  * occupancy index lives in Structured Streaming keyed state
  * (`flatMapGroupsWithState` per cell).
  *
  * A new vector emits one candidate per prior occupant of its cell —
  * O(new × occupancy) per batch, never a rescan — and the exact-cosine
  * verify joins candidates back to the embedding store per micro-batch
  * (stream-static, [[verifyPairs]]): keyed state holds only cell → ids,
  * never vectors, so state is 8 bytes per ingested embedding regardless
  * of dimension.
  *
  * 100 TB / continuous-ingest design mirrors StreamDedup knob for knob:
  * `maxCell` caps a degenerate cell's fan-out at O(cap²) with drops
  * counted into the caller's accumulator; `idleTtlMs` evicts idle cells
  * (post-eviction arrivals pair only forward — bounded recall loss, or
  * re-seed from the lake via a batch [[Similarity.nearDupPairs]] over the
  * compaction window); the shared [[BucketState.pairArrivals]] step keeps
  * the cap/TTL/emit semantics identical to the text stream's.
  *
  * Assignment arithmetic: a per-row left fold over the cid-sorted packed
  * centroids keeping the strictly-greater cosine — identical winner and
  * lowest-cid tie-break to the batch `min(struct(-cosine, cid))` hash
  * aggregate (`StreamSimSpec` pins fold ≡ ivfAssignTo on the fixture).
  * The fold needs no pre-shuffle: the only exchange in the stream is the
  * groupByKey on cell id, matching StreamDedup's latency-bound shape.
  */
object StreamSim {

  case class EmbIn(vec_id: Long, embedding: Seq[Double])
  case class CellRow(cid: Long, vec_id: Long)
  case class CandPair(va: Long, vb: Long)

  /** Per-row IVF cell assignment against an explicit (cid, cv) centroid
    * table: broadcast the packed cid-sorted centroid array, fold for the
    * argmax. No shuffle, no aggregate — one row in, one row out.
    */
  def cellRows(emb: DataFrame, cent: DataFrame): Dataset[CellRow] = {
    import emb.sparkSession.implicits._
    val packed = cent.agg(
      array_sort(collect_list(struct(col("cid"), col("cv")))).as("cents"))
    val best = aggregate(
      col("cents"),
      struct(lit(Double.NegativeInfinity).as("sim"), lit(-1L).as("cid")),
      (acc, e) => {
        val s = Similarity.cosine(col("v"), e("cv"))
        when(s > acc("sim"),
          struct(s.as("sim"), e("cid").as("cid"))).otherwise(acc)
      })
    emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(packed))
      .select(best("cid").as("cid"), col("vec_id"))
      .as[CellRow]
  }

  /** Stateful candidate generation: keyed state per cell holds occupant
    * ids; each arriving vector pairs with every prior occupant (and
    * earlier arrivals in the same batch). Pairs are canonical (va < vb);
    * the verify/sink stage dedups, as in the batch shape.
    */
  def candidates(
      cells: Dataset[CellRow],
      maxCell: Int = 4096,
      idleTtlMs: Option[Long] = None,
      droppedVecs: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[CandPair] = {
    import cells.sparkSession.implicits._
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    cells.groupByKey(_.cid)
      .flatMapGroupsWithState[Array[Long], CandPair](
        OutputMode.Append, timeoutConf) {
        case (_, rows, state: GroupState[Array[Long]]) =>
          BucketState.pairArrivals(rows.map(_.vec_id), state, maxCell,
              idleTtlMs, droppedVecs, "StreamSim")
            .map { case (a, b) => CandPair(a, b) }
      }
  }

  /** Driver-gate form: stream the embedding table through the cell-state
    * operator (parquet file source, AvailableNow), verify survivors
    * against the store, and return the pair set — which must hash-match
    * the BATCH nearDupPairs oracle, putting the streaming state machinery
    * itself under the correctness gate (the sim analog of
    * `cdc_stream_dedup`). The quantizer is trained batch-side first, as
    * the offline artifact it is in production.
    */
  def nearDupStreamed(
      spark: org.apache.spark.sql.SparkSession, sfDir: String,
      centOpt: Option[DataFrame] = None): DataFrame = {
    val name = "sim_nd_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val path = s"$sfDir/embeddings.parquet"
    val embStatic = spark.read.parquet(path)
    val cent = centOpt.getOrElse(
      Similarity.kmeansCentroids(embStatic, 16, 2).materialize())
    // the file stream source requires a DIRECTORY; the fixture is a single
    // parquet file — stage a link to it in a temp dir (a production lake
    // is a directory already)
    val streamDir = java.nio.file.Files.createTempDirectory("graft_ss")
    val target = java.nio.file.Paths.get(path)
    val staged = streamDir.resolve("part-0.parquet")
    try java.nio.file.Files.createSymbolicLink(staged, target)
    catch { case _: Exception =>
      java.nio.file.Files.copy(target, staged); ()
    }
    val src = spark.readStream.schema(embStatic.schema)
      .parquet(streamDir.toString)
    val q = candidates(cellRows(src, cent))
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    verifyPairs(spark.table(name), embStatic, 0.4)
  }

  /** Exact-cosine verification of (deduped) candidates against the
    * embedding store — the stream-static member of the foreachBatch
    * join. Identical output contract to [[Similarity.nearDupPairs]]:
    * (va, vb, sim) at cosine ≥ threshold, sim rounded to 6.
    */
  def verifyPairs(
      cand: DataFrame, emb: DataFrame, threshold: Double): DataFrame = {
    val v = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    cand.select("va", "vb").distinct()
      .join(v.select(col("vec_id").as("va"), col("v").as("xa")), "va")
      .join(v.select(col("vec_id").as("vb"), col("v").as("xb")), "vb")
      .select(col("va"), col("vb"),
        Similarity.cosine(col("xa"), col("xb")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("va"), col("vb"), round(col("sim"), 6).as("sim"))
  }
}
