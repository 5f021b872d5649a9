package graft

import graft.Materialize.Ops
import graft.operators.TextDedup
import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.DocIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental LSH near-dup must converge to the batch
  * minhashLshPairs result once the whole corpus has streamed through —
  * candidates accumulate across micro-batches via keyed bucket state, and
  * the foreachBatch verify joins back to the document store.
  */
class StreamDedupSpec extends SparkSuite {

  private def fixtureDocs() = {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").limit(120)
    // synthesize near-dups (the fixture's texts are unique): every 30th doc
    // re-appears under a high id — streaming must pair them with the
    // originals even when the copy arrives batches later
    d.union(d.filter(col("doc_id") % 30 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
  }

  test("streamed LSH candidates + verify == batch minhashLshPairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = fixtureDocs().materialize()

    val mem = MemoryStream[DocIn]
    val cand = StreamDedup.candidates(
      StreamDedup.bandRows(mem.toDF(), "doc_id", "text"))
    val verified = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = cand.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamDedup.CandPair], _: Long) =>
        StreamDedup.verifyPairs(batch.toDF(), docs, "doc_id", "text")
          .collect().foreach(r =>
            verified += ((r.getLong(0), r.getLong(1), r.getDouble(2))))
        ()
      }
      .start()

    // stream the corpus in 3 micro-batches, originals split from copies so
    // cross-batch pairing exercises the bucket state
    val rows = docs.as[DocIn].collect().sortBy(_.doc_id)
    val (orig, copies) = rows.partition(_.doc_id < 500000L)
    val (o1, o2) = orig.splitAt(orig.length / 2)
    mem.addData(o1.toSeq); q.processAllAvailable()
    mem.addData(o2.toSeq); q.processAllAvailable()
    mem.addData(copies.toSeq); q.processAllAvailable()
    q.stop()

    val batchPairs = TextDedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchPairs.nonEmpty, "fixture must produce near-dup pairs")
    assert(verified.toSet === batchPairs)
  }

  test("bucket index runs on the RocksDB state store (the 100 TB backend)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val before = spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
    graft.streaming.CdcStream.useRocksDBStateStore(spark)
    try {
      val mem = MemoryStream[DocIn]
      val cand = StreamDedup.candidates(
        StreamDedup.bandRows(mem.toDF(), "doc_id", "text"))
      val q = cand.writeStream.format("memory").queryName("sd_rocks")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      mem.addData(DocIn(1L, "x y x y x y x y")); q.processAllAvailable()
      mem.addData(DocIn(2L, "x y x y x y x y")); q.processAllAvailable()
      val provider = q.lastProgress.stateOperators.headOption
        .map(_.customMetrics.keySet().toString).getOrElse("")
      q.stop()
      assert(provider.contains("rocksdb"),
        s"expected RocksDB custom metrics, got: $provider")
      // cross-batch pairing still works through RocksDB-backed state
      assert(spark.table("sd_rocks")
        .filter(col("doc_a") === 1L && col("doc_b") === 2L).count() >= 1L)
    } finally before match {
      case Some(v) => spark.conf
        .set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf
        .unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("shingle-less docs (< 2 tokens) enter no buckets — no collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val cand = StreamDedup.candidates(
      StreamDedup.bandRows(mem.toDF(), "doc_id", "text"))
    val q = cand.writeStream.format("memory").queryName("sd_short")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // 1-token docs have an empty shingle set — an all-null signature would
    // put every one of them into one shared bucket and pair them all
    mem.addData(DocIn(1L, "solo"), DocIn(2L, "x"), DocIn(3L, "y"))
    q.processAllAvailable(); q.stop()
    assert(spark.table("sd_short").count() === 0L,
      "shingle-less docs must not form candidate pairs")
  }

  // TTL runs use single-batch runs (Trigger.Once) against a shared
  // checkpoint, one query run per wave: with ProcessingTimeTimeout
  // registered the engine schedules timeout-check batches forever
  // (shouldRunAnotherBatch stays true), so BOTH processAllAvailable() on
  // a continuous query and Trigger.AvailableNow spin endlessly. Each
  // restart's single batch processes the wave's data AND fires timeouts
  // for buckets whose last touch predates (now - TTL) — deterministic
  // eviction points.
  private def runTtlWave(
      mem: MemoryStream[DocIn], ckpt: String,
      pairs: scala.collection.mutable.Set[(Long, Long)],
      data: Seq[DocIn]): Long = {
    mem.addData(data)
    val cand = StreamDedup.candidates(
      StreamDedup.bandRows(mem.toDF(), "doc_id", "text"),
      idleTtlMs = Some(5L))
    // foreachBatch sink: the memory sink refuses checkpoint recovery
    val q = cand.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[StreamDedup.CandPair], _: Long) =>
          batch.collect().foreach(p => pairs += ((p.doc_a, p.doc_b)))
          ()
      }
      .start()
    q.awaitTermination()
    q.recentProgress
      .flatMap(_.stateOperators.headOption).map(_.numRowsTotal).lastOption
      .getOrElse(0L)
  }

  test("idle buckets evict after the TTL — state bounded on a rolling stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("sd_ttl_ckpt").toString
    val mem = MemoryStream[DocIn]
    // three waves of mutually-unrelated docs: every wave creates its own
    // buckets and touches no earlier wave's, so with no eviction state
    // would grow by ~4 buckets per doc per wave, forever
    def wave(ids: Range, tag: String) = ids.map(i =>
      DocIn(i.toLong, s"$tag$i a$tag$i b$tag$i c$tag$i d$tag$i e$tag$i"))
    val sink = scala.collection.mutable.Set[(Long, Long)]()
    val afterW1 = runTtlWave(mem, ckpt, sink, wave(1 to 20, "p"))
    assert(afterW1 > 0L)
    Thread.sleep(200) // all wave-1 buckets idle past the 5 ms TTL
    val afterW2 = runTtlWave(mem, ckpt, sink, wave(21 to 40, "q"))
    Thread.sleep(200)
    val afterW3 = runTtlWave(mem, ckpt, sink, wave(41 to 60, "r"))
    // bounded: each wave's run evicts the previous wave's idle buckets,
    // so total state rows never exceed one wave's bucket count
    assert(afterW2 <= afterW1, s"wave2 state $afterW2 > wave1 $afterW1")
    assert(afterW3 <= afterW1, s"wave3 state $afterW3 > wave1 $afterW1")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ckpt))
  }

  test("post-eviction arrival misses evicted occupants, pairs with later ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("sd_ttl_miss_ckpt").toString
    val mem = MemoryStream[DocIn]
    val text = "u v u v u v u v"
    val pairs = scala.collection.mutable.Set[(Long, Long)]()
    runTtlWave(mem, ckpt, pairs, Seq(DocIn(1L, text)))
    Thread.sleep(200)
    // unrelated traffic whose run's timeout pass evicts doc 1's buckets
    runTtlWave(mem, ckpt, pairs, Seq(DocIn(99L, "w x w x w x w x")))
    // doc 2 lands in doc 1's (now-empty) buckets: the 1–2 pair is LOST —
    // the documented recall trade; doc 3 in the same run pairs with doc 2
    runTtlWave(mem, ckpt, pairs, Seq(DocIn(2L, text), DocIn(3L, text)))
    assert(!pairs.contains((1L, 2L)),
      "pair against an evicted occupant must be missed (bounded recall loss)")
    assert(pairs.contains((2L, 3L)),
      "post-eviction occupants must pair among themselves")
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ckpt))
  }

  test("maxBucket drops are counted in the droppedDocs accumulator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val acc = spark.sparkContext.longAccumulator("graft.streamDedup.dropped")
    val mem = MemoryStream[DocIn]
    val cand = StreamDedup.candidates(
      StreamDedup.bandRows(mem.toDF(), "doc_id", "text"),
      maxBucket = 2, droppedDocs = Some(acc))
    val q = cand.writeStream.format("memory").queryName("sd_capped")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val text = "m n m n m n m n"
    // one batch of 4 identical docs against cap 2: 2 admitted, 2 dropped
    // — dropped docs enter neither pairs nor state, and the batch-
    // divergence is visible in the accumulator (4 bands × 2 docs = 8)
    mem.addData((1 to 4).map(i => DocIn(i.toLong, text)))
    q.processAllAvailable()
    val afterBatch1 = acc.value
    assert(afterBatch1 === 8L,
      s"expected 2 docs × 4 band-buckets dropped, got $afterBatch1")
    // a later arrival into the full bucket is dropped too (no crossing
    // warning anymore, but the count still moves)
    mem.addData(DocIn(5L, text)); q.processAllAvailable()
    q.stop()
    assert(acc.value === 12L, s"expected 12 total, got ${acc.value}")
  }

  test("stream warm-started from the lake index finds new×old pairs " +
    "a cold stream misses") {
    import graft.operators.LshIndex
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = fixtureDocs().materialize()
    val (settled, arriving) = {
      val rows = docs.as[DocIn].collect().sortBy(_.doc_id)
      rows.partition(_.doc_id < 500000L) // copies stream in later
    }
    val idxDir = java.nio.file.Files.createTempDirectory("sd_warm_idx")
    val table = "sd_warm_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      // the batch lifecycle owns the settled corpus
      LshIndex.build(settled.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        s"$idxDir/index", table)

      def streamPairs(warm: Boolean): Set[(Long, Long)] = {
        val mem = MemoryStream[DocIn]
        val init = if (warm)
          Some(StreamDedup.initialStateFromIndex(spark, table)) else None
        val cand = StreamDedup.candidates(
          StreamDedup.bandRows(mem.toDF(), "doc_id", "text"),
          initialState = init)
        val name = if (warm) "sd_warm" else "sd_cold"
        val q = cand.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
        mem.addData(arriving.toSeq); q.processAllAvailable()
        val out = spark.table(name).select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        q.stop()
        out
      }

      val warm = streamPairs(warm = true)
      val cold = streamPairs(warm = false)
      // ground truth: all candidate pairs touching the arriving batch =
      // the batch incremental identity the lifecycle is spec-pinned to
      val expected = TextDedup.minhashLshPairs(docs, "doc_id", "text")
        .filter(col("doc_a") >= 500000L || col("doc_b") >= 500000L)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.nonEmpty, "fixture must produce new×old pairs")
      // warm stream: every verified-grade candidate pair is present
      // (candidates ⊇ verified pairs; verify is the downstream join)
      assert(expected.subsetOf(warm),
        s"warm stream missed: ${expected -- warm}")
      // cold stream cannot see the settled corpus: new×old pairs missing
      assert((expected -- cold).nonEmpty,
        "cold stream unexpectedly found settled-corpus pairs")
      assert(cold.forall { case (a, b) => a >= 500000L && b >= 500000L },
        "cold stream pairs must be within-batch only")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("replayed doc re-emits no pairs (bucket state is idempotent)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val cand = StreamDedup.candidates(
      StreamDedup.bandRows(mem.toDF(), "doc_id", "text"))
    val q = cand.writeStream.format("memory").queryName("sd_replay")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val a = DocIn(1L, "x y x y x y x y")
    val b = DocIn(2L, "x y x y x y x y")
    mem.addData(a, b); q.processAllAvailable()
    val n1 = spark.table("sd_replay").count()
    assert(n1 >= 1L) // identical docs collide in every band
    mem.addData(a); q.processAllAvailable() // at-least-once source replay
    val n2 = spark.table("sd_replay").count()
    q.stop()
    assert(n2 === n1, "replayed doc must not duplicate candidate pairs")
  }
}
