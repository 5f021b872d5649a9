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
