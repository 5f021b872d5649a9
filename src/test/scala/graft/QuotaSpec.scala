package graft

import graft.streaming.Quota
import graft.streaming.Quota.DocTokens
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming token-budget admission must equal the batch window-cumsum
  * form when docs arrive in order — the prefix-cap rule is what makes
  * the two coincide (and keeps the admitted set replay-deterministic).
  */
class QuotaSpec extends SparkSuite {

  test("streamed quota admission == batch cumsum prefix cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val budget = 500L
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[DocTokens].collect().sortBy(_.doc_id).take(150)

    val mem = MemoryStream[DocTokens]
    val q = Quota.admit(mem.toDS(), budget).writeStream
      .format("memory").queryName("quota_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // 3 in-order micro-batches: the budget must carry across batches
    docs.grouped(50).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("quota_out")
      .select("source", "doc_id", "admitted")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val batch = docs.toSeq.toDS()
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("source"), col("doc_id"), (col("cum") <= budget).as("adm"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap

    assert(streamed.size === batch.size)
    assert(streamed === batch)
    // the cap must actually bite on the fixture
    assert(streamed.values.exists(_ == false), "budget never exceeded")
    assert(streamed.values.exists(_ == true), "nothing admitted")
  }

  test("out-of-order cross-batch arrival fails fast, not silently diverges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocTokens]
    val q = Quota.admit(mem.toDS(), 1000L).writeStream
      .format("memory").queryName("quota_ooo")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(DocTokens("s1", 10L, 5L), DocTokens("s1", 20L, 5L))
    q.processAllAvailable()
    // doc_id 15 arrives AFTER 20 was processed: the stream's visit order
    // can no longer match the batch window's — the operator must throw
    // (surfaced as a terminated query), never emit a diverging cumsum
    mem.addData(DocTokens("s1", 15L, 5L))
    val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(failure).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("cross-batch doc_id order")),
      s"expected the fail-fast IllegalStateException, got: $failure")
  }
}
