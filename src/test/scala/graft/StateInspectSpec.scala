package graft

import graft.streaming.CdcStream
import org.apache.spark.sql.functions._

/** Offline state introspection contract: the statestore read of a
  * drained merge checkpoint equals the live fold result, and the
  * state-metadata source shows the operator running at the width the
  * state-geometry knob set — the end-to-end proof that
  * `spark.graft.statePartitions` really sizes the store count.
  */
class StateInspectSpec extends SparkSuite {

  private case class Ev(k: Long, tsSec: Long, id: Long)

  test("statestore read equals the fold's live rows; state-metadata " +
      "reports the knob's partition count") {
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_inspspec").toString
    try {
      val insp = CdcStream.stateInspect(spark, sf0001, ckpt)
        .select("table", "rid", "cdc_action", "seq")
        .collect().map(_.toSeq).toSet
      val expect = CdcBatch.compactedSnapshot(spark, sf0001)
        .select("table", "rid", "cdc_action", "seq")
        .collect().map(_.toSeq).toSet
      assert(expect.nonEmpty && insp === expect)

      val meta = spark.read.format("state-metadata")
        .option("path", ckpt).load()
      val rows = meta.select("operatorName", "numPartitions").collect()
      assert(rows.length === 1, meta.collect().mkString("; "))
      assert(rows.head.getString(0).contains("flatMapGroupsWithState"))
      // the stateScopedSession default (8) sized the store count — the
      // knob's effect observed from the persisted checkpoint itself
      assert(rows.head.getInt(1) === 8,
        s"state ran at width ${rows.head.getInt(1)}, knob says 8")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ckpt))
  }

  test("join-state introspection: the interval join's buffered sides " +
      "are readable offline via joinSide") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_jinsp").toString
    try {
      val lMem = MemoryStream[Ev]
      val rMem = MemoryStream[Ev]
      def shape(df: org.apache.spark.sql.DataFrame, p: String) =
        df.select(col("k").as(s"${p}_k"),
          timestamp_seconds(col("tsSec")).as(s"${p}_ts"),
          col("id").as(s"${p}_id"))
      val name = "ji_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = streaming.StreamJoin.intervalJoin(
        shape(lMem.toDF(), "l"), shape(rMem.toDF(), "r"),
        "l_k", "r_k", "l_ts", "r_ts", lowerSec = 10, upperSec = 10,
        watermarkDelay = "1000 seconds")
        .select("l_id", "r_id")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      lMem.addData(Ev(1, 100, 11), Ev(2, 200, 12))
      rMem.addData(Ev(1, 105, 21))
      q.processAllAvailable()
      q.stop()
      // the wide watermark delay keeps everything buffered: the offline
      // joinSide reads must show exactly the fed rows
      def side(sideName: String, idField: String): Set[Long] =
        spark.read.format("statestore").option("path", ckpt)
          .option("joinSide", sideName).load()
          .select(col(s"value.$idField")).collect().map(_.getLong(0)).toSet
      assert(side("left", "l_id") === Set(11L, 12L))
      assert(side("right", "r_id") === Set(21L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ckpt))
  }

  test("state CHANGE FEED: per-batch put/delete audit trail of the fold " +
      "(RocksDB changelog checkpointing)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val s = spark.newSession()
    CdcStream.useRocksDBStateStore(s)
    s.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cfeed").toString
    try {
      val mem = MemoryStream[CdcStream.Ch]
      val name = "cf_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = CdcStream.merged(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0)).start()
      // batch 0: two inserts; batch 1: r1 annihilates (insert+delete),
      // r2 updates in place
      mem.addData(CdcStream.Ch("t1", "r1", "insert", 10L, 1L, 1.0, null),
        CdcStream.Ch("t1", "r2", "insert", 11L, 2L, 2.0, null))
      q.processAllAvailable()
      mem.addData(CdcStream.Ch("t1", "r1", "delete", 12L, 3L, 0.0, null),
        CdcStream.Ch("t1", "r2", "update", 13L, 4L, 5.0, null))
      q.processAllAvailable()
      q.stop()
      val feed = s.read.format("statestore")
        .option("path", ckpt)
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", "0")
        .load()
        .select(col("batch_id"), col("change_type"),
          col("key._2").as("rid"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      // the audit trail: both keys written in batch 0; batch 1 rewrites
      // the updated key AND the annihilated one — annihilation is a PUT
      // of a `none` tombstone, not a state delete: the tombstone's seq
      // is the replay guard that keeps a re-delivered stale insert from
      // resurrecting the dead key (streaming/batch parity under
      // at-least-once tails)
      assert(feed.contains((0L, "update", "r1")), feed.toString)
      assert(feed.contains((0L, "update", "r2")), feed.toString)
      assert(feed.contains((1L, "update", "r1")), feed.toString)
      assert(feed.contains((1L, "update", "r2")), feed.toString)
      assert(!feed.exists(_._2 == "delete"), feed.toString)
      // and the batch-1 write for the annihilated key IS the tombstone
      val st = s.read.format("statestore").option("path", ckpt).load()
        .select(col("value.groupState.rid").as("rid"),
          col("value.groupState.cdc_action").as("a"),
          col("value.groupState.seq").as("seq"))
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      assert(st("r1") === ("none", 3L), st.toString) // guard carries seq
      // insert+update folds to insert-with-new-payload (the merge rule)
      assert(st("r2")._1 === "insert", st.toString)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ckpt))
  }
}
