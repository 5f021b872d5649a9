package graft

import graft.streaming.CdcStream
import graft.streaming.CdcStream.Ch
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.Trigger

/** The reference's BLOCKING tail mode (cdc.py:19-25,100): a standing
  * Trigger.ProcessingTime deployment that keeps running between change
  * batches, picking up each new binlog segment as it lands — as opposed to
  * the AvailableNow run-to-completion mode every gate query uses. This
  * spec drives [[CdcStream.run]] against LIVE file drops: start the query,
  * drop a file, assert the incremental state, drop another, assert again,
  * clean stop.
  */
class StandingStreamSpec extends SparkSuite {

  private def ch(rid: String, act: String, seq: Long, v: Double = 0.0) =
    Ch("db.t", rid, act, seq, seq, v, null)

  test("standing ProcessingTime query tails file drops incrementally " +
      "and stops cleanly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_standing").toString
    val in = s"$dir/in"
    val state = s"$dir/state"
    new java.io.File(in).mkdirs()

    def drop(name: String, rows: Seq[Ch]): Unit = {
      // stage outside the watched dir, then move in — the file source must
      // never list a half-written file (same discipline as a binlog
      // uploader writing .tmp then renaming)
      val tmp = s"$dir/stage_$name"
      rows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$in/$name.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    def stateRows(): Map[String, String] =
      try spark.read.parquet(state).select("rid", "cdc_action").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      catch { case scala.util.control.NonFatal(_) => Map.empty }

    def awaitState(want: Map[String, String], what: String): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      var got = stateRows()
      while (got != want && System.nanoTime() < deadline) {
        Thread.sleep(200); got = stateRows()
      }
      assert(got === want, s"$what not reached within 60s")
    }

    // first segment is dropped BEFORE the query starts (bootstrap backlog);
    // the second lands while the query is live (the tail)
    drop("seg1", Seq(ch("a", "insert", 1, 1.5), ch("b", "insert", 2, 2.5)))
    val src = spark.readStream.schema(Encoders.product[Ch].schema)
      .parquet(in).as[Ch]
    val q = CdcStream.run(spark, src, state, s"$dir/ckpt",
      trigger = Trigger.ProcessingTime("200 milliseconds"))
    try {
      awaitState(Map("a" -> "insert", "b" -> "insert"), "bootstrap state")
      // live drop: delete a (annihilates), update b, insert c — the
      // standing query must absorb it WITHOUT a restart
      drop("seg2", Seq(ch("a", "delete", 3), ch("b", "update", 4, 9.0),
        ch("c", "insert", 5, 3.0)))
      awaitState(Map("b" -> "insert", "c" -> "insert"), "tailed state")
      // merge semantics held across the standing boundary: insert+update
      // stays insert with the new payload (rcache.py:196-222)
      val bVal = spark.read.parquet(state)
        .filter($"rid" === "b").select("value").head().getDouble(0)
      assert(bVal === 9.0)
    } finally {
      q.stop()
      q.awaitTermination()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    assert(!q.isActive)
  }
}
