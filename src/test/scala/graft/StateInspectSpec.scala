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
}
