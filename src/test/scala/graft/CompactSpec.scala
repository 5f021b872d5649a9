package graft

import scala.util.Random
import Types._

/** The declarative (Catalyst higher-order aggregate) compact must equal the
  * pure Scala fold on arbitrary shuffled change logs — this pins the
  * distributed implementation to the reference semantics.
  */
class CompactSpec extends SparkSuite {

  test("declarative compact == pure fold on random shuffled changelog") {
    for (seed <- Seq(7, 42, 1234)) checkSeed(seed)
  }

  private def checkSeed(seed: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(seed)
    val acts = Vector(Insert, Update, Delete)
    val rows = (0L until 5000L).map { seq =>
      val rid = (rnd.nextInt(120)).toString
      (("db.t", rid, acts(rnd.nextInt(3)), 1000L + seq, seq, s"v$seq"))
    }
    val shuffled = rnd.shuffle(rows)
    val df = shuffled.toDF("table", "rid", "cdc_action", "cdc_ts", "seq", "v")

    val got = Merge.compact(df, Seq("table", "rid"))
      .collect()
      .map(r => (r.getString(1), (r.getString(2), r.getLong(3), r.getString(5))))
      .toMap

    // pure model: per rid, sort by seq, fold
    val want = rows.groupBy(_._2).flatMap { case (rid, rs) =>
      val sorted = rs.sortBy(_._5)
      val folded = Merge.foldActions(sorted.map(_._3))
      folded.map(a => rid -> ((a, sorted.last._5, sorted.last._6)))
    }

    assert(got === want)
    // annihilated keys truly absent
    assert(got.keySet === want.keySet)
  }

  test("compact drops annihilated keys and keeps latest payload") {
    import spark.implicits._
    val df = Seq(
      ("db.t", "a", Insert, 1L, 1L, "a1"),
      ("db.t", "a", Delete, 2L, 2L, "a2"),   // a annihilated
      ("db.t", "b", Insert, 1L, 3L, "b1"),
      ("db.t", "b", Update, 2L, 4L, "b2"),   // b stays insert, payload b2
      ("db.t", "c", Update, 1L, 5L, "c1"),
      ("db.t", "c", Delete, 2L, 6L, "c2")    // c net delete
    ).toDF("table", "rid", "cdc_action", "cdc_ts", "seq", "v")
    val out = Merge.compact(df, Seq("table", "rid")).collect()
      .map(r => r.getString(1) -> ((r.getString(2), r.getString(5)))).toMap
    assert(out === Map("b" -> ((Insert, "b2")), "c" -> ((Delete, "c2"))))
  }

  test("incremental view maintenance identity holds at any cutoff") {
    import org.apache.spark.sql.functions._
    val ch = CdcBatch.changeLog(spark, sf0001)
    // direct recompute of the view from the fully compacted log
    val direct = Merge.compact(ch, Seq("table", "rid"))
      .groupBy("table")
      .agg(count(lit(1)).as("n_live"),
        (sum(round(col("value") * 100, 0).cast("long")).cast("double")
          / 100.0).as("sum_value"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val maxSeq = ch.agg(max("seq")).head().getLong(0)
    // cutoffs across the log, incl. degenerate ends: k=0 (everything is
    // suffix — pure recompute) and k=max (no suffix — pure base)
    for (frac <- Seq(0.0, 0.1, 0.5, 0.9, 1.0)) {
      val k = (maxSeq * frac).toLong
      val got = CdcBatch.incrementalLiveView(ch.withColumn("k", lit(k)))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got === direct, s"cutoff k=$k")
    }
  }
}
