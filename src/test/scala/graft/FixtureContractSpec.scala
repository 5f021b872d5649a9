package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for silent fixture regeneration (the round-7 failure mode:
  * `events.ts` changed physical type between local runs and the driver
  * gate). Hard-fails naming the exact drifted table.column so the first
  * `sbt test` after a regeneration points straight at the root cause.
  */
class FixtureContractSpec extends AnyFunSuite with SparkSuite {

  test("sf0.001 fixture tables match the FIXTURES.md schema contract") {
    val drift = Fixtures.drift(spark, sf0001)
    assert(drift.isEmpty,
      "\nFIXTURE DRIFT (regenerate? update Fixtures.tables + FIXTURES.md):\n" +
        drift.mkString("  ", "\n  ", "\n"))
  }

  test("normalizeTs: long-nanos, timestamp, and timestamp_ntz inputs " +
      "yield identical epoch nanos") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val micros = Seq(1704067207179575L, 1704070800000001L, 946684800000000L)
    val want = micros.map(_ * 1000L)
    val asLong = micros.map(_ * 1000L).toDF("ts")
    val asTs = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    // session TZ is UTC, so the TS→NTZ cast preserves the instant — the
    // same convention the DuckDB oracle applies to naive timestamps
    val asNtz = asTs.select(expr("CAST(ts AS TIMESTAMP_NTZ)").as("ts"))
    def nanos(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      CdcBatch.normalizeTs(df).collect().map(_.getLong(0)).toSeq
    assert(nanos(asLong) === want)
    assert(nanos(asTs) === want)
    assert(nanos(asNtz) === want)
  }

  test("events.ts normalizes to epoch-nanos long whatever the file type") {
    val df = CdcBatch.readEvents(spark, sf0001)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    // sanity: epoch nanos for any plausible fixture date sits in [2000, 2100)
    val r = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").head()
    val y2000 = 946684800L * 1000000000L
    val y2100 = 4102444800L * 1000000000L
    assert(r.getLong(0) >= y2000 && r.getLong(1) < y2100,
      s"ts range [${r.getLong(0)}, ${r.getLong(1)}] is not epoch nanos")
  }
}
