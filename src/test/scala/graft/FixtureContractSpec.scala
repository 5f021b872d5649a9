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
