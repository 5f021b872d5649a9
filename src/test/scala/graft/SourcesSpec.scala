package graft

import graft.sources.{Csv, Jdbc}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** F9 / A6 / S9-S10 helper coverage. */
class SourcesSpec extends AnyFunSuite {

  test("A6 dump policy matches reference thresholds (cdc_config.py:41-48)") {
    assert(!CdcBatch.DumpPolicy.shouldDump(2000000L))
    assert(CdcBatch.DumpPolicy.shouldDump(2000001L))
    assert(!CdcBatch.DumpPolicy.isLate(100000L, 40001L))
    assert(CdcBatch.DumpPolicy.isLate(100000L, 39999L))
  }

  test("S9: information_schema query pushes schema + table filters") {
    val q = Jdbc.columnsQuery("db_test", Seq("t1", "t2"))
    assert(q.contains("table_schema = 'db_test'"))
    assert(q.contains("table_name IN ('t1', 't2')"))
    assert(Jdbc.columnsQuery("db", Nil) ===
      "(SELECT table_name, column_name, data_type, ordinal_position" +
        " FROM information_schema.columns WHERE table_schema = 'db') t")
  }

  test("S9→A8: column specs become typed sorted Spark schemas") {
    val schemas = Jdbc.tableSchemas(Seq(
      ("t1", "id", "bigint"), ("t1", "amount", "decimal(8,2)"),
      ("t2", "name", "varchar(20)")))
    assert(schemas("t1").fieldNames.toSeq === Seq("amount", "id"))
    assert(schemas("t1")("amount").dataType === DecimalType(8, 2))
    assert(schemas("t2")("name").dataType === StringType)
  }
}

class GsUrlSpec extends SparkSuite {
  test("F9: gs url parse (dump2csv.py:236-238)") {
    import spark.implicits._
    val df = Seq("gs://bucket/sys1/42/20160608/db_test.task.1465372800.csv")
      .toDF("u")
    val r = df.select(Csv.parseGsUrl(col("u")).as("p"))
      .select("p.system", "p.sid", "p.dt", "p.table")
      .as[(String, String, String, String)].head()
    assert(r === (("sys1", "42", "20160608", "db_test.task")))
  }
}
