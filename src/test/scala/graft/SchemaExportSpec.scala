package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** A8/K7 parity: schema export sorted by name with CDC columns appended
  * (bq_schema_from_mysql.py:150-158).
  */
class SchemaExportSpec extends AnyFunSuite {

  test("bq schema: mapped types, cdc columns, sorted by name") {
    val cols = Seq(
      "task_id" -> "int(11)",
      "uuid" -> "varchar(64)",
      "created" -> "datetime",
      "amount" -> "decimal(10,2)")
    val schema = SchemaExport.bqSchema(cols)
    assert(schema.map(_.name) ===
      Seq("amount", "cdc_action", "cdc_ts", "created", "task_id", "uuid"))
    assert(schema.map(f => f.name -> f.`type`).toMap === Map(
      "amount" -> "float",        // reference is lossy here on purpose
      "cdc_action" -> "string",
      "cdc_ts" -> "timestamp",
      "created" -> "timestamp",
      "task_id" -> "integer",
      "uuid" -> "string"))
  }

  test("json form is a stable sorted array") {
    val json = SchemaExport.bqSchemaJson(Seq("b" -> "int", "a" -> "text"))
    assert(json ===
      """[{"name": "a", "type": "string"}, {"name": "b", "type": "integer"}, """ +
      """{"name": "cdc_action", "type": "string"}, {"name": "cdc_ts", "type": "timestamp"}]""")
  }

  test("spark-native schema export keeps real types") {
    val payload = StructType(Seq(
      StructField("uuid", StringType), StructField("amount", DecimalType(10, 2))))
    val out = SchemaExport.sparkSchema(payload)
    assert(out.fieldNames.toSeq ===
      Seq("amount", "cdc_action", "cdc_ts", "uuid"))
    assert(out("amount").dataType === DecimalType(10, 2))
    assert(out("cdc_ts").dataType === TimestampType)
  }
}
