package graft

import org.apache.spark.sql.types.StructType

/** Warehouse schema export (A8/K7, bq_schema_from_mysql.py:94-158):
  * per-table column specs → JSON schema array, sorted by field name, with
  * the two CDC columns appended before sorting (bq_schema_from_mysql.py:
  * 155-157: cdc_action string, cdc_ts timestamp).
  */
object SchemaExport {

  final case class Field(name: String, `type`: String)

  /** BigQuery-style schema from MySQL column specs (name, mysql type). */
  def bqSchema(cols: Seq[(String, String)]): Seq[Field] = {
    val mapped = cols.map { case (n, t) => Field(n, Types.mysqlToBq(t)) }
    val withCdc = mapped ++ Seq(
      Field("cdc_action", "string"), Field("cdc_ts", "timestamp"))
    withCdc.sortBy(_.name)
  }

  /** JSON form (stable field order, no library dependency). */
  def bqSchemaJson(cols: Seq[(String, String)]): String =
    bqSchema(cols)
      .map(f => s"""{"name": "${f.name}", "type": "${f.`type`}"}""")
      .mkString("[", ", ", "]")

  /** Spark-native export: a table's StructType sorted by field name with
    * CDC columns appended — the typed analog of the reference's output.
    */
  def sparkSchema(payload: StructType): StructType = {
    import org.apache.spark.sql.types._
    val withCdc = payload
      .add("cdc_action", StringType)
      .add("cdc_ts", TimestampType)
    StructType(withCdc.fields.sortBy(_.name))
  }
}
