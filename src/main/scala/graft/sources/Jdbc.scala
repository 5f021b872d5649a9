package graft.sources

import graft.Types
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S9/S10: MySQL catalog access over JDBC — the Spark shape of the
  * reference's `information_schema.columns` scan and `SHOW TABLES`
  * (bq_schema_from_mysql.py:90-92, 150-152).
  *
  * Needs a live MySQL endpoint, so only the query construction and the
  * type-mapping projection are unit-testable in this environment; the read
  * itself is the stock JDBC source (predicate pushdown of the schema/table
  * filters happens server-side via the pushed-down WHERE, exactly like the
  * reference's SQL).
  */
object Jdbc {

  /** The information_schema scan, filters pushed into the dbtable subquery. */
  def columnsQuery(db: String, tables: Seq[String]): String = {
    val inList = tables.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val tableFilter =
      if (tables.isEmpty) "" else s" AND table_name IN ($inList)"
    "(SELECT table_name, column_name, data_type, ordinal_position" +
      s" FROM information_schema.columns WHERE table_schema = '$db'$tableFilter) t"
  }

  /** S9: per-table column specs from a live MySQL. */
  def readColumns(spark: SparkSession, url: String, db: String,
      tables: Seq[String], props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, columnsQuery(db, tables), props)

  /** S10: table listing via JDBC catalog metadata. */
  def listTablesQuery(db: String): String =
    s"(SELECT table_name FROM information_schema.tables" +
      s" WHERE table_schema = '${db.replace("'", "''")}') t"

  /** A8-shape: collected column specs → per-table Spark schemas (typed,
    * via Types.mysqlToSpark) sorted by column name.
    */
  def tableSchemas(cols: Seq[(String, String, String)]): Map[String, StructType] =
    cols.groupBy(_._1).map { case (table, cs) =>
      table -> StructType(
        cs.sortBy(_._2).map { case (_, name, mysqlType) =>
          org.apache.spark.sql.types.StructField(
            name, Types.mysqlToSpark(mysqlType))
        })
    }
}
