package graft

import org.apache.spark.sql.types._

/** Canonical change-record model + MySQL→Spark type mapping.
  *
  * The reference pipeline is stringly typed end-to-end (values become strings
  * once stored as Redis hash fields, rcache.py:250) and its only typed surface
  * is the MySQL→BigQuery map used to emit load schemas
  * (bq_schema_from_mysql.py:54-88). We keep the same shape: a canonical
  * change-event schema whose payload is `map<string,string>` (schema-drift
  * tolerant, matches the Redis-hash reality), plus a type mapper that produces
  * *typed* per-table views — strictly richer than the reference's lossy
  * everything-to-string/float mapping.
  */
object Types {

  /** Canonical change event (FIXTURES.md §2).
    *
    * `seq` is the binlog-position analog (cdc.py:134 commits log_pos per
    * event): the reference gets deterministic merge order for free from
    * single-threaded arrival; after a Spark shuffle only an explicit monotone
    * sequence can restore it (SURVEY.md §7.3 risk 1).
    */
  final case class ChangeEvent(
      table: String,
      rid: String,
      cdc_action: String,
      cdc_ts: Long,
      seq: Long,
      payload: Map[String, String])

  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  /** Sentinel for "row annihilated" inside declarative folds; never emitted. */
  val None_ = "none"

  /** Canonical change-log schema (DataFrame form). */
  val changeEventSchema: StructType = StructType(Seq(
    StructField("table", StringType),
    StructField("rid", StringType),
    StructField("cdc_action", StringType),
    StructField("cdc_ts", LongType),
    StructField("seq", LongType),
    StructField("payload", MapType(StringType, StringType))))

  /** MySQL type name → Spark type. Mirrors the reference's declared mapping
    * (bq_schema_from_mysql.py:54-88) but keeps precision where the reference
    * is lossy (decimal→float there; DecimalType here). Unknown → StringType,
    * matching the reference's fallback (bq_schema_from_mysql.py:87-88).
    */
  def mysqlToSpark(mysqlType: String): DataType = {
    val t = mysqlType.toLowerCase.trim
    val base = t.takeWhile(c => c != '(' && c != ' ')
    base match {
      case "tinyint"                      => ByteType
      case "smallint"                     => ShortType
      case "mediumint" | "int" | "integer" => IntegerType
      case "bigint" | "bit"               => LongType
      case "decimal" | "numeric"          => parseDecimal(t)
      case "float"                        => FloatType
      case "double" | "real"              => DoubleType
      case "char" | "varchar" | "text" | "tinytext" | "mediumtext" |
           "longtext" | "enum" | "set"    => StringType
      case "binary" | "varbinary" | "blob" | "tinyblob" | "mediumblob" |
           "longblob"                     => BinaryType
      case "date"                         => DateType
      case "time"                         => StringType // time-of-day, no Spark type
      case "year"                         => IntegerType
      case "datetime" | "timestamp"       => TimestampType
      case _                              => StringType // fallback, bq_schema_from_mysql.py:87-88
    }
  }

  /** BigQuery type name for a MySQL type — exact parity with the reference's
    * `type_trans` table (bq_schema_from_mysql.py:54-88) for schema export.
    */
  def mysqlToBq(mysqlType: String): String = {
    val base = mysqlType.toLowerCase.trim.takeWhile(c => c != '(' && c != ' ')
    base match {
      case "tinyint" | "smallint" | "mediumint" | "int" | "integer" |
           "bigint" | "bit" => "integer"
      case "decimal" | "numeric" | "float" | "double" | "real" => "float"
      case "char" | "varchar" | "binary" | "varbinary" | "blob" | "tinyblob" |
           "mediumblob" | "longblob" | "text" | "tinytext" | "mediumtext" |
           "longtext" | "enum" | "set" => "string"
      case "date" | "time" | "year" => "string"
      case "datetime" | "timestamp" => "timestamp"
      case _ => "string"
    }
  }

  /** Typed per-table view over the stringly payload (SURVEY.md §1.3): casts
    * each `payload[col]` string to the Spark type of its declared MySQL
    * type. The core state stays `map<string,string>` (drift-tolerant, the
    * Redis-hash reality); typing happens only at the consumption edge.
    */
  def typedView(
      df: org.apache.spark.sql.DataFrame,
      mysqlCols: Seq[(String, String)],
      payloadCol: String = "payload"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val keep = df.columns.filterNot(_ == payloadCol).map(col).toSeq
    val typed = mysqlCols.map { case (name, mysqlType) =>
      // try_cast: malformed values become null instead of ANSI cast errors
      // (drift tolerance — a stringly cache can hold anything)
      expr(s"try_cast($payloadCol['$name'] AS ${mysqlToSpark(mysqlType).sql})")
        .as(name)
    }
    df.select(keep ++ typed: _*)
  }

  private def parseDecimal(t: String): DataType = {
    val m = """decimal\((\d+)\s*,\s*(\d+)\)""".r.findFirstMatchIn(t)
    m.map(g => DecimalType(g.group(1).toInt, g.group(2).toInt))
      .getOrElse(DecimalType(38, 18))
  }
}
