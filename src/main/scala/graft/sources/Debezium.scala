package graft.sources

import graft.Types
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-envelope change-stream adapter — the deploy-time source for the
  * CDC core (BASELINE.json: "Spark can read binlog via Debezium
  * connectors"). Takes a DataFrame with a JSON `value` column (Kafka topic
  * payload or file dump; batch or streaming — the parsing is identical) and
  * produces the canonical change-log frame
  * (table, rid, cdc_action, cdc_ts, seq, payload) consumed by Merge/CdcStream.
  *
  * Mapping to the reference semantics (cdc.py:60-74):
  * - op c/r → insert, u → update, d → delete (r = snapshot read ≙ insert)
  * - row image: `after` for c/r/u; `before` for d (the deleted row's values,
  *   like DeleteRowsEvent.values)
  * - cdc_ts: source.ts_ms/1000 (binlog header seconds, cdc.py:72)
  * - seq: binlog (file, pos) linearized — file index × 2⁴⁰ + pos — the
  *   monotone order the merge fold requires (SURVEY.md §7.3 risk 1)
  * - rid: per-table PK config, composite keys '&'-joined (rcache.py:186-193)
  */
object Debezium {

  /** Flattened Debezium MySQL envelope (payload-level fields). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("file", StringType),
      StructField("pos", LongType),
      StructField("ts_ms", LongType))))))

  /** `mysql-bin.000123` → 123 (rotate-aware file ordering, cdc.py:105-109). */
  private def fileIndex(file: Column): Column =
    coalesce(regexp_extract(file, "(\\d+)$", 1).cast("long"), lit(0L))

  /** Parse a JSON `value` column into the canonical change-log frame.
    *
    * @param raw   DataFrame with a string column `valueCol`
    * @param pkConf per-table primary/unique key config
    *               ("db.table" → key column names), the cdc_config.py:29-32
    *               analog; tables absent from the config are dropped like
    *               SaveIgnore'd rows (warn-and-skip, cdc.py:123-126)
    */
  def changeLog(
      raw: DataFrame,
      pkConf: Map[String, Seq[String]],
      valueCol: String = "value"): DataFrame = {
    val env = raw
      .select(from_json(col(valueCol), envelopeSchema).as("e"))
      .select(
        concat(col("e.source.db"), lit("."), col("e.source.table")).as("table"),
        when(col("e.op") === "d", lit(Types.Delete))
          .when(col("e.op") === "u", lit(Types.Update))
          .otherwise(lit(Types.Insert)).as("cdc_action"),
        (col("e.source.ts_ms") / 1000).cast("long").as("cdc_ts"),
        (shiftleft(fileIndex(col("e.source.file")), 40) + col("e.source.pos"))
          .as("seq"),
        when(col("e.op") === "d", col("e.before"))
          .otherwise(col("e.after")).as("payload"))

    // rid via per-table key config: CASE chain over configured tables;
    // unconfigured tables → null rid → filtered (SaveIgnore warn+skip)
    val ridExpr = pkConf.foldLeft(lit(null).cast("string")) {
      case (acc, (table, keys)) =>
        when(col("table") === table,
          concat_ws("&", keys.map(k => col("payload").getItem(k)): _*))
          .otherwise(acc)
    }
    env.withColumn("rid", ridExpr)
      .filter(col("rid").isNotNull)
      .select("table", "rid", "cdc_action", "cdc_ts", "seq", "payload")
  }

  /** The deployment composition: Debezium topic on Kafka → canonical
    * changelog stream. `readStream.format("kafka")` resolves the connector
    * at RUNTIME (spark-sql-kafka on the cluster classpath); this sandbox has
    * no broker, so the line is compiled-not-run here — `DebeziumSpec` drives
    * the identical value-column contract through a MemoryStream[String]
    * instead (one string `value` column, exactly what the Kafka row's
    * `CAST(value AS STRING)` yields), so everything downstream of the
    * source swap is exercised end-to-end including checkpoint restart.
    *
    * Scale notes: one Spark input partition per Kafka topic partition —
    * provision topic partitions ≥ desired parallelism; offsets live in the
    * query checkpoint (the S2/K6 bootstrap analog, cdc.py:80-82), so
    * `startingOffsets` only seeds the FIRST run.
    */
  def fromKafka(spark: SparkSession, servers: String, topic: String,
      pkConf: Map[String, Seq[String]],
      startingOffsets: String = "earliest"): DataFrame = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      // bound a catch-up surge so the first micro-batches after downtime
      // don't balloon state-store commits
      .option("maxOffsetsPerTrigger", "10000000")
      .load()
      .select(col("value").cast("string").as("value"))
    changeLog(raw, pkConf)
  }
}
