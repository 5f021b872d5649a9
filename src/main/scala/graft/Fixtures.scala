package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Fixture-schema contract + tripwire (FIXTURES.md §1).
  *
  * Round 7 lost 20 gate queries to a silent fixture regeneration
  * (`events.ts` flipped timestamp[ns] → timestamp[us] between the last
  * local run and the driver gate). This is the loud alarm for that class
  * of breakage: the resolved schema of every input table is asserted
  * against the contract below, and any drift is reported naming the exact
  * table.column, its resolved type, and what the contract wants.
  *
  * Two consumers: `FixtureContractSpec` (hard test failure) and the first
  * lines of `Verify.main` (stderr banner in the gate log, non-fatal — the
  * type-robust readers may still produce green results, and a gate run
  * should produce per-query evidence rather than die at the door).
  */
object Fixtures {

  /** One column's contract: acceptable RESOLVED Spark types. Nullability is
    * not part of the contract (parquet round-trips it inconsistently).
    */
  final case class Col(name: String, ok: DataType => Boolean, want: String)

  private def exact(dt: DataType) =
    Col(_: String, (d: DataType) => d == dt, dt.simpleString)
  private def i32(n: String) = exact(IntegerType)(n)
  private def i64(n: String) = exact(LongType)(n)
  private def str(n: String) = exact(StringType)(n)
  private def dbl(n: String) = exact(DoubleType)(n)

  /** Any timestamp representation our readers normalize: micro/milli
    * timestamp (tz or ntz), or raw epoch-nanos long (a timestamp[ns] file
    * read under nanosAsLong). Matches CdcBatch.normalizeTs's accepted set.
    */
  private def eventTime(n: String) = Col(n, {
    case LongType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }, "timestamp | timestamp_ntz | long (epoch nanos)")

  private def floatArray(n: String) = Col(n, {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }, "array<float> | array<double>")

  /** Table → required columns (extra columns are allowed — additive fixture
    * changes must not trip the wire).
    */
  val tables: Map[String, Seq[Col]] = Map(
    "region" -> Seq(i32("r_regionkey"), str("r_name")),
    "nation" -> Seq(i32("n_nationkey"), str("n_name"), i32("n_regionkey")),
    "customer" -> Seq(i64("c_custkey"), str("c_name"), i32("c_nationkey"),
      dbl("c_acctbal"), str("c_mktsegment")),
    "supplier" -> Seq(i64("s_suppkey"), str("s_name"), i32("s_nationkey"),
      dbl("s_acctbal")),
    "part" -> Seq(i64("p_partkey"), str("p_name"), str("p_brand"),
      str("p_type"), i32("p_size"), dbl("p_retailprice")),
    "orders" -> Seq(i64("o_orderkey"), i64("o_custkey"), str("o_orderstatus"),
      dbl("o_totalprice"), eventTime("o_orderdate")),
    "lineitem" -> Seq(i64("l_orderkey"), i64("l_partkey"), i64("l_suppkey"),
      i32("l_linenumber"), dbl("l_quantity"), dbl("l_extendedprice"),
      dbl("l_discount"), dbl("l_tax"), str("l_returnflag"),
      str("l_linestatus"), eventTime("l_shipdate")),
    "events" -> Seq(i64("event_id"), eventTime("ts"), i64("user_id"),
      str("event_type"), dbl("value"), str("props")),
    "documents" -> Seq(i64("doc_id"), str("text"), str("lang"),
      str("source"), i64("n_chars")),
    "embeddings" -> Seq(i64("vec_id"), floatArray("embedding"),
      i32("label")))

  /** Drift report over every fixture table in `sfDir`: one line per
    * missing column / type mismatch / unreadable table, naming the exact
    * drift. Empty = the fixture conforms.
    */
  def drift(spark: SparkSession, sfDir: String): Seq[String] = {
    // lets a timestamp[ns] events file resolve (as long) instead of erroring
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val resolved =
        try Right(spark.read.parquet(s"$sfDir/$table.parquet").schema)
        catch { case scala.util.control.NonFatal(e) => Left(e) }
      resolved match {
        case Left(e) => Seq(s"$table: unreadable: ${e.getMessage}")
        case Right(schema) =>
          val byName = schema.fields.map(f => f.name -> f.dataType).toMap
          cols.flatMap { c =>
            byName.get(c.name) match {
              case None =>
                Some(s"$table.${c.name}: MISSING (contract: ${c.want}); " +
                  s"present: ${schema.fieldNames.mkString(", ")}")
              case Some(dt) if !c.ok(dt) =>
                Some(s"$table.${c.name}: resolved ${dt.simpleString}, " +
                  s"contract wants ${c.want}")
              case _ => None
            }
          }
      }
    }
  }
}
