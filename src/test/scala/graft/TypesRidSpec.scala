package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypesRidSpec extends AnyFunSuite {

  test("mysql→spark mapping (bq_schema_from_mysql.py:54-88 parity, typed-up)") {
    assert(Types.mysqlToSpark("tinyint(1)") === ByteType)
    assert(Types.mysqlToSpark("INT") === IntegerType)
    assert(Types.mysqlToSpark("bigint(20) unsigned") === LongType)
    assert(Types.mysqlToSpark("decimal(10,2)") === DecimalType(10, 2))
    assert(Types.mysqlToSpark("double") === DoubleType)
    assert(Types.mysqlToSpark("varchar(255)") === StringType)
    assert(Types.mysqlToSpark("longblob") === BinaryType)
    assert(Types.mysqlToSpark("datetime") === TimestampType)
    assert(Types.mysqlToSpark("date") === DateType)
    assert(Types.mysqlToSpark("geometry") === StringType) // unknown fallback
  }

  test("mysql→bq mapping is exact reference parity (incl. lossy float)") {
    assert(Types.mysqlToBq("decimal(10,2)") === "float")
    assert(Types.mysqlToBq("bit(1)") === "integer")
    assert(Types.mysqlToBq("enum('a','b')") === "string")
    assert(Types.mysqlToBq("timestamp") === "timestamp")
    assert(Types.mysqlToBq("year") === "string")
    assert(Types.mysqlToBq("geometry") === "string")
  }

  test("rid: empty key fails like SaveIgnore (rcache.py:232-235)") {
    intercept[Rid.SaveIgnore](Rid.rid(Nil))
    assert(Rid.resolveKey("db.t", Seq("id"), Map.empty) === Seq("id"))
    assert(Rid.resolveKey("db.t", Nil, Map("db.t" -> Seq("uuid"))) === Seq("uuid"))
    intercept[Rid.SaveIgnore](Rid.resolveKey("db.t", Nil, Map.empty))
  }
}

class TypedViewSpec extends SparkSuite {
  test("typedView casts stringly payload to declared MySQL-mapped types") {
    import spark.implicits._
    val df = Seq(
      ("db.t", "1", Map("qty" -> "42", "price" -> "19.99", "note" -> "ok")))
      .toDF("table", "rid", "payload")
    val typed = Types.typedView(df,
      Seq("qty" -> "int(11)", "price" -> "decimal(6,2)", "note" -> "text"))
    assert(typed.columns.toSeq === Seq("table", "rid", "qty", "price", "note"))
    assert(typed.schema("qty").dataType === org.apache.spark.sql.types.IntegerType)
    assert(typed.schema("price").dataType ===
      org.apache.spark.sql.types.DecimalType(6, 2))
    val r = typed.head()
    assert(r.getInt(2) === 42)
    assert(r.getDecimal(3).toString === "19.99")
    // unparsable strings become null, not errors (drift tolerance)
    val bad = Types.typedView(
      Seq(("t", Map("qty" -> "not-a-number"))).toDF("table", "payload"),
      Seq("qty" -> "int"))
    assert(bad.head().isNullAt(1))
  }
}

class RidSparkSpec extends SparkSuite {
  test("composite rid = '&'.join(values) (rcache.py:190-191)") {
    import spark.implicits._
    val df = Seq((1, "x", 2.5)).toDF("a", "b", "c")
    val rid = df.select(Rid.rid(Seq("a", "b", "c"))).head().getString(0)
    assert(rid === "1&x&2.5")
  }
}
