// Lives under org.apache.spark.sql for catalyst internals (Expression,
// TypedImperativeAggregate, ExternalCatalogUtils), like the other graft
// expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-partition-dir digest aggregate for the lake's IN-WRITE digest
  * (optimization guide §6: one pass instead of write + full read-back):
  * observed ON the publish's write job, it folds every written row into
  * `dir-rel-path → (row count, bit_xor(row hash))` — exactly the entries
  * `Lake.writeDigest`'s read-back scan derives, so the digest costs zero
  * extra jobs and zero re-read of the written bytes.
  *
  * The rel key is rendered from the row's PARTITION VALUES with the same
  * functions the parquet writer itself uses to name the dir —
  * `ExternalCatalogUtils.getPartitionPathString` over the value's string
  * form (`Cast(v, string)` for the supported types is plain `toString`),
  * null/empty → `__HIVE_DEFAULT_PARTITION__` — so the keys match the
  * physical dir names byte-for-byte. Callers RESTRICT the in-write path
  * to string/integral/boolean partition columns (timestamp/date/decimal
  * renderings carry timezone/format subtleties) and fall back to the
  * read-back scan otherwise; a key that somehow failed to match a dir
  * name only costs a digest-lookup miss (a full diff — the safe
  * direction), never a wrong skip, because cross-generation comparisons
  * go through the feed's OWN dir listing.
  *
  * Children: the partition value expressions (in partitionCols order)
  * followed by the row-hash expression. Hash inputs are xxhash64 outputs
  * — never null. Output: map<string, struct<n: long, x: long>>, keys
  * sorted for determinism.
  */
case class DigestMapAgg(
    children: Seq[Expression],
    partNames: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {

  require(children.length == partNames.length + 1,
    "DigestMapAgg: children = partition value exprs + the row-hash expr")

  private def partExprs: Seq[Expression] = children.dropRight(1)
  private def hashExpr: Expression = children.last

  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType,
    StructType(Seq(StructField("n", LongType, nullable = false),
      StructField("x", LongType, nullable = false))),
    valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  /** The writer's value rendering for the supported types: Cast(v,
    * string) ≡ toString. Unsupported types must be rejected by the
    * caller (supportedPartType), not rendered approximately here.
    */
  private def render(v: Any): String = v match {
    case null => null
    case s: UTF8String => s.toString
    case other => other.toString // Int/Long/Short/Byte/Boolean
  }

  override def update(buffer: java.util.HashMap[String, Array[Long]],
      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < partExprs.length) {
      if (i > 0) sb.append('/')
      sb.append(ExternalCatalogUtils.getPartitionPathString(
        partNames(i), render(partExprs(i).eval(input))))
      i += 1
    }
    val h = hashExpr.eval(input).asInstanceOf[Long]
    val arr = buffer.computeIfAbsent(sb.toString, _ => new Array[Long](2))
    arr(0) += 1L
    arr(1) ^= h
    buffer
  }

  override def merge(b1: java.util.HashMap[String, Array[Long]],
      b2: java.util.HashMap[String, Array[Long]])
      : java.util.HashMap[String, Array[Long]] = {
    b2.forEach { (k, v) =>
      val arr = b1.computeIfAbsent(k, _ => new Array[Long](2))
      arr(0) += v(0)
      arr(1) ^= v(1)
    }
    b1
  }

  override def eval(buffer: java.util.HashMap[String, Array[Long]]): Any = {
    val keys = new java.util.ArrayList[String](buffer.keySet())
    java.util.Collections.sort(keys)
    val ks = new Array[Any](keys.size)
    val vs = new Array[Any](keys.size)
    var i = 0
    while (i < keys.size) {
      val k = keys.get(i)
      val v = buffer.get(k)
      ks(i) = UTF8String.fromString(k)
      vs(i) = InternalRow(v(0), v(1))
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  override def serialize(buffer: java.util.HashMap[String, Array[Long]])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size())
    buffer.forEach { (k, v) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(v(0))
      out.writeLong(v(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, Array[Long]] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      m.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        Array(in.readLong(), in.readLong()))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DigestMapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DigestMapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DigestMapAgg =
    copy(children = newChildren)
}

object DigestMapAgg {
  /** Partition column types whose dir-name rendering is exactly
    * `toString` (== Cast to string) — the in-write digest's support set;
    * anything else falls back to the read-back digest scan.
    */
  def supportedPartType(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         BooleanType => true
    case _ => false
  }

  /** The aggregate as a Column (for `Dataset.observe`): partition value
    * columns in partitionCols order + the row-hash column.
    */
  def column(partCols: Seq[org.apache.spark.sql.Column],
      partNames: Seq[String],
      rowHash: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.classic.ExpressionUtils
    ExpressionUtils.column(DigestMapAgg(
      partCols.map(ExpressionUtils.expression) :+
        ExpressionUtils.expression(rowHash),
      partNames).toAggregateExpression())
  }
}
