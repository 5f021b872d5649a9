// Lives under org.apache.spark.sql for the private[sql] bridges
// (Dataset.ofRows, ExpressionUtils) — standard third-party plan packaging.
package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §7.2 preference (c)): per-key
  * top-k without sorting whole key groups.
  *
  * The DataFrame idiom — `row_number().over(Window.partitionBy(keys)
  * .orderBy(ord)) <= k` — must SORT every key group in full (O(n log n)
  * per group, full materialization under memory pressure) to rank rows it
  * then throws away. This operator keeps a bounded k-element heap per key:
  * O(n log k) time and O(keys × k) memory per partition, no sort spill.
  * At 100 TB per-key group sizes are exactly where window sorts hurt.
  *
  * Physical contract: requires `ClusteredDistribution(keys)` — Spark's
  * EnsureRequirements inserts the single hash exchange; the heap pass then
  * runs once per post-shuffle partition. (A map-side partial heap pass
  * would compose the same way TakeOrderedAndProject does; omitted for
  * clarity.)
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // BaseOrdering: row "less than" = ranks earlier under the SortOrder
      val ord = RowOrdering.create(orderLocal, childOutput)
      // max-heap (worst-ranked on top) of the k best rows per key
      implicit val heapOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => ord.compare(a, b)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val u = row.asInstanceOf[UnsafeRow]
        val pq = heaps.getOrElseUpdate(
          keyProj(u).copy(), mutable.PriorityQueue.empty[UnsafeRow])
        if (pq.size < kLocal) pq.enqueue(u.copy())
        else if (ord.compare(u, pq.head) < 0) { pq.dequeue(); pq.enqueue(u.copy()) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Per-key top-k rows of `df` under `orderBy` (col name, descending?).
    * Registers TopKStrategy on the session (idempotent).
    */
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${lp.output.map(_.name)}"))
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      TopKPerKeyNode(keyCols.map(attr), order, k, lp))
  }
}
