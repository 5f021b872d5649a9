package graft

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity.pageRank: the integer-micro-unit iteration must rank known
  * structure correctly, conserve rank mass up to bounded floor-division
  * loss, and be bitwise partitioning-invariant (the oracle reproduces it
  * single-node).
  */
class GraphRankSpec extends SparkSuite {
  import spark.implicits._

  private def ranks(nodes: DataFrame, edges: DataFrame,
      iters: Int): Map[Long, Long] =
    Similarity.pageRank(nodes, edges, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph: the hub out-ranks every spoke; spokes tie") {
    val nodes = (1L to 5L).toDF("vec_id")
    // spokes 2..5 all point at hub 1; hub points back at spoke 2
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val r = ranks(nodes, edges, 5)
    assert(r.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(r(1L) > r(2L), "hub must out-rank the reciprocated spoke")
    assert(r(2L) > r(3L), "reciprocated spoke must out-rank plain spokes")
    assert(r(3L) === r(4L) && r(4L) === r(5L), "symmetric spokes must tie")
  }

  test("rank mass is conserved up to bounded floor-division loss") {
    val nodes = (1L to 50L).toDF("vec_id")
    // ring + a chord; node 50 dangling (no out-edge)
    val edges = ((1L until 50L).map(i => (i, i + 1)) :+ (10L, 30L))
      .toDF("src", "dst")
    val total = Similarity.pageRank(nodes, edges, 5)
      .agg(sum("r")).collect()(0).getLong(0)
    // per iteration each node loses < 200 micro-units to the three floor
    // divisions (div deg, div nn, the two div 100 damping terms), plus
    // the initial 1e12 div nn remainder — a generous envelope
    val bound = 5L * 50L * 400L + 50L
    assert(total <= 1000000000000L)
    assert(total >= 1000000000000L - bound,
      s"lost ${1000000000000L - total} micro-units, bound $bound")
  }

  test("results are bitwise partitioning-invariant") {
    val nodes = (1L to 40L).toDF("vec_id")
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, i % 40 + 1), (i, (i * 7) % 40 + 1))).toDF("src", "dst")
    val base = ranks(nodes, edges, 4)
    val reparted = ranks(nodes.repartition(7), edges.repartition(5), 4)
    assert(base === reparted)
  }

  test("isolated nodes keep teleport rank; all-dangling graph is uniform") {
    val nodes = (1L to 4L).toDF("vec_id")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val r = ranks(nodes, noEdges, 3)
    // no out-edges anywhere: dangling redistribution keeps the
    // distribution exactly uniform at every step
    assert(r.values.toSet.size === 1, s"expected uniform ranks, got $r")
  }
}
