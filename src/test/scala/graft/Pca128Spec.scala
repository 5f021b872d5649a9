package graft

import graft.operators.SimilarityQueries

/** Pins the round-9 claim that the PCA/covariance moment pass scales in
  * DIMS: the pass is row-shaped (momentSums — explode + one hash
  * aggregate, constant plan size), so a 128-dim corpus must flow through
  * the same code path the 8-dim gate queries use. The previous form
  * spelled each moment as its own aggregate column — 8256 aggregate
  * expressions at 128 dims, ~295k at 768 — and could not have compiled
  * here. Values are cross-checked against a direct driver computation
  * (the Round4OperatorsSpec technique, generalized to 128 dims).
  */
class Pca128Spec extends SparkSuite {

  test("covariance moment pass compiles and is exact at 128 dims") {
    import spark.implicits._
    val dims = 128
    val n = 200
    // deterministic synthetic corpus with nontrivial cross-correlations
    val data: Seq[(Long, Array[Double])] = (0 until n).map { r =>
      (r.toLong, Array.tabulate(dims) { d =>
        (((r * 31 + d * 17) % 97) / 97.0 - 0.5) +
          ((r % 7) * (d % 5)) / 70.0
      })
    }
    val e = data.toDF("vec_id", "embedding")
    val got = SimilarityQueries.covarianceRows(e, dims)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got.size === dims * (dims + 1) / 2)
    // direct computation: identical quantization (HALF_UP at the moment
    // grain, floor at the output grain) and identical double-op order
    def q(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecs = data.map(_._2)
    val s = (0 until dims).map(i => vecs.map(v => q(v(i))).sum)
    for { i <- Seq(0, 1, 63, 127); j <- Seq(0, 1, 63, 127) if i <= j } {
      val p = vecs.map(v => q(v(i) * v(j))).sum
      val cov = p / (n.toDouble * 1e6) -
        (s(i) / (n.toDouble * 1e6)) * (s(j) / (n.toDouble * 1e6))
      val exp = math.floor(cov * 1e6) / 1e6
      assert(got((i, j)) === exp, s"cov($i,$j)")
    }
    // diagonal = variance — strictly positive on this corpus
    (0 until dims).foreach(i => assert(got((i, i)) > 0.0, s"var($i)"))
  }

  test("moment pass handles ragged/null embeddings like the column form") {
    import spark.implicits._
    // one full row, one short row (2 dims), one null — the count must see
    // all 3 rows; dims beyond a row's length simply don't contribute
    val e = Seq(
      (1L, Some(Array(0.5, 0.25, 0.125, 0.0625))),
      (2L, Some(Array(0.5, 0.25))),
      (3L, Option.empty[Array[Double]])
    ).toDF("vec_id", "embedding")
    val (n, sM, pM) = SimilarityQueries.collectMoments(e, 4)
    assert(n === 3L)
    // dim 0: both non-null rows contribute round(0.5e6) = 500000
    assert(sM(0) === Some(1000000L))
    // dim 3: only row 1 reaches it
    assert(sM(3) === Some(62500L))
    // (0,0): two rows contribute round(0.5·0.5·1e6) = 250000 each
    assert(pM(0, 0) === Some(500000L))
    // (0,3): only row 1 — round(0.5·0.0625·1e6) = 31250
    assert(pM(0, 3) === Some(31250L))
  }
}
