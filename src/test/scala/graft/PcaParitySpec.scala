package graft

import graft.Materialize.Ops
import org.apache.spark.sql.functions._

/** Pins the emb_pca refactor: the driver-side trace-normalized squaring
  * chain must be BITWISE identical to the original in-plan expression
  * form (reconstructed here), because the same IEEE double ops run in the
  * same association order. If this spec ever fails, the driver-side
  * arithmetic has drifted from the documented association order and the
  * DuckDB oracle (which mirrors that order) will hash-mismatch too.
  */
class PcaParitySpec extends SparkSuite {

  test("driver-side eigensolve ≡ in-plan squaring chain, bitwise") {
    val dims = 8; val squarings = 7
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // ---- the ORIGINAL in-plan chain (as shipped through round 7) ----
    val v = col("embedding").cast("array<double>")
    val base = e.select((0 until dims).map(i => v.getItem(i).as(s"x$i")): _*)
    val pairs = for { i <- 0 until dims; j <- i until dims } yield (i, j)
    val aggs = Seq(count(lit(1)).as("n")) ++
      (0 until dims).map(i =>
        sum(round(col(s"x$i") * 1e6, 0).cast("long")).as(s"s$i")) ++
      pairs.map { case (i, j) =>
        sum(round(col(s"x$i") * col(s"x$j") * 1e6, 0).cast("long"))
          .as(s"p${i}_$j") }
    def mean(i: Int) = col(s"s$i").cast("double") / (col("n") * lit(1e6))
    // r8: cov/means quantize through tie-free floorAt (see Quant); the
    // in-plan mirror must apply the identical quantization
    def covExpr(i: Int, j: Int) = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      graft.operators.Quant.floorAt(
        col(s"p${a}_$b").cast("double") / (col("n") * lit(1e6))
          - mean(a) * mean(b), 6)
    }
    val ij = for { i <- 0 until dims; j <- 0 until dims } yield (i, j)
    val keep = ij.map { case (i, j) => col(s"c${i}_$j") } ++
      (0 until dims).map(i => col(s"m$i"))
    var st = base.agg(aggs.head, aggs.tail: _*)
      .select(ij.map { case (i, j) => covExpr(i, j).as(s"c${i}_$j") } ++
        (0 until dims).map(i =>
          graft.operators.Quant.floorAt(mean(i), 6).as(s"m$i")): _*)
      .select(col("*") +:
        ij.map { case (i, j) => col(s"c${i}_$j").as(s"b${i}_$j") }: _*)
      .materialize()
    for (_ <- 0 until squarings) {
      val sq = st.select(keep ++ ij.map { case (i, j) =>
        (0 until dims).map(k => col(s"b${i}_$k") * col(s"b${k}_$j"))
          .reduce(_ + _).as(s"s${i}_$j") }: _*)
      val tr2 = nullif((0 until dims)
        .map(i => col(s"s${i}_$i")).reduce(_ + _), lit(0.0))
      st = sq.select(keep ++ ij.map { case (i, j) =>
        (col(s"s${i}_$j") / tr2).as(s"b${i}_$j") }: _*)
        .materialize()
    }
    val ys = st.select(keep ++ (0 until dims).map(i =>
      (0 until dims).map(j => col(s"b${i}_$j")).reduce(_ + _)
        .as(s"y$i")): _*)
    val nrm = nullif(sqrt((0 until dims)
      .map(i => col(s"y$i") * col(s"y$i")).reduce(_ + _)), lit(0.0))
    val inPlan = ys.select((0 until dims).map(i =>
      round(col(s"y$i") / nrm, 6).as(s"v$i")): _*).head()
    // ---- the shipped query (driver-side chain) ----
    val got = SparkEntry.queries("emb_pca")(spark, sf0001)
      .orderBy("dim").collect()
    assert(got.length === dims)
    for (i <- 0 until dims) {
      val want = inPlan.getDouble(i)
      val have = got(i).getDouble(1) // loading column
      assert(java.lang.Double.doubleToLongBits(want) ===
        java.lang.Double.doubleToLongBits(have),
        s"loading $i drifted: in-plan $want vs driver-side $have")
    }
  }
}
