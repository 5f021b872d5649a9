package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Tie-free output quantization for rational scores.
  *
  * `round(x, d)` is a cross-engine hash hazard when x's EXACT value is a
  * small-denominator rational (an integer ratio like jaccard = i/union,
  * or a product of already-quantized rationals): the value can land
  * EXACTLY on a .5 tie at the output grain (this happens whenever the
  * reduced denominator is 2^(d+1)·5^j — e.g. a 128-token doc), and the
  * engines break ties differently — Spark's round is HALF_UP while
  * DuckDB rounds through IEEE nearbyint (half-even). text_dsir hit a
  * real one at sf0.001 (round 8): -0.0079125 exactly, Spark -0.007913
  * vs oracle -0.007912.
  *
  * `floor` has no ties: both engines evaluate the same correctly-rounded
  * IEEE ops in the same order, producing the bit-identical double, and
  * floor of an identical double is identical. At 10^-6 grain the
  * truncation-vs-rounding difference is semantically nil for scores.
  * The SQL mirror is `floor((x) * 10^d) / 10^d.0` with the SAME
  * evaluation order (value first, then the scale multiply).
  *
  * Expressions whose exact value has an astronomically large denominator
  * (anything through log/sqrt/cosine, or inexact literals like 2.2) keep
  * plain `round` — a tie there needs ~2^-40 luck, and round matches the
  * reference semantics more naturally.
  */
object Quant {
  def floorAt(x: Column, d: Int): Column = {
    val p = math.pow(10, d)
    floor(x * lit(p)) / lit(p)
  }

  /** Driver-side mirror of [[floorAt]], op for op: Spark's `floor` on a
    * double is math.floor then a cast to LONG, and the divide promotes
    * that long back to double — so a driver-side computation that must be
    * bitwise equal to an in-plan floorAt (the PCA moment assembly) has to
    * replicate exactly that sequence, not just `math.floor(x*p)/p`.
    */
  def floorAtD(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    math.floor(x * p).toLong / p
  }
}
