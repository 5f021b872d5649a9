package graft

import graft.operators.{Similarity, TextDedup}
import scala.util.Random

/** Property-style checks (seeded random sampling, same pattern as
  * CompactSpec) for the engine's algebraic building blocks — the
  * invariants the distributed implementations lean on.
  */
class PropertySpec extends SparkSuite {

  private def hamming(a: String, b: String): Int = {
    import org.apache.spark.sql.graft.HammingDistance
    import org.apache.spark.sql.catalyst.expressions.Literal
    HammingDistance(Literal(a), Literal(b)).eval(null).asInstanceOf[Int]
  }

  test("HammingDistance is a metric on equal-length strings") {
    val rnd = new Random(7)
    def bits(n: Int): String =
      Seq.fill(n)(if (rnd.nextBoolean()) '1' else '0').mkString
    for (_ <- 1 to 2000) {
      val n = rnd.nextInt(25)
      val (a, b, c) = (bits(n), bits(n), bits(n))
      assert(hamming(a, a) === 0)                            // identity
      assert(hamming(a, b) === hamming(b, a))                // symmetry
      assert(hamming(a, c) <= hamming(a, b) + hamming(b, c)) // triangle
      if (hamming(a, b) == 0) assert(a === b)                // separation
    }
  }

  test("merge fold is prefix-decomposable (the streaming-state invariant)") {
    val rnd = new Random(42)
    val acts = Vector(Types.Insert, Types.Update, Types.Delete)
    for (_ <- 1 to 2000) {
      val pre = Vector.fill(rnd.nextInt(10))(acts(rnd.nextInt(3)))
      val suf = Vector.fill(rnd.nextInt(10))(acts(rnd.nextInt(3)))
      val whole = Merge.foldActions(pre ++ suf)
      val stepwise = suf.foldLeft(Merge.foldActions(pre))(Merge.mergeAction)
      assert(whole === stepwise, s"pre=$pre suf=$suf")
    }
  }

  test("minhash permutation constants stay in the field and spread") {
    for (i <- 0 until 64) {
      assert(TextDedup.minhashA(i) > 0 && TextDedup.minhashA(i) < TextDedup.MinhashP)
      assert(TextDedup.minhashB(i) >= 0 && TextDedup.minhashB(i) < TextDedup.MinhashP)
    }
    assert((0 until 64).map(TextDedup.minhashA).distinct.length === 64)
  }

  test("rp hyperplane weights are deterministic, bounded, non-degenerate") {
    for (j <- 0 until 16) {
      val ws = (0 until 64).map(d => Similarity.rpWeight(j, d))
      assert(ws.forall(w => w >= -1.0 && w <= 1.0))
      assert(ws === (0 until 64).map(d => Similarity.rpWeight(j, d)))
      // every hyperplane has both positive and negative components
      assert(ws.exists(_ > 0) && ws.exists(_ < 0))
    }
  }
}
