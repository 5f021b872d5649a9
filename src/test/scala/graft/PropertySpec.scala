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

  test("bigram regex scan matches code-point sliding windows on random unicode") {
    // the text_lm_score scan — (?s)(?![\uDC00-\uDFFF])(?=(..)) — must
    // emit exactly the code-point bigrams substr(i, 2) defines, for any
    // input. Reference: JVM codePoints sliding windows. Pool mixes
    // ASCII, whitespace/newlines ((?s) must cross them), multi-byte BMP,
    // CJK, and non-BMP emoji (surrogate pairs — the lookahead must skip
    // the mid-pair position).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pool: IndexedSeq[Int] =
      ("ab zé的\n\t" .codePoints().toArray.toIndexedSeq) ++
        IndexedSeq(0x1F600, 0x1F680, 0x10348)
    val rnd = new Random(11)
    val docs = (0 until 400).map { i =>
      val n = rnd.nextInt(12)
      val cps = Array.fill(n)(pool(rnd.nextInt(pool.length)))
      (i.toLong, new String(cps, 0, cps.length))
    }
    def expected(s: String): Seq[String] = {
      val cps = s.codePoints().toArray
      cps.sliding(2).filter(_.length == 2)
        .map(w => new String(w, 0, 2)).toSeq
    }
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), regexp_extract_all(col("text"),
        lit("(?s)(?![\\uDC00-\\uDFFF])(?=(..))"), lit(1)).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, text) <- docs)
      assert(got(id) === expected(text),
        s"doc $id: ${text.map(c => f"\\u${c.toInt}%04x").mkString}")
  }

  test("repeated-span stats and apply agree on every doc (real fixture)") {
    import graft.operators.TextDedup
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").limit(200)
      // make repeats certain: re-append every 15th doc under high ids
      .localCheckpoint()
    val fixture = docs.union(docs.filter(col("doc_id") % 15 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text")))
    val st = TextDedup.repeatedSpanStats(fixture, "doc_id", "text")
    val ap = TextDedup.removeRepeatedSpans(fixture, "doc_id", "text")
    val j = st.join(ap, "doc_id")
    assert(j.count() === fixture.count(), "both forms cover every doc")
    // per-doc identities that must hold regardless of data:
    //   kept + repeated = total;  spans <= hit grams;  repeated <= total;
    //   a span covers >= n tokens unless clipped by doc start/end overlap
    val bad = j.filter(
      col("n_tokens_kept") + col("n_repeated_tokens") =!= col("n_tokens") ||
      col("n_spans") > col("n_hit_grams") ||
      col("n_repeated_tokens") > col("n_tokens") ||
      (col("n_spans") > 0 && col("n_repeated_tokens") < lit(8)))
    assert(bad.count() === 0, bad.collect().take(5).mkString("\n"))
    // the planted full-copy docs must be flagged ~fully repeated
    val copies = st.filter(col("doc_id") >= 900000L)
    assert(copies.count() > 0)
    assert(copies.filter(col("n_repeated_tokens") === 0).count() === 0,
      "full duplicates must have repeated coverage")
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

  test("additive-chain classifier matches the pairwise-comparable " +
    "definition on random fingerprint sets") {
    val rnd = new Random(13)
    val fields = ('a' to 'h').map(_.toString)
    def randFp(): Set[String] = fields.filter(_ => rnd.nextBoolean()).toSet
    for (_ <- 1 to 4000) {
      val sets = Vector.fill(1 + rnd.nextInt(4))(randFp())
      // ground truth: ADDITIVE drift = every pair of schema versions is
      // comparable under inclusion (one is a prefix of the other's life)
      val want = sets.forall(a =>
        sets.forall(b => a.subsetOf(b) || b.subsetOf(a)))
      // order- and formatting-independence: shuffled list, shuffled field
      // order inside each fingerprint, duplicates allowed
      val fps = rnd.shuffle(sets ++ sets.take(rnd.nextInt(sets.size + 1)))
        .map(s => rnd.shuffle(s.toSeq).mkString(","))
      assert(Evolve.isAdditiveChain(fps) === want,
        s"sets=$sets fps=$fps want=$want")
    }
    // degenerate shapes
    assert(Evolve.isAdditiveChain(Seq.empty))
    assert(Evolve.isAdditiveChain(Seq("")))      // zero-field version
    assert(Evolve.isAdditiveChain(Seq("", "a"))) // ∅ ⊆ {a}
  }
}
