package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators (SURVEY.md §2.10 X4): language identification,
  * quality scoring, token counting, and winnowing document fingerprints.
  * All are narrow per-row expression work — no shuffle until the final
  * aggregation, so they scale linearly with input splits.
  */
object TextAnalysis {

  /** Per-language stopword/marker profiles for the n-gram-heuristic
    * language identifier. Real-world lists (most-frequent function words);
    * scoring = occurrence count of each language's markers.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "des", "et"),
    "zh" -> Seq("的", "是", "了"))

  /** Score columns (s_en, s_de, ...) = marker occurrence counts. */
  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, ms) =>
      l -> size(filter(toks, t => t.isin(ms: _*)))
    }

  /** Predicted language: max marker score, ties resolved in fixed order
    * (en > de > es > fr > zh); all-zero → 'unknown'. Deterministic by
    * construction so the SQL oracle can reproduce it with a CASE chain.
    */
  def predictedLang(toks: Column): Column = {
    val s = langScores(toks).toMap
    val Seq(en, de, es, fr, zh) = Seq("en", "de", "es", "fr", "zh").map(s)
    when(en === 0 && de === 0 && es === 0 && fr === 0 && zh === 0, lit("unknown"))
      .when(en >= greatest(de, es, fr, zh), lit("en"))
      .when(de >= greatest(es, fr, zh), lit("de"))
      .when(es >= greatest(fr, zh), lit("es"))
      .when(fr >= zh, lit("fr"))
      .otherwise(lit("zh"))
  }

  /** One (id, h) row per word n-gram occurrence of each document — the
    * shared fingerprint/candidate primitive behind benchmark
    * decontamination (text_decontam), the duplicated-n-gram boilerplate
    * score (text_dup_ngrams), and containment candidates
    * (dedup_containment).
    *
    * The gram identity `h` is a 128-bit struct built WITHOUT
    * materializing gram strings: each token is hashed ONCE into two
    * independently-salted xxhash64 arrays, then each gram combines its
    * n consecutive token hashes with one n-ary xxhash64 per half. The
    * previous form md5'd a `concat_ws` gram string per position — every
    * token's bytes copied n times, plus a 32-char hex shuffle key; on
    * the 10× scale-smoke corpus the gram-histogram pass measured 36 s
    * string-md5 vs 5.5 s this form (6.5×) with identical distinct-gram
    * counts. A false gram match now requires a simultaneous collision in
    * both salted token-hash streams; with the salt hashed FIRST (so the
    * second stream runs under an independent effective seed — see the
    * inline comment) the two streams are independent and the pair is
    * 2⁻¹²⁸-grade, the md5 guarantee — and the hashes stay internal: every
    * consumer
    * outputs counts/ratios only, so the DuckDB oracles (which md5 their
    * own gram strings) compare equal.
    *
    * Binding the token-hash arrays to COLUMNS in a first projection is
    * load-bearing: referencing the `transform` expression inline would
    * re-evaluate the whole array for every `element_at` and turn the
    * scan quadratic (measured: the inline form never finished the smoke
    * corpus the two-step form does in 5.5 s). Docs shorter than `n`
    * tokens contribute no rows (sequence() step-down guard — see
    * winnowFingerprint).
    */
  def explodedWordGrams(df: org.apache.spark.sql.DataFrame, idCol: String,
      text: Column, n: Int): org.apache.spark.sql.DataFrame = {
    // tokens bound first so the two salted hash passes read one split
    val hashed = df
      .select(col(idCol), TextDedup.tokens(text).as("_t"))
      .select(col(idCol),
        transform(col("_t"), w => xxhash64(w)).as("_th1"),
        // salt FIRST: multi-arg xxhash64 folds left-to-right with the
        // running hash as seed, so hash(salt, w) evaluates w under the
        // effective seed hash(salt, 42) — a genuinely different hash
        // function from stream 1. The reversed order hash(w, salt) would
        // make _th2 a deterministic function of _th1 (token collisions
        // propagate to both halves, collapsing the pair to 64-bit grade).
        transform(col("_t"),
          w => xxhash64(lit(0x9E3779B97F4A7C15L), w)).as("_th2"))
    val th1 = col("_th1")
    val th2 = col("_th2")
    def half(th: Column, i: Column) =
      xxhash64((0 until n).map(k => element_at(th, i + lit(k))): _*)
    val grams = when(size(th1) >= n,
      transform(sequence(lit(1), size(th1) - (n - 1)),
        i => struct(half(th1, i).as("h1"), half(th2, i).as("h2"))))
      .otherwise(array().cast("array<struct<h1:bigint,h2:bigint>>"))
    hashed.select(col(idCol), explode(grams).as("h"))
  }

  /** Winnowing fingerprint (k-gram rolling hash + min-per-window):
    * word 3-gram md5-prefix hashes, window of 4, distinct kept minima,
    * fingerprint = md5 of the sorted kept set. Standard document
    * fingerprinting (Schleimer et al., SIGMOD'03) in pure expressions.
    *
    * Column form: the repeated array subtrees (`t` under each
    * `element_at`, `kgrams` under each window `slice`) stay linear only
    * because the evaluator reuses the common subexpression — measured
    * equal to the bound form at the 10× smoke corpus (~0.2 s both), but
    * the same inline-reference shape DID evaluate quadratically in the
    * explodedWordGrams case, so the reuse is evaluation-path-dependent,
    * not guaranteed. The gate/production path is [[winnowFingerprints]],
    * which binds each intermediate to a projected column and does not
    * depend on it.
    */
  def winnowFingerprint(text: Column): Column = {
    val t = TextDedup.tokens(text)
    // guards: sequence(1, n) steps DOWN when n < 1 (yielding [1, 0] and an
    // index-0 error) — docs too short for a 3-gram (< 3 tokens) or for a
    // 4-window (< 6 tokens) keep an empty set, matching the oracle's empty
    // generate_series
    val kgrams = kgramsOf(t)
    val kept = keptOf(kgrams)
    struct(
      substring(md5(concat_ws("", kept)), 1, 16).as("fp"),
      size(kept).as("n_kept"))
  }

  private def kgramsOf(t: Column): Column =
    when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2), i =>
        substring(
          md5(concat_ws(" ",
            element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))),
          1, 8))).otherwise(array().cast("array<string>"))

  private def keptOf(kgrams: Column): Column =
    sort_array(array_distinct(
      when(size(kgrams) >= 4,
        transform(sequence(lit(1), size(kgrams) - 3), p =>
          array_min(slice(kgrams, p, lit(4)))))
        .otherwise(array().cast("array<string>"))))

  /** Winnowing over a whole table with each intermediate array (tokens,
    * gram hashes, kept minima) BOUND to a column in its own projection
    * before the next positional lambda reads it — the
    * [[explodedWordGrams]] discipline. Identical values to
    * [[winnowFingerprint]] (same expressions; equivalence spec-pinned):
    * binding makes the linear scan STRUCTURAL instead of relying on the
    * evaluator reusing an inline subtree per element access — reuse that
    * measurably did not happen for the same shape in explodedWordGrams.
    *
    * Output: the input's `idCol` plus `w` = struct(fp, n_kept).
    */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame, idCol: String,
      text: Column): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), TextDedup.tokens(text).as("_t"))
      .select(col(idCol), kgramsOf(col("_t")).as("_kg"))
      .select(col(idCol), keptOf(col("_kg")).as("_kept"))
      .select(col(idCol), struct(
        substring(md5(concat_ws("", col("_kept"))), 1, 16).as("fp"),
        size(col("_kept")).as("n_kept")).as("w"))
}
