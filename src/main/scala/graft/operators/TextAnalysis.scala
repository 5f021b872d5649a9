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

  /** md5 fingerprints of every word n-gram of a document — the shared
    * primitive behind benchmark decontamination (text_decontam) and the
    * duplicated-n-gram boilerplate score (text_dup_ngrams). Docs shorter
    * than `n` tokens contribute no grams (the sequence() step-down guard —
    * see winnowFingerprint).
    */
  def wordGramHashes(text: Column, n: Int): Column = {
    val t = TextDedup.tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => md5(concat_ws(" ", slice(t, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Winnowing fingerprint (k-gram rolling hash + min-per-window):
    * word 3-gram md5-prefix hashes, window of 4, distinct kept minima,
    * fingerprint = md5 of the sorted kept set. Standard document
    * fingerprinting (Schleimer et al., SIGMOD'03) in pure expressions.
    */
  def winnowFingerprint(text: Column): Column = {
    val t = TextDedup.tokens(text)
    // guards: sequence(1, n) steps DOWN when n < 1 (yielding [1, 0] and an
    // index-0 error) — docs too short for a 3-gram (< 3 tokens) or for a
    // 4-window (< 6 tokens) keep an empty set, matching the oracle's empty
    // generate_series
    val kgrams = when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2), i =>
        substring(
          md5(concat_ws(" ",
            element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))),
          1, 8))).otherwise(array().cast("array<string>"))
    val kept = sort_array(array_distinct(
      when(size(kgrams) >= 4,
        transform(sequence(lit(1), size(kgrams) - 3), p =>
          array_min(slice(kgrams, p, lit(4)))))
        .otherwise(array().cast("array<string>"))))
    struct(
      substring(md5(concat_ws("", kept)), 1, 16).as("fp"),
      size(kept).as("n_kept"))
  }
}
