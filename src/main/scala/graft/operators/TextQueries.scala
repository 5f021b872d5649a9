package graft.operators

import graft.Materialize.Ops
import graft.QueryRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operator family wired to the driver gate (X4). */
object TextQueries extends QueryRegistry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X4: language-ID confusion matrix (marker-word heuristic vs label)
    "text_langid" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"),
          TextAnalysis.predictedLang(TextDedup.tokens(col("text")))
            .as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))),
    // X4: per-document quality scoring (length/stopword heuristics)
    "text_quality" -> ((s, dir) => {
      val t = TextDedup.tokens(col("text"))
      val nTok = size(t)
      val nStop = size(filter(t, x => x.isin("the", "a")))
      val stopRatio = col("n_stop").cast("double") / col("n_tokens")
      docs(s, dir)
        .select(col("doc_id"), col("n_chars"), nTok.cast("long").as("n_tokens"),
          nStop.cast("long").as("n_stop"))
        // floorAt throughout: every output is a small-denominator
        // rational (integer ratios / their products) — see Quant
        .select(col("doc_id"), col("n_tokens"), col("n_stop"),
          Quant.floorAt(stopRatio, 6).as("stop_ratio"),
          Quant.floorAt((col("n_chars") - col("n_tokens") + 1).cast("double")
            / col("n_tokens"), 6).as("avg_word_len"),
          Quant.floorAt(least(lit(1.0), col("n_tokens") / lit(150.0))
            * (lit(1.0) - stopRatio), 6).as("quality_score"))
    }),
    // X4: token counting — whitespace + regex (BPE-ish) per language
    "text_tokens" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"), col("n_chars"),
          size(TextDedup.tokens(col("text"))).as("n_ws"),
          regexp_count(col("text"), lit("[a-z]+")).as("n_re"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_ws").as("n_ws_tokens"),
          sum("n_re").as("n_re_tokens"),
          Quant.floorAt(avg("n_chars"), 6) // int mean: see Quant
            .as("avg_chars"))),
    // X4: corpus word frequencies (explode → count), deterministic top-20
    "text_wordcount" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(TextDedup.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)),
    // X4: TF-IDF — corpus-level term weighting, top-5 terms per language
    // (tf = term count within the language; idf = ln(N_docs / doc-freq))
    "text_tfidf" -> ((s, dir) => {
      val d = docs(s, dir)
      // N_docs as a broadcast single-row cross join (no driver action);
      // the doc-frequency join is a SHUFFLE join on word — df is corpus-
      // vocabulary-sized and would blow the broadcast limit at 100 TB
      val nDocs = d.agg(count(lit(1)).cast("double").as("n_docs_total"))
      val tokens = d.select(col("lang"), col("doc_id"),
        explode(TextDedup.tokens(col("text"))).as("word"))
      val tf = tokens.groupBy("lang", "word").agg(count(lit(1)).as("tf"))
      val df_ = tokens.select("doc_id", "word").distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("tfidf").desc, col("word"))
      // idf quantized to 1e-4 (round(ln·1e4)/1e4) — the only
      // transcendental in the score; a 1-ulp cross-engine libm ln()
      // divergence, multiplied by a large tf, could otherwise flip the
      // 6-decimal output rounding (the hazard text_dsir hit at sf0.1).
      // With an identical quantized idf on both engines the product and
      // its rounding are exact-deterministic.
      tf.join(df_, "word")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          // floorAt: tf (= c/dl) × quantized idf (= m/1e4) is a product
          // of small-denominator rationals (see Quant); the inner idf
          // quantization keeps round (log → huge denominator)
          Quant.floorAt(col("tf") *
            (round(log(col("n_docs_total") / col("df")) * lit(1e4), 0) /
              lit(1e4)), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("lang", "rk", "word", "tfidf")
    }),
    // dataset curation: deterministic train/val/test split by content-hash
    // bucket (stable across runs, partitionings, and engines — unlike
    // seeded sampling, a row's split never changes when data is added)
    "text_split" -> ((s, dir) => {
      val bucket = substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4)
      docs(s, dir)
        .withColumn("split",
          when(bucket < "cccd", "train")       // ~80%
            .when(bucket < "e666", "val")      // ~10%
            .otherwise(lit("test")))           // ~10%
        .groupBy("lang", "split").agg(count(lit(1)).as("n"),
          min("doc_id").as("min_doc"))
    }),
    // curation: benchmark decontamination — flag training docs sharing any
    // word-8-gram with the benchmark set. Fixture texts are near-unique, so
    // contamination is synthesized by unioning leaked benchmark copies
    // (doc_id + 1e6) into the training set; the operator must flag exactly
    // those. At 100 TB this is a hash join on 128-bit 8-gram fingerprints
    // — the benchmark side is small (broadcastable), the training side a
    // narrow explode, no pair space beyond fingerprint matches.
    "text_decontam" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val bench = d.filter(col("doc_id") % 97 === 0)
      val train = d.union(
        bench.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      // 128-bit string-free gram identities — see explodedWordGrams (short
      // docs contribute no grams, mirroring the oracle's empty
      // generate_series(1, 0))
      def grams(df: DataFrame): DataFrame =
        TextAnalysis.explodedWordGrams(df, "doc_id", col("text"), 8)
      grams(train)
        .join(broadcast(
          grams(bench).select(col("h"), col("doc_id").as("bench_doc"))), "h")
        .filter(col("doc_id") =!= col("bench_doc"))
        .groupBy("doc_id")
        .agg(countDistinct("bench_doc").as("n_bench_docs"),
          count(lit(1)).as("n_shared_ngrams"))
    }),
    // curation: duplicated-n-gram fraction per doc (the RefinedWeb-style
    // boilerplate signal — what share of a doc's word-8-grams appear in
    // OTHER docs corpus-wide). Fixture texts share no 8-grams, so
    // duplication is synthesized by unioning copies of every 50th doc; the
    // operator must score exactly those (and their copies) at 1.0. Shape:
    // narrow gram explode → one groupBy(h) with map-side partials → a
    // co-partitioned join back on h → per-doc agg. No pair space, no
    // broadcast of the (vocabulary-sized) gram table.
    "text_dup_ngrams" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val withDups = d.union(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val g = TextAnalysis.explodedWordGrams(withDups, "doc_id",
          col("text"), 8)
        .materialize() // feeds the df agg AND the join back — the gram
                       // explode + hash is the query's dominant cost, and
                       // unmaterialized lineage would run it twice
      val freq = g.groupBy("h").agg(countDistinct("doc_id").as("n_docs"))
      g.join(freq, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
        .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
          // floorAt: integer ratio — tie-prone under round (see Quant)
          Quant.floorAt(
            col("n_dup_grams").cast("double") / col("n_grams"), 6)
            .as("dup_ratio"))
    }),
    // curation: Gopher-style repetition signals — duplicate-bigram ratio
    // and most-frequent-token fraction per doc, with the composite flag a
    // curation pipeline would filter on. Narrow per-row work + one explode
    // aggregate; no shuffle beyond the per-doc token count.
    "text_repetition" -> ((s, dir) => {
      val d = docs(s, dir)
      val t = TextDedup.tokens(col("text"))
      // guard: a 1-token doc has no bigrams — 0/0 here is engine-divergent
      // (Spark null vs DuckDB error), so emit NULL explicitly on both sides
      val base = d.select(col("doc_id"), size(t).cast("long").as("n_tokens"),
        when(size(t) >= 2,
          lit(1.0) - size(TextDedup.bigramShingles(col("text")))
            .cast("double") / (size(t) - 1)).as("dup_bigram_ratio"))
      val top = d.select(col("doc_id"), explode(t).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_c"), sum("c").as("n"))
        .select(col("doc_id"),
          (col("top_c").cast("double") / col("n")).as("top_token_ratio"))
      base.join(top, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          // integer ratios → floorAt (see Quant); the flag compares RAW
          Quant.floorAt(col("dup_bigram_ratio"), 6).as("dup_bigram_ratio"),
          Quant.floorAt(col("top_token_ratio"), 6).as("top_token_ratio"),
          (col("dup_bigram_ratio") > 0.2 || col("top_token_ratio") > 0.2)
            .as("flagged"))
    }),
    // curation: deterministic stratified sampling — ~20% per language via
    // content-hash bucket (like text_split: stable across runs,
    // partitionings, engines, and data growth; no rand()). Narrow filter +
    // per-stratum aggregate, no shuffle beyond the final group.
    "text_sample" -> ((s, dir) =>
      docs(s, dir)
        .filter(substring(md5(concat(lit("sample:"),
          col("doc_id").cast("string"))), 1, 4) < "3333")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))),

    // curation: PII-pattern redaction — emails/phones replaced with typed
    // placeholder tokens, with per-pattern counts and removed-char volume.
    // Fixture text is clean, so PII is synthesized deterministically (every
    // 13th doc gains an email, every 17th a phone) and the operator must
    // find exactly those. Narrow per-row regex work + one final aggregate —
    // no shuffle beyond the summary at any scale.
    "text_redact" -> ((s, dir) => {
      val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phoneRe = "555-[0-9]{4}"
      val withPii = docs(s, dir).select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 13 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("text"))
      withPii.select(col("doc_id"),
          regexp_count(col("text"), lit(emailRe)).as("n_email"),
          regexp_count(col("text"), lit(phoneRe)).as("n_phone"),
          length(col("text")).as("len_before"),
          length(regexp_replace(regexp_replace(col("text"),
            emailRe, "<EMAIL>"), phoneRe, "<PHONE>")).as("len_after"))
        .agg(
          count(when(col("n_email") > 0 || col("n_phone") > 0, 1))
            .as("n_docs_redacted"),
          sum("n_email").cast("long").as("n_emails"),
          sum("n_phone").cast("long").as("n_phones"),
          sum(col("len_before") - col("len_after")).cast("long")
            .as("chars_removed"))
    }),

    // curation: domain-mixture reweighting — per-(lang, source) cell
    // sampling weights that move the corpus toward a uniform cell mix,
    // clipped at 3.0 (the standard upsampling cap). Two tiny aggregates +
    // a single-row broadcast cross join; the weights table is what a 100 TB
    // sampling pass would broadcast against the corpus.
    "text_mix" -> ((s, dir) => {
      // materialize the (tiny) cell table once: `tot` derives from it, and
      // without the checkpoint its lineage re-scans the full corpus
      val cells = docs(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"))
        .materialize()
      val tot = cells.agg(sum("n_docs").as("n_total"),
        count(lit(1)).as("n_cells"))
      cells.crossJoin(broadcast(tot))
        .withColumn("actual_share", col("n_docs") / col("n_total"))
        .withColumn("mix_weight",
          least(lit(3.0), (lit(1.0) / col("n_cells")) / col("actual_share")))
        // share/weight/effective-count are all count ratios → floorAt
        .select(col("lang"), col("source"), col("n_docs"),
          Quant.floorAt(col("actual_share"), 6).as("actual_share"),
          Quant.floorAt(col("mix_weight"), 6).as("mix_weight"),
          Quant.floorAt(col("n_docs") * col("mix_weight"), 4)
            .as("n_effective"))
    }),

    // curation: APPLY the domain-mixture reweighting text_mix plans — each
    // doc's replication count is floor(weight) plus one more when the
    // doc's md5-derived fraction falls under the weight's fractional part
    // (deterministic fractional upsampling: no rand(), stable under
    // partitioning and data growth, expected replicas ≡ n_docs·weight).
    // The weights table is the same tiny broadcast text_mix emits; the
    // replication decision is a narrow per-row expression — at 100 TB the
    // actual replicated write is `explode(sequence(1, rep))` into the
    // curated sink, counted here for the oracle.
    "text_mix_apply" -> ((s, dir) => {
      val cells = docs(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"))
        .materialize()
      val tot = cells.agg(sum("n_docs").as("n_total"),
        count(lit(1)).as("n_cells"))
      val wts = cells.crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("n_docs"),
          least(lit(3.0), (lit(1.0) / col("n_cells")) /
            (col("n_docs") / col("n_total"))).as("w"))
      val hfrac = conv(substring(md5(concat(lit("mix:"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("double") /
        lit(1152921504606846976.0) // 16^15 = 2^60 — exact
      docs(s, dir).select("doc_id", "lang", "source")
        .join(broadcast(wts), Seq("lang", "source"))
        .withColumn("rep", floor(col("w")).cast("long") +
          when(hfrac < col("w") - floor(col("w")), 1L).otherwise(0L))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("rep").as("n_replicas"),
          Quant.floorAt(min("w"), 6).as("mix_weight")) // count ratio
    }),

    // curation: corpus-frequency fluency score — a char-bigram "language
    // model" trained on the corpus itself (count per (lang, bigram)), each
    // doc scored by the mean corpus frequency of its bigrams. Rare/garbled
    // text scores low — the integer-only cousin of LM perplexity filtering
    // (no transcendentals, so both engines agree bitwise; per-doc means
    // are integer ratios and the per-lang mean is quantized to 10⁻⁶ so the
    // aggregation is summation-order-free). The model join is a shuffle
    // join on (lang, bigram) — corpus-vocabulary-sized, never broadcast.
    "text_lm_score" -> ((s, dir) => {
      // shuffle discipline: the raw bigram stream is ~n_chars rows per doc;
      // everything downstream works on the PER-DOC bigram histogram
      // (doc_id, g, cnt) — one map-side-combinable aggregate collapses the
      // stream ~5× before any join, the model is a reaggregation of the
      // histogram, and the scoring join carries counts, not instances.
      // The model-join strategy is left to the planner: char-bigram
      // vocabulary is charset²-bounded, so for ASCII corpora it broadcasts
      // (and does here); a CJK corpus can push it past broadcast range,
      // where the same plan falls back to a shuffle join on (lang, g).
      // Overlapping char bigrams via ONE regex scan (zero-width lookahead
      // capturing the next two chars), not per-position substr: Spark's
      // UTF8String.substring walks bytes from offset 0 to locate char i,
      // so a substr-per-position transform is O(len²) PER DOCUMENT — the
      // sf1 scale smoke measured the old form 17.8× at 10× data (longer
      // derived docs squared); the regex form is linear. (?s) so '.'
      // crosses newlines, exactly like substr. Both substr and Java
      // regex '.' count CODE POINTS, but the zero-width scan also visits
      // the UTF-16 position INSIDE a surrogate pair (capturing a lone
      // low surrogate there); the (?![\uDC00-\uDFFF]) lookahead rejects
      // any start sitting on a low surrogate — a position that exists
      // only mid-pair in well-formed text — so non-BMP text (emoji-laden
      // web corpora) yields exactly the len-1 code-point bigrams substr
      // defines (TextQueriesSpec pins the equivalence).
      val cb = docs(s, dir).select(col("doc_id"), col("lang"),
        explode(regexp_extract_all(col("text"),
          lit("(?s)(?![\\uDC00-\\uDFFF])(?=(..))"), lit(1))).as("g"))
      val hist = cb.groupBy("doc_id", "lang", "g")
        .agg(count(lit(1)).as("cnt"))
        .materialize() // feeds the model build AND the scoring join
      val model = hist.groupBy("lang", "g").agg(sum("cnt").as("c"))
      val fluency = hist.join(model, Seq("lang", "g"))
        .groupBy("doc_id", "lang")
        .agg(sum("cnt").as("n"), sum(col("c") * col("cnt")).as("sc"))
        .withColumn("fluency", col("sc").cast("double") / col("n"))
      // floor everywhere here, not round: fluency = sc/n is an integer
      // ratio, so BOTH the per-doc 1e-6 quantization and the per-lang
      // outputs are tie-prone under round (see Quant)
      fluency.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          Quant.floorAt(
            sum(floor(col("fluency") * lit(1e6)).cast("long")).cast("double")
              / (count(lit(1)) * lit(1e6)), 6).as("avg_fluency"),
          Quant.floorAt(min("fluency"), 6).as("min_fluency"),
          Quant.floorAt(max("fluency"), 6).as("max_fluency"))
    }),

    // curation: model-based quality filtering — batch inference of a
    // fixed-weight linear classifier over engineered features (token
    // count, stopword ratio, mean word length). The inference pass is a
    // narrow map (no shuffle until the per-lang rollup) — the shape of
    // any classifier-scored keep/drop sweep at 100 TB; the weights stand
    // in for a trained model's. Scores aggregate 10⁻⁶-quantized.
    "text_classify" -> ((s, dir) => {
      val t = TextDedup.tokens(col("text"))
      val base = docs(s, dir).select(col("lang"), col("n_chars"),
        size(t).cast("long").as("n_tokens"),
        size(filter(t, x => x.isin("the", "a"))).cast("long").as("n_stop"))
      val scored = base.select(col("lang"),
        (lit(0.2) + lit(0.004) * least(col("n_tokens"), lit(250L)).cast("double")
          - lit(1.5) * (col("n_stop").cast("double") / col("n_tokens"))
          + lit(0.05) * ((col("n_chars") - col("n_tokens") + 1).cast("double")
            / col("n_tokens"))).as("score"))
      scored.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        count(when(col("score") > 0.5, 1)).as("n_keep"),
        // keep_rate is a count ratio → floorAt (see Quant); score-based
        // columns keep round (inexact literals → huge denominator, no
        // realistic tie)
        Quant.floorAt(count(when(col("score") > 0.5, 1)).cast("double")
          / count(lit(1)), 6).as("keep_rate"),
        Quant.floorAt( // quantized-sum / n·1e6 is an integer ratio
          sum(round(col("score") * 1e6, 0).cast("long")).cast("double")
            / (count(lit(1)) * lit(1e6)), 6).as("avg_score"))
    }),

    // curation: document-length histogram per language (fixed 200-char
    // buckets) — the length-distribution profile every curation pass
    // starts from (where do the truncation/min-length cutoffs bite?).
    // Pure integer bucketing (floor-div), one map-side-combinable
    // aggregate; the histogram is bounded by n_buckets × n_langs
    // regardless of corpus size.
    "text_length_hist" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("bucket_lo",
          expr("CAST(n_chars AS BIGINT) div 200 * 200"))
        .groupBy("lang", "bucket_lo")
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").cast("long").as("min_chars"),
          max("n_chars").cast("long").as("max_chars"))),

    // curation capstone: the end-to-end manifest a training run consumes —
    // exact dedup (md5 canonical per content hash), quality gate (token
    // count + stopword-ratio, integer-only so both engines agree), and the
    // deterministic content-hash split, composed in one pipeline, rolled
    // up per (split, lang) with drop accounting. Dups are synthesized
    // (every 50th doc re-appears under a high id) and must all be dropped
    // as non-canonical. Shape: narrow per-row feature map → one shuffle on
    // the content hash (the dedup) → one rollup; at 100 TB the dedup
    // shuffle is the same hash-partition exchange as dedup_exact_hash.
    "curation_manifest" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "lang", "text")
      val withDups = d.union(
        d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
            col("text")))
      val t = TextDedup.tokens(col("text"))
      val base = withDups.select(col("doc_id"), col("lang"),
        md5(col("text")).as("h"),
        size(t).cast("long").as("n_tokens"),
        size(filter(t, x => x.isin("the", "a"))).cast("long").as("n_stop"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("h").orderBy("doc_id")
      val split = substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 4)
      base
        .withColumn("is_canonical", row_number().over(w) === 1)
        .withColumn("quality_ok",
          col("n_tokens") >= 30 && col("n_stop") * 2 <= col("n_tokens"))
        .withColumn("split",
          when(split < "cccd", "train").when(split < "e666", "val")
            .otherwise(lit("test")))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_candidates"),
          count(when(!col("is_canonical"), 1)).as("n_dropped_dup"),
          count(when(col("is_canonical") && !col("quality_ok"), 1))
            .as("n_dropped_quality"),
          count(when(col("is_canonical") && col("quality_ok"), 1))
            .as("n_kept"),
          coalesce(sum(when(col("is_canonical") && col("quality_ok"),
            col("n_tokens"))), lit(0L)).as("kept_tokens"))
    }),

    // curation: per-source document cap (domain anti-domination) — keep at
    // most 40 docs per source, selected by content-hash order so the kept
    // set is deterministic and stable under data growth within the cap
    // (unlike seeded sampling, adding docs to OTHER sources never changes a
    // source's kept set; adding docs to the same source only competes by
    // hash order). NO per-source window sort: the counts need only a plain
    // aggregate (n_kept = least(count, 40)), and the kept-set witness is a
    // per-source top-40 through the bounded-heap TopKPerKey operator —
    // map-side heaps cut each partition to ≤ sources × 40 rows BEFORE the
    // exchange, so a dominant source (20% of a 100 TB corpus) costs one
    // 40-row heap per map task instead of one reducer sorting its whole
    // doc set (a full-partition sort is exactly what AQE cannot split;
    // PlanAuditSpec pins the sort-free plan).
    "text_domain_cap" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept40 = least(col("n_docs"), lit(40L))
      val counts = d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("n_docs"), kept40.as("n_kept"),
          (col("n_docs") - kept40).as("n_dropped"))
      val sample = org.apache.spark.sql.graft.TopK.perKey(
          d.select(col("source"), col("doc_id"),
            md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("hk")),
          Seq("source"), Seq(("hk", false), ("doc_id", false)), 40)
        .groupBy("source").agg(min("doc_id").as("sample_kept_doc"))
      counts.join(sample, Seq("source"))
    }),

    // curation: per-source token-budget admission (prefix cap) — each
    // source contributes docs until its cumulative token count passes the
    // budget; later docs are rejected. The prefix rule (every doc's tokens
    // count toward the running total, admitted iff cumsum ≤ budget) is
    // what makes the admitted set order-deterministic, window-expressible,
    // AND identical to the streaming form (streaming/Quota.admit — one
    // long of state per source; QuotaSpec pins stream ≡ this window).
    // One exchange keyed by source; the cumsum is a running-frame window
    // inside the partition.
    "text_token_budget" -> ((s, dir) => {
      val nt = size(TextDedup.tokens(col("text"))).cast("long")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docs(s, dir)
        .select(col("source"), col("doc_id"), nt.as("nt"))
        .withColumn("cum", sum("nt").over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("cum") <= 30000L, 1)).as("n_admitted"),
          count(when(col("cum") > 30000L, 1)).as("n_rejected"),
          coalesce(sum(when(col("cum") <= 30000L, col("nt"))), lit(0L))
            .as("tokens_admitted"))
    }),

    // curation: the STREAMING form of text_token_budget — the same
    // prefix-cap admission run through Quota.admit's
    // flatMapGroupsWithState machinery (two longs of state per source)
    // and drained to completion. The prefix rule makes stream ≡ batch
    // exact, so the SAME oracle hash-checks both forms; QuotaSpec pins
    // what the one-batch drain cannot see (cross-micro-batch state
    // carry, out-of-order fail-fast).
    "text_token_budget_stream" -> ((s, dir) => {
      val sc = graft.streaming.CdcStream.stateScopedSession(s)
      import sc.implicits._
      val schema = sc.read.parquet(s"$dir/documents.parquet").schema
      val nt = size(TextDedup.tokens(col("text"))).cast("long")
      val src = sc.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .select(col("source"), col("doc_id"), nt.as("n_tokens"))
        .as[graft.streaming.Quota.DocTokens]
      // the admission ledger is one row per DOC — data-sized: parquet
      // drain (guide §5), never a memory sink
      graft.streaming.CdcStream.drainToParquet(sc,
          graft.streaming.Quota.admit(src, 30000L).toDF())
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("admitted"), 1)).as("n_admitted"),
          count(when(!col("admitted"), 1)).as("n_rejected"),
          coalesce(sum(when(col("admitted"), col("n_tokens"))), lit(0L))
            .as("tokens_admitted"))
    }),

    // X4: winnowing document fingerprints (rolling-hash min-per-window);
    // the column-bound form — structurally linear rather than dependent
    // on evaluator subtree reuse (see winnowFingerprints' scaladoc)
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.winnowFingerprints(docs(s, dir), "doc_id", col("text"))
        .select(col("doc_id"), col("w.fp").as("fp"),
          col("w.n_kept").cast("long").as("n_kept"))))

  def oracles: Map[String, String] = Map(
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |sc AS (SELECT lang,
        |  len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS s_en,
        |  len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        |  len(list_filter(toks, x -> x IN ('el','la','de','que','los'))) AS s_es,
        |  len(list_filter(toks, x -> x IN ('le','la','les','des','et'))) AS s_fr,
        |  len(list_filter(toks, x -> x IN ('的','是','了'))) AS s_zh
        | FROM t)
        |SELECT lang,
        | CASE WHEN s_en=0 AND s_de=0 AND s_es=0 AND s_fr=0 AND s_zh=0 THEN 'unknown'
        |      WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
        |      WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
        |      WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |      WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted,
        | count(*) AS n
        |FROM sc GROUP BY 1, 2""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, n_chars, len(toks) AS n_tokens,
        |  len(list_filter(toks, x -> x IN ('the','a'))) AS n_stop FROM t)
        |SELECT doc_id, n_tokens, n_stop,
        | floor(n_stop * 1.0 / n_tokens * 1000000) / 1000000.0 AS stop_ratio,
        | floor((n_chars - n_tokens + 1) * 1.0 / n_tokens * 1000000)
        |   / 1000000.0 AS avg_word_len,
        | floor(least(1.0, n_tokens / 150.0) * (1.0 - n_stop * 1.0 / n_tokens)
        |   * 1000000) / 1000000.0 AS quality_score
        |FROM m""".stripMargin,
    "text_tokens" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
        | CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS n_re_tokens,
        | floor(avg(n_chars) * 1000000) / 1000000.0 AS avg_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "text_wordcount" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY 1 ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "text_split" ->
      """WITH b AS (SELECT lang, doc_id,
        |  substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
        | FROM documents)
        |SELECT lang,
        | CASE WHEN bucket < 'cccd' THEN 'train'
        |      WHEN bucket < 'e666' THEN 'val' ELSE 'test' END AS split,
        | count(*) AS n, min(doc_id) AS min_doc
        |FROM b GROUP BY 1, 2""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT lang, word, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT word, count(*) AS df FROM
        |  (SELECT DISTINCT doc_id, word FROM tok) GROUP BY 1),
        |sc AS (SELECT lang, word, tf,
        |  floor(tf * (round(ln((SELECT count(*) FROM documents) * 1.0 / df)
        |    * 10000) / 10000.0) * 1000000) / 1000000.0 AS tfidf
        | FROM tf JOIN df USING (word))
        |SELECT lang, rk, word, tfidf FROM (
        |  SELECT lang, word, tfidf,
        |    row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, word) AS rk
        |  FROM sc)
        |WHERE rk <= 5""".stripMargin,
    "text_sample" ->
      """SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_doc,
        | max(doc_id) AS max_doc
        |FROM documents
        |WHERE substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4) < '3333'
        |GROUP BY 1""".stripMargin,
    "text_decontam" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |bench AS (SELECT doc_id, text FROM d WHERE doc_id % 97 = 0),
        |train AS (SELECT doc_id, text FROM d
        |  UNION ALL SELECT doc_id + 1000000, text FROM bench),
        |tg AS (SELECT doc_id, md5(g) AS h FROM (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, greatest(len(t) - 7, 0)),
        |    i -> array_to_string(t[i:i+7], ' '))) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM train))),
        |bg AS (SELECT doc_id, md5(g) AS h FROM (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, greatest(len(t) - 7, 0)),
        |    i -> array_to_string(t[i:i+7], ' '))) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM bench)))
        |SELECT tg.doc_id, count(DISTINCT bg.doc_id) AS n_bench_docs,
        |  count(*) AS n_shared_ngrams
        |FROM tg JOIN bg USING (h)
        |WHERE tg.doc_id <> bg.doc_id
        |GROUP BY 1""".stripMargin,
    "text_dup_ngrams" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |    WHERE doc_id % 50 = 0),
        |g AS (SELECT doc_id, md5(gr) AS h FROM (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, greatest(len(t) - 7, 0)),
        |    i -> array_to_string(t[i:i+7], ' '))) AS gr
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM d))),
        |f AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY 1),
        |pd AS (SELECT doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_grams
        |  FROM g JOIN f USING (h) GROUP BY 1)
        |SELECT doc_id, n_grams, n_dup_grams,
        |  floor(CAST(n_dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
        |    * 1000000) / 1000000.0 AS dup_ratio
        |FROM pd""".stripMargin,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |base AS (SELECT doc_id, len(t) AS n_tokens,
        |  CASE WHEN len(t) >= 2 THEN
        |    1.0 - len(list_distinct(list_transform(generate_series(1, len(t)-1),
        |      i -> t[i] || ' ' || t[i+1]))) * 1.0 / (len(t) - 1)
        |  ELSE NULL END AS dup_bigram_ratio
        | FROM t),
        |tok AS (SELECT doc_id, unnest(t) AS w FROM t),
        |cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) * 1.0 / CAST(sum(c) AS BIGINT) AS top_token_ratio
        | FROM cnt GROUP BY 1)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | floor(dup_bigram_ratio * 1000000) / 1000000.0 AS dup_bigram_ratio,
        | floor(top_token_ratio * 1000000) / 1000000.0 AS top_token_ratio,
        | (dup_bigram_ratio > 0.2 OR top_token_ratio > 0.2) AS flagged
        |FROM base JOIN top USING (doc_id)""".stripMargin,
    "text_redact" ->
      """WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 13 = 0
        |    THEN ' contact user' || doc_id::VARCHAR || '@example.com'
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 17 = 0
        |    THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |    ELSE '' END AS text
        | FROM documents),
        |m AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_email,
        |  len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phone,
        |  length(text) AS len_before,
        |  length(regexp_replace(regexp_replace(text,
        |    '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g')) AS len_after
        | FROM p)
        |SELECT count(*) FILTER (WHERE n_email > 0 OR n_phone > 0)
        |   AS n_docs_redacted,
        | CAST(sum(n_email) AS BIGINT) AS n_emails,
        | CAST(sum(n_phone) AS BIGINT) AS n_phones,
        | CAST(sum(len_before - len_after) AS BIGINT) AS chars_removed
        |FROM m""".stripMargin,
    "text_mix" ->
      """WITH cells AS (SELECT lang, source, count(*) AS n_docs
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |  count(*) AS n_cells FROM cells),
        |j AS (SELECT lang, source, n_docs,
        |  n_docs * 1.0 / n_total AS actual_share,
        |  least(3.0, (1.0 / n_cells) / (n_docs * 1.0 / n_total)) AS mix_weight
        | FROM cells CROSS JOIN tot)
        |SELECT lang, source, n_docs,
        | floor(actual_share * 1000000) / 1000000.0 AS actual_share,
        | floor(mix_weight * 1000000) / 1000000.0 AS mix_weight,
        | floor(n_docs * mix_weight * 10000) / 10000.0 AS n_effective
        |FROM j""".stripMargin,
    "text_mix_apply" ->
      """WITH cells AS (SELECT lang, source, count(*) AS n_docs
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |  count(*) AS n_cells FROM cells),
        |wts AS (SELECT lang, source,
        |  least(3.0, (1.0 / n_cells) / (n_docs * 1.0 / n_total)) AS w
        | FROM cells CROSS JOIN tot),
        |r AS (SELECT d.lang, d.source, w,
        |  floor(w) + CASE WHEN
        |    ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |      ::BIGINT / 1152921504606846976.0 < w - floor(w)
        |    THEN 1 ELSE 0 END AS rep
        | FROM documents d JOIN wts USING (lang, source))
        |SELECT lang, source, count(*) AS n_docs,
        | CAST(sum(rep) AS BIGINT) AS n_replicas,
        | floor(min(w) * 1000000) / 1000000.0 AS mix_weight
        |FROM r GROUP BY 1, 2""".stripMargin,
    "text_lm_score" ->
      """WITH cb AS (SELECT doc_id, lang,
        |  unnest(list_transform(generate_series(1, length(text) - 1),
        |    i -> substr(text, i, 2))) AS g
        | FROM documents WHERE length(text) >= 2),
        |model AS (SELECT lang, g, count(*) AS c FROM cb GROUP BY 1, 2),
        |scored AS (SELECT doc_id, cb.lang AS lang, count(*) AS n,
        |  CAST(sum(c) AS BIGINT) AS sc
        | FROM cb JOIN model USING (lang, g) GROUP BY 1, 2),
        |f AS (SELECT doc_id, lang, sc * 1.0 / n AS fluency FROM scored)
        |SELECT lang, count(*) AS n_docs,
        | floor(CAST(sum(CAST(floor(fluency * 1000000) AS BIGINT)) AS BIGINT)
        |   / (count(*) * 1000000.0) * 1000000) / 1000000.0 AS avg_fluency,
        | floor(min(fluency) * 1000000) / 1000000.0 AS min_fluency,
        | floor(max(fluency) * 1000000) / 1000000.0 AS max_fluency
        |FROM f GROUP BY 1""".stripMargin,
    // literals cast to DOUBLE: DuckDB's bare 0.004 is DECIMAL and its
    // exact arithmetic would diverge from Spark's IEEE doubles
    "text_classify" ->
      """WITH t AS (SELECT lang, n_chars, string_split(text, ' ') AS toks
        |  FROM documents),
        |m AS (SELECT lang, n_chars, len(toks) AS n_tokens,
        |  len(list_filter(toks, x -> x IN ('the','a'))) AS n_stop FROM t),
        |sc AS (SELECT lang,
        |  0.2::DOUBLE + 0.004::DOUBLE * least(n_tokens, 250)
        |    - 1.5::DOUBLE * (CAST(n_stop AS DOUBLE) / n_tokens)
        |    + 0.05::DOUBLE * (CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens)
        |    AS score
        | FROM m)
        |SELECT lang, count(*) AS n_docs,
        | count(*) FILTER (WHERE score > 0.5::DOUBLE) AS n_keep,
        | floor(count(*) FILTER (WHERE score > 0.5::DOUBLE) * 1.0 / count(*)
        |   * 1000000) / 1000000.0 AS keep_rate,
        | floor(CAST(sum(CAST(round(score * 1000000) AS BIGINT)) AS BIGINT)
        |   / (count(*) * 1000000.0) * 1000000) / 1000000.0 AS avg_score
        |FROM sc GROUP BY 1""".stripMargin,
    "text_length_hist" ->
      """SELECT lang, (n_chars // 200) * 200 AS bucket_lo,
        | count(*) AS n_docs,
        | CAST(min(n_chars) AS BIGINT) AS min_chars,
        | CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "curation_manifest" ->
      """WITH d AS (SELECT doc_id, lang, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, lang, text FROM documents
        |    WHERE doc_id % 50 = 0),
        |b AS (SELECT doc_id, lang, md5(text) AS h,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('the','a')))
        |    AS n_stop
        | FROM d),
        |r AS (SELECT doc_id, lang, n_tokens,
        |  row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
        |    AS is_canonical,
        |  n_tokens >= 30 AND n_stop * 2 <= n_tokens AS quality_ok,
        |  CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
        |         < 'cccd' THEN 'train'
        |       WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
        |         < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        | FROM b)
        |SELECT split, lang, count(*) AS n_candidates,
        | count(*) FILTER (WHERE NOT is_canonical) AS n_dropped_dup,
        | count(*) FILTER (WHERE is_canonical AND NOT quality_ok)
        |   AS n_dropped_quality,
        | count(*) FILTER (WHERE is_canonical AND quality_ok) AS n_kept,
        | CAST(coalesce(sum(n_tokens)
        |   FILTER (WHERE is_canonical AND quality_ok), 0) AS BIGINT)
        |   AS kept_tokens
        |FROM r GROUP BY 1, 2""".stripMargin,
    "text_token_budget" ->
      """WITH t AS (SELECT source, doc_id,
        |  len(string_split(text, ' ')) AS nt FROM documents),
        |c AS (SELECT source, doc_id, nt,
        |  sum(nt) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t)
        |SELECT source, count(*) AS n_docs,
        | count(*) FILTER (WHERE cum <= 30000) AS n_admitted,
        | count(*) FILTER (WHERE cum > 30000) AS n_rejected,
        | CAST(coalesce(sum(nt) FILTER (WHERE cum <= 30000), 0) AS BIGINT)
        |   AS tokens_admitted
        |FROM c GROUP BY 1""".stripMargin,
    // identical oracle: the streaming form must produce the batch answer
    "text_token_budget_stream" ->
      """WITH t AS (SELECT source, doc_id,
        |  len(string_split(text, ' ')) AS nt FROM documents),
        |c AS (SELECT source, doc_id, nt,
        |  sum(nt) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t)
        |SELECT source, count(*) AS n_docs,
        | count(*) FILTER (WHERE cum <= 30000) AS n_admitted,
        | count(*) FILTER (WHERE cum > 30000) AS n_rejected,
        | CAST(coalesce(sum(nt) FILTER (WHERE cum <= 30000), 0) AS BIGINT)
        |   AS tokens_admitted
        |FROM c GROUP BY 1""".stripMargin,
    "text_domain_cap" ->
      """WITH r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        | FROM documents)
        |SELECT source, count(*) AS n_docs,
        | count(*) FILTER (WHERE rk <= 40) AS n_kept,
        | count(*) FILTER (WHERE rk > 40) AS n_dropped,
        | min(doc_id) FILTER (WHERE rk <= 40) AS sample_kept_doc
        |FROM r GROUP BY 1""".stripMargin,
    "text_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |kg AS (SELECT doc_id, list_transform(generate_series(1, len(t)-2),
        |    i -> substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 8)) AS h
        |  FROM t),
        |keep AS (SELECT doc_id, list_sort(list_distinct(
        |    list_transform(generate_series(1, len(h)-3),
        |      p -> list_min(h[p:p+3])))) AS f FROM kg)
        |SELECT doc_id, substr(md5(array_to_string(f, '')), 1, 16) AS fp,
        | len(f) AS n_kept
        |FROM keep""".stripMargin)
}
