package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Publish-time expectation contract: `fail` mode rejects the whole
  * publish atomically (counts observed on the write job, generation
  * discarded, pointer untouched, version number reusable); `drop` mode
  * publishes the clean subset and quarantines violators inside the
  * generation with the failed expectation names; a predicate that
  * evaluates to null is a violation; delta expectations see the
  * delta's own rows only.
  */
class LakeExpectSpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_lakeexp").toString + "/lake"

  private def cleanup(root: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)

  private val corpus = Seq(
    ("a-1", "g0", "fine one", 1.0),
    ("a-2", "g0", "", 2.0), // violates text_nonempty
    ("a-3", "g1", "fine three", -1.0), // violates score_positive
    ("a-4", "g1", "", -2.0), // violates both
    ("a-5", "g1", "fine five", 5.0))

  private val expectations = Seq(
    "text_nonempty" -> (length(col("text")) > 0),
    "score_positive" -> (col("score") > 0))

  test("fail mode: the publish is rejected naming every violated " +
      "expectation, nothing lands, and the version number is reusable") {
    val root = tmp()
    try {
      Lake.publishVersion(
        corpus.filter(t => t._3.nonEmpty && t._4 > 0)
          .toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L) // v0: clean
      val e = intercept[IllegalArgumentException] {
        Lake.publishVersion(corpus.toDF("id", "k", "text", "score"),
          root, Seq("k"), Seq("id"), 1000L,
          expect = expectations, onViolation = "fail")
      }
      assert(e.getMessage.contains("text_nonempty (2 rows)"), e.getMessage)
      assert(e.getMessage.contains("score_positive (2 rows)"), e.getMessage)
      // pointer untouched, generation discarded, number reusable
      assert(Lake.currentVersion(spark, root) === Some(0L))
      assert(!new java.io.File(s"$root/v=1").exists())
      val v = Lake.publishVersion(
        corpus.filter(t => t._3.nonEmpty && t._4 > 0)
          .toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L,
        expect = expectations, onViolation = "fail")
      assert(v === 1L)
    } finally cleanup(root)
  }

  test("drop mode: clean rows publish; the quarantine holds exactly the " +
      "violators, each naming its failed expectations in order") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus.toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L,
        expect = expectations, onViolation = "drop")
      assert(Lake.readVersion(spark, root).select("id").collect()
        .map(_.getString(0)).toSet === Set("a-1", "a-5"))
      val q = Lake.readQuarantine(spark, root)
        .select("id", "_graft_violated").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(q === Map(
        "a-2" -> "text_nonempty",
        "a-3" -> "score_positive",
        "a-4" -> "text_nonempty,score_positive"))
    } finally cleanup(root)
  }

  test("a predicate evaluating to NULL is a violation (a rule that " +
      "cannot evaluate has not passed)") {
    val root = tmp()
    try {
      Lake.publishVersion(
        Seq(("a-1", "g0", "t", Some(1.0)), ("a-2", "g0", "t", None))
          .toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L,
        expect = Seq("score_positive" -> (col("score") > 0)),
        onViolation = "drop")
      assert(Lake.readQuarantine(spark, root).select("id").collect()
        .map(_.getString(0)).toSeq === Seq("a-2"))
    } finally cleanup(root)
  }

  test("delta expectations see the delta's own rows; a fully-quarantined " +
      "partition keeps inheriting its old content") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus.toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L) // v0: unchecked
      // the delta's g0 rows ALL violate -> g0 is not rewritten; its g1
      // row is clean and publishes
      Lake.publishDelta(
        Seq(("a-1", "g0", "", 1.0), ("a-5", "g1", "edited five", 5.0))
          .toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L,
        expect = expectations, onViolation = "drop")
      val cur = Lake.readVersion(spark, root)
        .select("id", "text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(cur("a-1") === "fine one") // inherited, not blanked
      assert(cur("a-5") === "edited five")
      assert(Lake.readQuarantine(spark, root).count() === 1L)
    } finally cleanup(root)
  }

  test("streaming wiring: a drop-mode publishBatch quarantines inside " +
      "its drop; a fail-mode batch throws (poison batch fails the query)") {
    val root = tmp()
    try {
      Lake.publishBatch(corpus.toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L, keep = 3, batchId = 0L,
        expect = expectations, onViolation = "drop")
      assert(Lake.readVersion(spark, root).count() === 2L)
      assert(Lake.readQuarantine(spark, root, Some(0L)).count() === 3L)
      intercept[IllegalArgumentException] {
        Lake.publishBatch(corpus.toDF("id", "k", "text", "score"),
          root, Seq("k"), Seq("id"), 1000L, keep = 3, batchId = 1L,
          expect = expectations, onViolation = "fail")
      }
      // the rejected batch shipped nothing: currency still the drop's
      assert(Lake.currentVersion(spark, root) === Some(0L))
    } finally cleanup(root)
  }

  test("vacuum's refusal-audit horizon is per key family (r16 advice): " +
      "batch (m=) and full-publish (v=) refusal ids are unrelated " +
      "sequences — the newest of EACH family survives keep=1") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus.toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L) // v0
      def poison(id: String) =
        Seq((id, "g0", "", -1.0)).toDF("id", "k", "text", "score")
      // two v-family refusals (full publishes; ids are small version
      // numbers with attempt suffixes: v=1_a0, v=1_a1)
      for (i <- 1 to 2)
        intercept[Lake.RefusedPublishException] {
          Lake.publishVersion(poison(s"v-$i"), root, Seq("k"), Seq("id"),
            1000L, expect = expectations, onViolation = "drop")
        }
      // two m-family refusals with LARGE batch ids — pre-fix, the shared
      // numeric ordering retained only these and pruned the
      // chronologically NEWER v-family audits
      for (b <- Seq(100L, 101L))
        Lake.publishBatch(poison(s"m-$b"), root, Seq("k"), Seq("id"),
          1000L, keep = 3, batchId = b,
          expect = expectations, onViolation = "drop")
      val led = Lake.vacuum(spark, root, keep = 1)
        .filter(col("reason") === "refusal_audit")
        .select("v", "action").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(led.count(_._2 == "refused_retained") === 2, led.toSeq)
      assert(led.filter(_._2 == "refused_retained").map(_._1).toSet
        === Set(1L, 101L), led.toSeq) // newest v-family AND newest m-family
      val left = Lake.readRefusedQuarantine(spark, root)
        .select("id").as[String].collect().toSet
      assert(left === Set("v-2", "m-101"), left)
    } finally cleanup(root)
  }

  test("readQuarantine fails loudly when nothing was quarantined — " +
      "including after a CLEAN drop-mode publish") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus.toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L)
      val e = intercept[IllegalStateException] {
        Lake.readQuarantine(spark, root)
      }
      assert(e.getMessage.contains("no quarantine"))
      // drop mode with zero violations must not leave an empty
      // quarantine behind — ran clean ≡ ran without expectations
      Lake.publishVersion(
        corpus.filter(t => t._3.nonEmpty && t._4 > 0)
          .toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L,
        expect = expectations, onViolation = "drop")
      val e2 = intercept[IllegalStateException] {
        Lake.readQuarantine(spark, root)
      }
      assert(e2.getMessage.contains("no quarantine"))
    } finally cleanup(root)
  }

  test("a drop-mode publish that quarantines EVERY row refuses to ship " +
      "an empty generation; the pointer is unchanged") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus.toDF("id", "k", "text", "score"),
        root, Seq("k"), Seq("id"), 1000L) // v0
      // the refusal is the dedicated TYPE (r17): publishBatch's drop-mode
      // skip catches RefusedPublishException by type, so a reworded
      // message can never break drop-mode stream progress — this
      // intercept is the pin for that contract
      val e = intercept[Lake.RefusedPublishException] {
        Lake.publishVersion(
          Seq(("b-1", "g0", "", -1.0)).toDF("id", "k", "text", "score"),
          root, Seq("k"), Seq("id"), 1000L,
          expect = expectations, onViolation = "drop")
      }
      assert(e.getMessage.contains("no data files"))
      assert(Lake.currentVersion(spark, root) === Some(0L))
      assert(Lake.readVersion(spark, root).count() === corpus.size.toLong)
      assert(!new java.io.File(s"$root/v=1").exists())
      // the same guard covers an empty input WITHOUT expectations — an
      // unreadable zero-file generation must never become current
      val e2 = intercept[Lake.RefusedPublishException] {
        Lake.publishVersion(
          corpus.toDF("id", "k", "text", "score").limit(0),
          root, Seq("k"), Seq("id"), 1000L)
      }
      assert(e2.getMessage.contains("no data files"))
      assert(Lake.currentVersion(spark, root) === Some(0L))
      // the refusal PRESERVED the audit: the quarantined rows moved out
      // of the discarded generation into _QUARANTINE_REFUSED, named in
      // the refusal message, readable via readRefusedQuarantine
      assert(e.getMessage.contains("_QUARANTINE_REFUSED"), e.getMessage)
      val refused = Lake.readRefusedQuarantine(spark, root)
      assert(refused.select("id").as[String].collect().toSeq === Seq("b-1"))
      assert(refused.select("_graft_violated").as[String].head()
        .split(",").toSet === Set("text_nonempty", "score_positive"))
      // a SECOND refusal lands beside the first (v=1 repeats — attempt
      // counter disambiguates), nothing overwritten
      intercept[IllegalArgumentException] {
        Lake.publishVersion(
          Seq(("b-2", "g0", "", -9.0)).toDF("id", "k", "text", "score"),
          root, Seq("k"), Seq("id"), 1000L,
          expect = expectations, onViolation = "drop")
      }
      assert(Lake.readRefusedQuarantine(spark, root)
        .select("id").as[String].collect().toSet === Set("b-1", "b-2"))
    } finally cleanup(root)
  }

  test("streaming full-publish poison batch in drop mode: the batch is " +
      "skipped with the audit preserved and the stream ADVANCES — replay " +
      "of the refused batch stays idempotent; fail mode still stops") {
    val root = tmp()
    try {
      def batchOf(rows: Seq[(String, String, String, Double)]) =
        rows.toDF("id", "k", "text", "score")
      // batch 0: clean publish; batch 1: poison (every row violates);
      // batch 2: clean again — the stream must reach it
      Lake.publishBatch(batchOf(corpus.filter(_._4 > 0).filter(_._3.nonEmpty)),
        root, Seq("k"), Seq("id"), 1000L, keep = 3, batchId = 0L,
        expect = expectations, onViolation = "drop")
      assert(Lake.currentVersion(spark, root) === Some(0L))
      Lake.publishBatch(batchOf(Seq(("p-1", "g0", "", -1.0))),
        root, Seq("k"), Seq("id"), 1000L, keep = 3, batchId = 1L,
        expect = expectations, onViolation = "drop") // must NOT throw
      assert(Lake.currentVersion(spark, root) === Some(0L)) // unchanged
      // crash-replay of the poison batch: same skip, same single audit
      Lake.publishBatch(batchOf(Seq(("p-1", "g0", "", -1.0))),
        root, Seq("k"), Seq("id"), 1000L, keep = 3, batchId = 1L,
        expect = expectations, onViolation = "drop")
      val refused = Lake.readRefusedQuarantine(spark, root)
      assert(refused.select("id").as[String].collect().toSeq === Seq("p-1"))
      assert(refused.select("_graft_refusal").as[String].head() === "m=1")
      // the stream advances past the poison batch
      Lake.publishBatch(batchOf(Seq(("c-1", "g1", "clean", 1.0))),
        root, Seq("k"), Seq("id"), 1000L, keep = 3, batchId = 2L,
        expect = expectations, onViolation = "drop")
      assert(Lake.currentVersion(spark, root) === Some(1L))
      // fail mode keeps poison-batch stop semantics (no skip, no audit
      // rewrite)
      intercept[IllegalArgumentException] {
        Lake.publishBatch(batchOf(Seq(("p-2", "g0", "", -1.0))),
          root, Seq("k"), Seq("id"), 1000L, keep = 3, batchId = 3L,
          expect = expectations, onViolation = "fail")
      }
      // refusal audits have a GC: vacuum retains the newest `keep`
      // refusals and prunes the rest, each with a visible ledger row
      for (b <- 4L to 7L)
        Lake.publishBatch(batchOf(Seq((s"p-$b", "g0", "", -1.0))),
          root, Seq("k"), Seq("id"), 1000L, keep = 3, batchId = b,
          expect = expectations, onViolation = "drop")
      val led = Lake.vacuum(spark, root, keep = 2)
        .filter(col("reason") === "refusal_audit")
        .select("v", "action").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(led === Map(7L -> "refused_retained", 6L -> "refused_retained",
        5L -> "refused_pruned", 4L -> "refused_pruned",
        1L -> "refused_pruned"), led.toString)
      assert(Lake.readRefusedQuarantine(spark, root)
        .select("_graft_refusal").as[String].collect().toSet ===
        Set("m=6", "m=7"))
    } finally cleanup(root)
  }

  test("a data column named _rel or _h is rejected before any write " +
      "when digests are on (it would silently corrupt the fingerprint)") {
    val root = tmp()
    try {
      val e = intercept[IllegalArgumentException] {
        Lake.publishVersion(
          Seq(("a-1", "g0", "x")).toDF("id", "k", "_rel"),
          root, Seq("k"), Seq("id"), 1000L, digest = true)
      }
      assert(e.getMessage.contains("_rel"))
      assert(!new java.io.File(s"$root/v=0").exists()) // nothing written
    } finally cleanup(root)
  }
}
