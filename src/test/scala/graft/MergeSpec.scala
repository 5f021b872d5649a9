package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import Types._

/** Golden + property tests for the action-merge state machine, straight from
  * the reference semantics at rcache.py:196-222 (code, not comment —
  * SURVEY.md §7.3 risk 2).
  */
class MergeSpec extends AnyFunSuite {

  test("golden transition table (rcache.py:196-222)") {
    val cases = Seq(
      // (old, new) -> merged
      (None, Insert) -> Some(Insert),
      (None, Update) -> Some(Update),
      (None, Delete) -> Some(Delete),
      (Some(Insert), Delete) -> None,           // annihilate
      (Some(Insert), Update) -> Some(Insert),   // keeps insert, new payload
      (Some(Insert), Insert) -> Some(Insert),   // fallthrough
      (Some(Delete), Insert) -> Some(Update),
      (Some(Delete), Update) -> Some(Update),   // fallthrough (comment says error)
      (Some(Delete), Delete) -> Some(Delete),   // fallthrough
      (Some(Update), Insert) -> Some(Update),   // truncate heuristic
      (Some(Update), Update) -> Some(Update),
      (Some(Update), Delete) -> Some(Delete))
    for (((old, nw), want) <- cases)
      assert(Merge.mergeAction(old, nw) === want, s"old=$old new=$nw")
  }

  test("merge keeps the incoming after-image payload") {
    val a = ChangeEvent("t", "1", Insert, 10L, 1L, Map("v" -> "old"))
    val b = ChangeEvent("t", "1", Update, 20L, 2L, Map("v" -> "new"))
    val m = Merge.merge(Some(a), b).get
    assert(m.cdc_action === Insert)      // insert+update→insert
    assert(m.payload === Map("v" -> "new"))
    assert(m.cdc_ts === 20L && m.seq === 2L)
  }

  test("fold is incremental: fold(s1++s2) == fold stepwise (streaming parity)") {
    val rnd = new Random(42)
    val acts = Vector(Insert, Update, Delete)
    for (_ <- 1 to 2000) {
      val s = Vector.fill(rnd.nextInt(12) + 1)(acts(rnd.nextInt(3)))
      val cut = rnd.nextInt(s.length + 1)
      val (s1, s2) = s.splitAt(cut)
      val whole = Merge.foldActions(s)
      val stepwise = s2.foldLeft(Merge.foldActions(s1))(Merge.mergeAction)
      assert(whole === stepwise, s"seq=$s cut=$cut")
    }
  }

  test("UDAF fold is deterministic under partial-merge order and dup seqs") {
    // duplicate seq values: the secondary sort on the action string must make
    // the fold independent of nondeterministic partial-merge arrival order
    val changes = Vector(1L -> "insert", 2L -> "update", 2L -> "delete",
      3L -> "update")
    for (perm <- changes.permutations.take(24)) {
      val (left, right) = perm.splitAt(2)
      val buf = MergeActionAgg.merge(
        left.foldLeft(MergeActionAgg.zero)(MergeActionAgg.reduce),
        right.foldLeft(MergeActionAgg.zero)(MergeActionAgg.reduce))
      assert(MergeActionAgg.finish(buf) ===
        MergeActionAgg.finish(changes.foldLeft(MergeActionAgg.zero)(
          MergeActionAgg.reduce)), s"perm=$perm")
    }
  }

  test("insert-then-delete annihilates regardless of interleaved updates") {
    assert(Merge.foldActions(Seq(Insert, Update, Update, Delete)) === None)
    assert(Merge.foldActions(Seq(Insert, Delete)) === None)
    // but a fresh change after annihilation starts over
    assert(Merge.foldActions(Seq(Insert, Delete, Insert)) === Some(Insert))
    assert(Merge.foldActions(Seq(Insert, Delete, Delete)) === Some(Delete))
  }
}
