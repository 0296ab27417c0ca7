package graft.pipeline

import graft.SparkTestSession
import graft.plans.{RollingHash, WinnowFps}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprints (Schleimer et al. 2003 / MOSS): the deque
  * expression against a brute-force reference, the paper's local
  * guarantee, and the clone-pair detector over planted clones. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute-force reference: every window's argmin by (h asc, pos desc),
    * deduped, positions 1-based. */
  private def reference(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return Seq.empty
    val g = cps.length - k + 1
    val hs = (1 to g).map { p =>
      cps.slice(p - 1, p - 1 + k).foldLeft(0L)((h, c) =>
        (h * RollingHash.Base + c) % RollingHash.Mod)
    }
    val starts = 1 to math.max(1, g - w + 1)
    starts.map { i =>
      val win = (i to math.min(i + w - 1, g)).map(p => (p, hs(p - 1)))
      win.minBy { case (p, h) => (h, -p) }
    }.distinct.sortBy(_._1)
  }

  private def selected(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val arr = WinnowFps.select(UTF8String.fromString(s), k, w)
    if (arr == null) Seq.empty
    else (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      (row.getInt(0), row.getLong(1))
    }
  }

  test("deque selection equals brute-force reference on random strings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val n = 1 + rnd.nextInt(120)
      val s = (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val k = 2 + rnd.nextInt(4)
      val w = 2 + rnd.nextInt(8)
      assert(selected(s, k, w) == reference(s, k, w),
             s"trial $trial k=$k w=$w s=$s")
    }
  }

  test("shorter than k yields null; g < w selects the single global min") {
    assert(WinnowFps.select(UTF8String.fromString("abc"), 8, 16) == null)
    // 9 chars, k=8 -> 2 grams, w=16 -> single window, one fingerprint
    val sel = selected("abcdefghi", 8, 16)
    assert(sel.length == 1)
    assert(sel == reference("abcdefghi", 8, 16))
  }

  test("local guarantee: shared run of length >= w+k-1 shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    val k = 8; val w = 16
    for (_ <- 1 to 50) {
      val shared = (1 to (w + k - 1)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      def pad(n: Int) = (1 to n).map(_ => ('p' + rnd.nextInt(6)).toChar).mkString
      val a = pad(10 + rnd.nextInt(30)) + shared + pad(10 + rnd.nextInt(30))
      val b = pad(10 + rnd.nextInt(30)) + shared + pad(10 + rnd.nextInt(30))
      val fa = selected(a, k, w).map(_._2).toSet
      val fb = selected(b, k, w).map(_._2).toSet
      assert((fa intersect fb).nonEmpty, s"a=$a b=$b")
    }
  }

  test("positions strictly increase; density is bounded by gram count") {
    val s = "the quick brown fox jumps over the lazy dog repeatedly and often"
    val sel = selected(s, 8, 16)
    assert(sel.map(_._1) == sel.map(_._1).sorted)
    assert(sel.map(_._1).distinct.length == sel.length)
    val g = s.codePointCount(0, s.length) - 8 + 1
    assert(sel.nonEmpty && sel.length <= g)
  }

  test("winnowFingerprints explodes the expression's selection") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789abcdefgh"))
      .toDF("doc_id", "text")
    val got = TextDedup.winnowFingerprints(df, "doc_id", "text")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == reference("abcdefghijklmnopqrstuvwxyz0123456789abcdefgh", 8, 16))
  }

  test("clone pairs: a planted near-clone is found, disjoint docs are not") {
    val base = "the training corpus deduplication pipeline removes near " +
      "duplicate documents by comparing winnowed fingerprints across pairs"
    val clone = base + " with a small suffix edit appended here"
    val other = "completely different content zone nine quartz vortex " +
      "whisky jazz umbrella keyboard mountain river ocean forest desert"
    val df = Seq((1L, base), (2L, clone), (3L, other)).toDF("doc_id", "text")
    val pairs = TextDedup.winnowClonePairs(df, "doc_id", "text", maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("overlap is in (0, 1] and shared <= min fingerprint count") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel kilo lima"),
      (3L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"))
      .toDF("doc_id", "text")
    val rows = TextDedup.winnowClonePairs(docs, "doc_id", "text",
                                          maxDf = 5, minShared = 1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val shared = r.getLong(2); val na = r.getLong(3); val nb = r.getLong(4)
      val ov = r.getDouble(5)
      assert(shared <= math.min(na, nb))
      assert(ov > 0.0 && ov <= 1.0)
    }
    // identical docs 1 and 3: full overlap
    val full = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 3L).get
    assert(full.getDouble(5) == 1.0)
  }

  test("edit confirm: near-clone passes, sketch-similar-but-distant fails") {
    val base = "the training corpus deduplication pipeline removes near " +
      "duplicate documents by comparing winnowed fingerprints across pairs"
    val clone = base.replace("removes", "deletes")
    // shares verbatim runs with base (winnow candidates fire) but enough
    // of the text differs that it fails a 0.8 edit-similarity confirm
    val distant = "the training corpus deduplication pipeline goes zig " +
      "quartz vortex jazz umbrella keyboard winnowed fingerprints across pairs"
    val df = Seq((1L, base), (2L, clone), (3L, distant)).toDF("doc_id", "text")
    val cand = TextDedup.winnowClonePairs(df, "doc_id", "text", maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)) && cand.contains((1L, 3L)))
    val out = TextDedup.editConfirmedClones(df, "doc_id", "text", maxDf = 3,
                                            minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) > 0.9)
    assert(!out.contains((1L, 3L)))
  }
}
