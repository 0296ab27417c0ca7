package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[UnigramLm.trainViterbiEm]] — hand-traced Viterbi-EM on corpora
  * small enough to run the DP by hand. */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("abab corpus: whole-word piece wins, emergent pruning, exact counts") {
    // words: abab (freq 2), ab (freq 1); initial candidate counts:
    // a=5 b=5 ab=5 (cost 1526 each), aba=ba=bab=abab=2 (cost 2442)
    // Viterbi: abab -> [abab] (2442 < ab+ab = 3052); ab -> [ab]
    // M: counts {abab: 2, ab: 1, a: 1, b: 1} (singles floored),
    // aba/ba/bab pruned. Iter 2 reproduces the same segmentation.
    val df = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val tr = UnigramLm.trainViterbiEm(df, "doc_id", "text",
      maxPieceLen = 4, maxWordLen = 8, iters = 2)
    val pieces = tr.pieces.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(pieces.keySet == Set("abab", "ab", "a", "b"), s"$pieces")
    assert(pieces("abab")._1 == 2L && pieces("ab")._1 == 1L)
    assert(pieces("a")._1 == 1L && pieces("b")._1 == 1L)
    // total 5: cost(abab) = round(ln(5/2)*1e3) = 916; others ln(5) = 1609
    assert(pieces("abab")._2 == 916L)
    assert(pieces("ab")._2 == 1609L)
    val segs = tr.wordPieces.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(segs == Set(("abab", 0L, "abab"), ("ab", 0L, "ab")), s"$segs")
  }

  test("tie rule: equal-cost splits pick the smallest split point") {
    // word "xy" with x, y, xy all count 1 after contrived corpus?
    // simpler: "xy xz": pieces x=2, y=1, z=1, xy=1, xz=1; total 6
    // cost: x = ln3 = 1099, y = z = xy = xz = ln6 = 1792
    // xy: [xy] = 1792 < [x,y] = 2891 -> xy; same for xz
    val df = Seq((1L, "xy xz")).toDF("doc_id", "text")
    val tr = UnigramLm.trainViterbiEm(df, "doc_id", "text",
      maxPieceLen = 2, maxWordLen = 4, iters = 1)
    val segs = tr.wordPieces.collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    assert(segs == Set(("xy", "xy"), ("xz", "xz")), s"$segs")
    // after M: {xy: 1, xz: 1, x: 1, y: 1, z: 1}
    val pieces = tr.pieces.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pieces == Map("xy" -> 1L, "xz" -> 1L, "x" -> 1L,
                         "y" -> 1L, "z" -> 1L), s"$pieces")
  }

  test("words beyond maxWordLen are excluded; every retained word segments fully") {
    val df = Seq((1L, "short waytoolongword ok")).toDF("doc_id", "text")
    val tr = UnigramLm.trainViterbiEm(df, "doc_id", "text",
      maxPieceLen = 3, maxWordLen = 6, iters = 1)
    val ws = tr.wordPieces.collect().map(_.getString(0)).toSet
    assert(ws == Set("short", "ok"), s"$ws")
    // segmentation tiles each word exactly: concatenating pieces in
    // pos order rebuilds the word
    val byW = tr.wordPieces.collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) =>
        w -> rows.sortBy(_.getLong(1)).map(_.getString(2)).mkString }
    assert(byW == Map("short" -> "short", "ok" -> "ok"), s"$byW")
  }
}
