package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, md5}
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 curation additions: duplicated-span removal (the rewrite
  * twin of the span audit), Kneser-Ney bigram perplexity, and the
  * sliding-window chunker. */
class CurateOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- removeDuplicatedSpans -------------------------------------------

  test("span removal cuts exactly the cross-document duplicated n-gram coverage") {
    // docs 1 and 2 share an 8-token prefix; their suffixes differ.
    val shared = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$shared one two three"),
      (2L, s"$shared four five six"),
      (3L, "totally different words that never repeat anywhere at all")
    ).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // only the shared 8-gram "a b c d e f g h" has df > 1: it covers
    // positions 1-8 of docs 1 and 2; the unique continuation grams
    // (e.g. "b c d e f g h one") occur once each and remove nothing.
    assert(out(1L) == (("one two three", 3L, 8L)))
    assert(out(2L) == (("four five six", 3L, 8L)))
    assert(out(3L) == (("totally different words that never repeat anywhere at all", 9L, 0L)))
  }

  test("fully-duplicated documents clean to the empty string, not a missing row") {
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L), "every input doc must emit a row")
    assert(out(1L) == (("", 0L, 10L)) && out(2L) == (("", 0L, 10L)))
  }

  test("docs shorter than n pass through unchanged (no grams, no coverage)") {
    val docs = Seq((1L, "short doc"), (2L, "short doc")).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "short doc", 2L -> "short doc"))
  }

  test("overlapping duplicated grams merge their coverage (no double-count)") {
    // a 9-token shared run carries two overlapping duplicated 8-grams
    // covering positions 1-9 as a SET, so exactly 9 tokens go.
    val run = "a b c d e f g h i"
    val docs = Seq((1L, s"$run tailone"), (2L, s"$run tailtwo")).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("tailone", 1L, 9L)))
    assert(out(2L) == (("tailtwo", 1L, 9L)))
  }

  // ---- knPerplexity ----------------------------------------------------

  test("KN bigram scores match a by-hand model on a 3-doc corpus") {
    val docs = Seq(
      (1L, "x y x y"),   // bigrams: (x,y) (y,x) (x,y)
      (2L, "x y z"),     // bigrams: (x,y) (y,z)
      (3L, "z")          // < 2 tokens -> no row
    ).toDF("doc_id", "text")
    // counts: c(x,y)=3 c(y,x)=1 c(y,z)=1; c1(x)=3,n1f(x)=1; c1(y)=2,n1f(y)=2
    // n1b(y)=1 n1b(x)=1 n1b(z)=1; B=3
    def sE3(c: Long, c1: Long, n1f: Long, n1b: Long, b: Long): Long =
      math.round(math.log((4.0 * c1 * b) /
        ((4 * c - 3) * b + 3.0 * n1f * n1b)) * 1000.0)
    val sXY = sE3(3, 3, 1, 1, 3)  // p = (9*3+3)/(36) = 30/36
    val sYX = sE3(1, 2, 2, 1, 3)  // p = (1*3+6)/(24) = 9/24
    val sYZ = sE3(1, 2, 2, 1, 3)
    val out = TextAnalysis.knPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(1L, 2L), "sub-bigram docs emit nothing")
    assert(out(1L) == ((3L, 2 * sXY + sYX)))
    assert(out(2L) == ((2L, sXY + sYZ)))
  }

  test("KN separates templated repetition from token-salad at equal unigram mix") {
    // both docs use the same unigram bag; doc 1 repeats one bigram
    // pattern, doc 2 scrambles pairings. The bigram model must rank
    // doc 2 (unseen-pair-heavy) above doc 1.
    val docs = Seq(
      (1L, "a b a b a b a b a b a b"),
      (2L, "a a b b a b b a a b a b")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.knPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(2L) > out(1L),
           s"scrambled doc must carry higher KN perplexity: $out")
  }

  // ---- selectUnderBudget ----------------------------------------------

  test("budget selection keeps the greedy quality prefix, exact rank and cumsum") {
    // quality_score = stop_ratio/2 + avg_token_len/20: doc 1 (all
    // stopwords) ranks first, doc 3 (long words) next, doc 2 last.
    val docs = Seq(
      (1L, "the a and of is"),
      (2L, "zz yy xx"),
      (3L, "marvelous extraordinary considerations")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.selectUnderBudget(docs, "doc_id", "text", budgetTokens = 8L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out(1L) == ((1L, 5L, 1L)), s"doc 1 first, 5 tokens, kept: $out")
    assert(out(3L) == ((2L, 8L, 1L)), s"doc 3 second, cum 8, kept: $out")
    assert(out(2L) == ((3L, 11L, 0L)), s"doc 2 last, over budget: $out")
  }

  test("budget prefix is the contract: a later smaller doc does not sneak in") {
    // rank order by quality; the 10-token doc overflows the budget and
    // the lower-ranked 1-token doc must NOT be selected even though it
    // would fit.
    val docs = Seq(
      (1L, "the the the the the the the the the the"), // 10 stopword tokens, top score
      (2L, "the a and of is the a and of is"),         // 10 tokens, same-ish high score
      (3L, "zz")                                       // 1 token, lowest score
    ).toDF("doc_id", "text")
    val out = TextAnalysis.selectUnderBudget(docs, "doc_id", "text", budgetTokens = 12L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(5)))
    val sel = out.filter(_._3 == 1L).map(_._1).toSet
    val ranks = out.map(t => t._1 -> t._2).toMap
    assert(ranks(3L) == 3L, "lowest-score doc ranks last")
    assert(!sel.contains(3L), "prefix semantics: the small late doc stays out")
    assert(sel.size == 1, s"only the top doc fits 12 tokens: $out")
  }

  // ---- packCurriculum --------------------------------------------------

  test("pack curriculum aggregates exact surprisal mass per pack and bands it") {
    val docs = Seq(
      (1L, "aa aa aa aa"),          // common tokens -> low surprisal
      (2L, "aa aa aa bb"),
      (3L, "qq ww ee rr")           // singletons -> high surprisal
    ).toDF("doc_id", "text")
    val out = TextAnalysis.packCurriculum(docs, "doc_id", "text")
    val rows = out.collect()
    // per-pack token mass equals the member docs' token counts
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == 12L)
    // difficulty = sum_e3 / tokens, band = floor(difficulty/250)
    rows.foreach { r =>
      val d = r.getAs[Double]("difficulty_e3")
      assert(math.abs(d - r.getAs[Long]("sum_surprisal_e3").toDouble /
                          r.getAs[Long]("n_tokens")) < 1e-3)
      assert(r.getAs[Long]("band") == math.floor(d / 250).toLong)
    }
    // the independent lmSurprisal ledger reproduces each pack's sums
    val perDoc = TextAnalysis.lmSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.map(_.getAs[Long]("sum_surprisal_e3")).sum == perDoc.values.sum)
  }

  // ---- normalizeDocs ---------------------------------------------------

  test("NFC normalization composes decomposed accents and collapses spaces") {
    val nfc = "caf\u00e9 du monde"                  // precomposed, collapsed
    val docs = Seq(
      (1L, "cafe\u0301 du  monde"),                 // combining acute + double space
      (2L, nfc),                                    // already NFC
      (3L, "\u6c49\u5b57 unchanged"),               // CJK: NFC identity
      (4L, "  padded  ")                            // trim + collapse only
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((nfc, 13L, 1L)),
           s"decomposed input must compose AND collapse: ${out(1L)}")
    assert(out(2L) == ((nfc, 13L, 0L)), "already-NFC: untouched")
    assert(out(3L) == (("\u6c49\u5b57 unchanged", 12L, 0L)))
    assert(out(4L) == (("padded", 6L, 1L)))
    // the normalized twins now share an md5 fingerprint — the reason
    // this pass runs before any hash-keyed dedup
    val fps = TextAnalysis.normalizeDocs(docs, "doc_id", "text")
      .select(col("doc_id"), md5(col("norm_text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L), "composed twins must share the content hash")
  }

  // ---- chunkDocuments --------------------------------------------------

  test("chunker tiles with the contracted overlap; last chunk short; no suffix-only chunk") {
    val toks = (1 to 80).map(i => s"t$i")
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text", window = 32, stride = 24)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    // n=80: 1 + ceil(48/24) = 3 chunks at 1, 25, 49
    assert(out.map(x => (x._1, x._2, x._4)).toSeq ==
           Seq((0L, 1L, 32L), (1L, 25L, 32L), (2L, 49L, 32L)))
    assert(out(0)._3 == toks.slice(0, 32).mkString(" "))
    assert(out(2)._3 == toks.slice(48, 80).mkString(" "))
  }

  test("chunker emits one whole-doc chunk for docs at or under the window") {
    val docs = Seq((1L, "a b c"), (2L, (1 to 32).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text", window = 32, stride = 24)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
    assert(out.toMap == Map(1L -> ((0L, 1L, 3L)), 2L -> ((0L, 1L, 32L))))
    assert(out.length == 2)
  }

  test("chunker boundary: n = window + 1 yields exactly one extra short chunk") {
    val toks = (1 to 33).map("w" + _)
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text", window = 32, stride = 24)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, 1L, 32L), (1L, 25L, 9L)))
  }

  // ---- removeDuplicateLines (CCNet-style boilerplate pass) -------------

  test("line dedup removes exactly the lines shared by >= minDf docs, order kept") {
    val boiler = "accept our cookies"
    val docs = Seq(
      (1L, s"alpha one\n$boiler\nalpha two"),
      (2L, s"beta one\n$boiler\nbeta two"),
      (3L, s"$boiler\ngamma only line"),
      (4L, "delta stands alone\ndelta second line")
    ).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicateLines(docs, "doc_id", "text", minDocFrequency = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == (("alpha one\nalpha two", 3L, 1L, true)))
    assert(out(2L) == (("beta one\nbeta two", 3L, 1L, true)))
    assert(out(3L) == (("gamma only line", 2L, 1L, true)))
    assert(out(4L) == (("delta stands alone\ndelta second line", 2L, 0L, false)))
  }

  test("line dedup: within-doc repetition counts once; blank lines never removed") {
    // "spam" repeats 3x inside doc 1 but exists in only 2 DISTINCT docs,
    // so at minDf = 3 it survives; the blank line appears in all 3 docs
    // and still survives (structure, not content).
    val docs = Seq(
      (1L, "spam\nspam\nspam\n\nkeep a"),
      (2L, "spam\n\nkeep b"),
      (3L, "other\n\nkeep c")
    ).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicateLines(docs, "doc_id", "text", minDocFrequency = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out(1L) == (("spam\nspam\nspam\n\nkeep a", 0L)))
    assert(out(2L) == (("spam\n\nkeep b", 0L)))
    assert(out(3L) == (("other\n\nkeep c", 0L)))
  }

  test("line dedup: a doc that is ALL boilerplate keeps its row with empty text") {
    val docs = Seq(
      (1L, "same line"), (2L, "same line"), (3L, "same line"),
      (4L, "unique content here")
    ).toDF("doc_id", "text")
    val out = TextDedup.removeDuplicateLines(docs, "doc_id", "text", minDocFrequency = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 4)
    assert(out(1L) == (("", 1L, 1L)))
    assert(out(4L) == (("unique content here", 1L, 0L)))
  }

  // ---- containmentPairs (asymmetric quoted-inside dedup) ---------------

  test("containment flags a short doc quoted inside a long one; jaccard would not") {
    // doc 1 = 10 words, fully embedded in doc 2 (30 words). Trigram
    // containment(1 -> 2) = 1.0 while Jaccard is far below any dedup
    // threshold — the case this operator exists for.
    val quoted = (1 to 10).map("q" + _).mkString(" ")
    val filler = (1 to 20).map("f" + _).mkString(" ")
    val docs = Seq(
      (1L, quoted),
      (2L, s"$filler $quoted"),
      (3L, (1 to 15).map("z" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, "doc_id", "text", tau = 0.8, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
    // the reverse direction (2 contained in 1) must NOT appear: doc 2
    // has 28 trigrams, only 8 shared.
  }

  test("containment: exact duplicates appear in BOTH directions at 1.0") {
    val text = (1 to 12).map("w" + _).mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, "doc_id", "text", tau = 0.8, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("containment df cap: pairs sharing only capped grams are not candidates") {
    // every doc shares the same 3 words (one trigram) — with maxDf = 2
    // that gram is capped, so no candidates survive even though the
    // intersection is nonempty.
    val docs = Seq(
      (1L, "shared tri gram plus alpha beta"),
      (2L, "shared tri gram plus gamma delta"),
      (3L, "shared tri gram plus epsilon zeta")
    ).toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, "doc_id", "text",
                                         tau = 0.1, n = 3, maxDf = 2)
    // "shared tri gram", "tri gram plus" have df = 3 > 2 (capped);
    // the "gram plus X" trigrams are unique per doc. No candidates.
    assert(out.count() == 0)
  }

  test("containment confirm counts CAPPED grams: reported value is the full intersection") {
    // Pair (1,2) shares 2 capped trigrams (df = 3 > maxDf = 2) AND
    // 2 rare ones: i_rare = 2 but the true intersection is 4 of
    // doc 1's 5 trigrams = 0.8. The candidate bound must keep the
    // pair (i_rare + cap_min = 4 >= 0.8*5) and the confirm pass must
    // report 0.8, not the rare-only 0.4 — pinning that the reported
    // containment is over FULL shingle sets, exactly as documented.
    val docs = Seq(
      (1L, "c1 c2 c3 c4 r1 r2 r3"),
      (2L, "c1 c2 c3 c4 r1 r2 r4"),
      (3L, "c1 c2 c3 c4 x1 x2 x3")
    ).toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(docs, "doc_id", "text",
                                         tau = 0.8, n = 3, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // (1,3) shares ONLY capped grams — never a candidate, absent even
    // though its true containment (0.4) is well-defined.
    assert(out.toSeq == Seq((1L, 2L, 0.8), (2L, 1L, 0.8)))
  }

  // ---- jaccardJoinExact (prefix-filtered exact-threshold join) ---------

  test("jaccardJoinExact: finds exactly the pairs >= tau, with exact J") {
    import spark.implicits._
    val a = (1 to 12).map(i => s"w$i").mkString(" ")          // 10 trigrams
    val b = (1 to 11).map(i => s"w$i").mkString(" ") + " zz"  // 9 shared + 1
    val c = (50 to 62).map(i => s"w$i").mkString(" ")         // disjoint
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = TextDedup.jaccardJoinExact(docs, "doc_id", "text",
        tau = 0.5, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // J(a,b): |A|=10, |B|=10, shared trigrams w1..w9 window = 9
    //   ... b's trigrams: w1_w2_w3..w9_w10_w11 (9 of a's) + w10_w11_zz
    //   i = 9, union = 11 -> J = 0.818182
    assert(got.keySet == Set((1L, 2L)))
    val (na, nb, i, j) = got((1L, 2L))
    assert(na == 10L && nb == 10L && i == 9L)
    assert(math.abs(j - 9.0 / 11) < 1e-6)
  }

  test("jaccardJoinExact: recall is exact — agrees with brute force on a dup-planted corpus") {
    import spark.implicits._
    val base = Seq("alpha bravo charlie delta echo foxtrot golf hotel",
                   "india juliet kilo lima mike november oscar papa",
                   "quebec romeo sierra tango uniform victor whiskey xray")
    // plant near-dups: drop or swap one word
    val rows = base.zipWithIndex.flatMap { case (t, i) =>
      val ws = t.split(" ")
      Seq((i * 10L, t),
          (i * 10L + 1, ws.init.mkString(" ")),
          (i * 10L + 2, t))
    }
    val docs = rows.toDF("doc_id", "text")
    val tau = 0.6
    val got = TextDedup.jaccardJoinExact(docs, "doc_id", "text", tau, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over distinct bigram sets
    def grams(t: String): Set[String] =
      t.split(" ").sliding(2).map(_.mkString("_")).toSet
    val brute = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      sa = grams(ta); sb = grams(tb)
      i = (sa & sb).size
      j = BigDecimal(i.toDouble / (sa.size + sb.size - i))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= tau
    } yield (ia, ib)).toSet
    assert(got == brute && brute.nonEmpty)
  }
}
