package graft.pipeline

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based invariants for the round-11 curation operators, run
  * against real Spark plans on generated corpora:
  *  - span removal conserves tokens (kept + removed = input count) and
  *    never removes from a corpus of all-distinct documents built from
  *    disjoint vocabularies;
  *  - the chunker covers every token exactly (concatenating the
  *    non-overlapped prefixes of each chunk reconstructs the document);
  *  - budget selection's ledger is internally consistent: ranks are a
  *    permutation, the running total matches the rank order, and the
  *    kept set is exactly the prefix within budget.
  */
object CuratePropertiesSpec extends Properties("graft.curate") {

  private lazy val spark = SparkTestSession.spark

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november")

  private val doc: Gen[String] =
    Gen.choose(3, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("span removal conserves tokens: kept + removed = input") =
    Prop.forAll(Gen.listOfN(6, doc)) { texts =>
      import spark.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("doc_id", "text")
      val out = TextDedup.removeDuplicatedSpans(df, "doc_id", "text", n = 4)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val n = t.split(" ").length
        val (kept, removed) = out(i.toLong)
        kept + removed == n
      }
    }

  property("span removal: disjoint-vocabulary docs lose nothing") =
    Prop.forAll(Gen.choose(2, 5)) { k =>
      import spark.implicits._
      // doc i uses tokens only it owns -> no cross-document gram can
      // repeat -> every doc passes through byte-identical
      val rows = (0 until k).map(i =>
        (i.toLong, (0 until 10).map(j => s"w${i}_$j").mkString(" ")))
      val df = rows.toDF("doc_id", "text")
      val out = TextDedup.removeDuplicatedSpans(df, "doc_id", "text", n = 4)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      rows.forall { case (id, t) => out(id) == t }
    }

  property("chunker coverage: stride-prefixes reconstruct the document") =
    Prop.forAll(doc) { text =>
      import spark.implicits._
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val out = TextAnalysis.chunkDocuments(df, "doc_id", "text",
                                            window = 8, stride = 5)
        .collect().sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getString(3), r.getLong(4))).toSeq
      val toks = text.split(" ").toSeq
      // each chunk contributes its first `stride` tokens (the last one
      // contributes everything it has): concatenation = the document
      val rebuilt = out.zipWithIndex.flatMap { case ((_, chunk, _), i) =>
        val ts = chunk.split(" ").toSeq
        if (i == out.length - 1) ts else ts.take(5)
      }
      val begins = out.map(_._1) == out.indices.map(i => 1L + i * 5).toSeq
      rebuilt == toks && begins
    }

  property("budget ledger: ranks are a permutation, cumsum consistent, prefix kept") =
    Prop.forAll(Gen.listOfN(6, doc), Gen.choose(10L, 120L)) { (texts, budget) =>
      import spark.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("doc_id", "text")
      val out = TextAnalysis.selectUnderBudget(df, "doc_id", "text", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
                             r.getLong(4), r.getLong(5)))
      val byRank = out.sortBy(_._3)
      val perm = byRank.map(_._3).toSeq == (1 to out.length).map(_.toLong)
      val cums = byRank.scanLeft(0L)(_ + _._2).tail
      val cumOk = byRank.map(_._4).toSeq == cums.toSeq
      val prefixOk = byRank.forall(r => (r._5 == 1L) == (r._4 <= budget))
      perm && cumOk && prefixOk
    }
}
