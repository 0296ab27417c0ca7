package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the BPE paper's classic corpus: low×5 lower×2 newest×6 widest×3
  private lazy val classic = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread across docs so doc structure is irrelevant to training
    words.grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
  }

  test("bpeTrain learns the paper's merges under the deterministic tie rule") {
    val merges = Bpe.bpeTrain(classic, "doc_id", "text", 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // hand-computed: es (9, tie with st broken left-asc), est (9),
    // lo (7, tie with ow broken left-asc), low (7)
    assert(merges.toSeq == Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L)), s"merges: ${merges.toSeq}")
  }

  test("greedy left-to-right overlap: aaaa merges to aa aa, then aaaa") {
    val df = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val t1 = Bpe.bpeTrainState(df, "doc_id", "text", 1, minPairFreq = 1L)
    val m1 = t1.merges.collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(m1.toSeq == Seq(("a", "a", 3L)), s"pair stats count overlaps: ${m1.toSeq}")
    val seg1 = t1.wordSegs.orderBy("pos").collect().map(_.getAs[String]("sym"))
    assert(seg1.toSeq == Seq("aa", "aa"), s"non-overlapping merge: ${seg1.toSeq}")
    val t2 = Bpe.bpeTrainState(df, "doc_id", "text", 2, minPairFreq = 1L)
    val seg2 = t2.wordSegs.orderBy("pos").collect().map(_.getAs[String]("sym"))
    assert(seg2.toSeq == Seq("aaaa"), s"second merge fuses the halves: ${seg2.toSeq}")
  }

  test("native bpe_encode replays the training state on every corpus word") {
    val trained = Bpe.bpeTrainState(classic, "doc_id", "text", 4)
    val rules = Bpe.rulesOf(trained.merges)
    assert(rules == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val want = trained.wordSegs.orderBy("w", "pos").collect()
      .groupBy(_.getAs[String]("w"))
      .view.mapValues(_.sortBy(_.getAs[Int]("pos")).map(_.getAs[String]("sym")).toSeq)
      .toMap
    val got = Bpe.bpeSegment(
        Seq((1L, "low"), (2L, "lower"), (3L, "newest"), (4L, "widest"))
          .toDF("doc_id", "text"), "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got(1L) == want("low") && got(2L) == want("lower") &&
           got(3L) == want("newest") && got(4L) == want("widest"),
           s"native apply must equal training state: $got vs $want")
  }

  test("unseen words segment by partial merges; whole docs flatten in order") {
    val trained = Bpe.bpeTrain(classic, "doc_id", "text", 4)
    val rules = Bpe.rulesOf(trained)
    val out = Bpe.bpeSegment(
        Seq((1L, "lowest slowest low"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"),
        "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    // lowest: es→est→lo→low leaves [low, est]; slowest: s low est
    assert(out(1L) == Seq("low", "est", "s", "low", "est", "low"),
           s"doc 1: ${out(1L)}")
    assert(out(2L).isEmpty && out(3L).isEmpty, "token-less docs give empty arrays")
  }

  test("bpeEncodeIds: subword ranks in order, OOV hits the reserved slot") {
    val trained = Bpe.bpeTrain(classic, "doc_id", "text", 4)
    val rules = Bpe.rulesOf(trained)
    val docs = Seq((1L, "low lowest newest")).toDF("doc_id", "text")
    // corpus vocab over `classic`: est(9) w(11)... compute from the data
    val vocab = Bpe.bpeVocabulary(classic, "doc_id", "text", rules, topK = 3)
    val top = vocab.orderBy("rank").collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("rank"))).toMap
    val out = Bpe.bpeEncodeIds(docs, "doc_id", "text", rules, vocab)
      .collect().map(r => (r.getSeq[Long](1).toSeq, r.getLong(2), r.getLong(3))).head
    // low lowest newest → [low][low est][n e w est]: 7 subwords
    assert(out._2 == 7L, s"subword count: $out")
    val ids = out._1
    assert(ids.length == 7)
    // every id outside the top-3 vocab is the OOV slot 0
    assert(out._3 == ids.count(_ == 0L).toLong)
    // the est occurrences carry est's rank wherever est is in vocab
    top.get("est").foreach { r =>
      assert(ids(2) == r && ids(6) == r, s"est rank $r in $ids") }
  }

  test("materializePacksBpe: pack chain holds on subword ids, over-long docs truncate") {
    val trained = Bpe.bpeTrain(classic, "doc_id", "text", 4)
    val rules = Bpe.rulesOf(trained)
    val docs = Seq(
      (1L, Seq.fill(12)("low").mkString(" ")),   // 12 subwords > maxBucket 8
      (2L, "newest widest"),                     // 2 + 2... subwords
      (3L, "low lower")
    ).toDF("doc_id", "text")
    val vocab = Bpe.bpeVocabulary(classic, "doc_id", "text", rules, topK = 10)
    val out = Bpe.materializePacksBpe(docs, "doc_id", "text", rules, vocab,
        contextLen = 32, minBucket = 8, maxBucket = 8, nShards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(t => (t._1, t._2)).distinct.length == out.length,
           "no (pack, pos) collisions")
    val longDoc = out.filter(_._4 == 1L)
    assert(longDoc.length == 8, s"over-long doc truncated to bucket: ${longDoc.length}")
    val enc = Bpe.bpeEncodeIds(docs, "doc_id", "text", rules, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    out.groupBy(_._4).foreach { case (doc, cells) =>
      val sorted = cells.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == enc(doc).take(sorted.length),
             s"doc $doc ids must be the encoding prefix")
      val base = sorted.head._2
      assert(base % 8 == 0 &&
             sorted.map(_._2).toSeq == (base until base + sorted.length).toSeq,
             s"doc $doc contiguous from a slot boundary")
    }
  }
}
