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

  test("batched trainer with batchSize = 1 reproduces the sequential trainer") {
    // the degenerate case pins the batching rule to the textbook
    // recursion: a batch of one is always the global argmax
    val seq4 = Bpe.bpeTrain(classic, "doc_id", "text", 4)
      .orderBy("rank").collect().map(_.toString).toSeq
    val bat4 = Bpe.bpeTrainBatched(classic, "doc_id", "text",
                                   nPasses = 4, batchSize = 1)
      .orderBy("rank").collect().map(_.toString).toSeq
    assert(bat4 == seq4, s"batchSize=1 must equal sequential:\n$bat4\nvs\n$seq4")
  }

  test("one batched pass selects exactly the locally-maximal disjoint pairs") {
    // hand-computed over the classic corpus's pair table: es(9) beats
    // everything sharing e or s; lo(7) beats ow(7) on the l<o tie and
    // owns l outright; every other pair loses its symbol group to one
    // of those or to a non-selected dominator (st loses s to es, we
    // loses e to es, id loses d to de which itself loses e to es)
    val m = Bpe.bpeTrainBatched(classic, "doc_id", "text",
                                nPasses = 1, batchSize = 8)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(m.toSeq == Seq((1L, "e", "s", 9L), (2L, "l", "o", 7L)),
           s"locally-maximal batch: ${m.toSeq}")
    // and the selected rules are pairwise symbol-disjoint by construction
    val symsets = m.map(t => Set(t._2, t._3))
    for (i <- symsets.indices; j <- symsets.indices if i < j)
      assert(symsets(i).intersect(symsets(j)).isEmpty, "batch not disjoint")
  }

  test("batched passes converge to the sequential rule SET on the classic corpus") {
    // order differs across batches (a batch commits lower-count rules
    // before the next pass's recount) but the learned vocabulary of a
    // saturated run must coincide
    val seqSet = Bpe.bpeTrain(classic, "doc_id", "text", 8)
      .collect().map(_.getAs[String]("merged")).toSet
    val batSet = Bpe.bpeTrainBatched(classic, "doc_id", "text",
                                     nPasses = 8, batchSize = 4)
      .collect().map(_.getAs[String]("merged")).toSet
    assert(seqSet.subsetOf(batSet) || batSet.subsetOf(seqSet) || seqSet == batSet,
           s"divergent vocabularies:\nseq $seqSet\nbat $batSet")
  }

  // ("incremental trainer" parity tests removed in r15 with the
  // trainer itself — see Bpe.scala's retirement note; the maintained
  // pair-count machinery is now pinned by the append-ingestion
  // parity test below)

  test("byte-level trainer: hex byte symbols, pretokenized words, space prefix") {
    // "aa aa aa" pretokenizes to "aa", " aa", " aa" → hex words
    // 6161 (freq 1) and 206161 (freq 2); byte-pair (61,61) counts 3,
    // (20,61) counts 2 but loses symbol 61 to the maximum, so pass 1
    // learns only 6161; pass 2 then fuses the space prefix
    val df = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    val m = Bpe.bpeTrainBytes(df, "doc_id", "text", nPasses = 2, batchSize = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq(
      (1L, "61", "61", "6161", 3L),
      (2L, "20", "6161", "206161", 2L)), s"byte merges: ${m.toSeq}")
  }

  test("byte-level trainer decomposes multibyte UTF-8 into byte symbols") {
    // "éé" is C3A9 C3A9 — the most frequent byte pair inside the token
    // is (C3,A9) with one count per é; the learned merge is a byte
    // sequence no codepoint tokenizer could produce
    val df = Seq((1L, "éé éé")).toDF("doc_id", "text")
    val m = Bpe.bpeTrainBytes(df, "doc_id", "text", nPasses = 1, batchSize = 1,
                              minPairFreq = 1L)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(m.toSeq == Seq(("C3", "A9", 4L)), s"utf-8 byte merge: ${m.toSeq}")
  }

  test("byte-level apply: native bpe_encode_bytes segments by hand; byte-lossless round-trip") {
    val df = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    val rules = Bpe.rulesOf(
      Bpe.bpeTrainBytes(df, "doc_id", "text", nPasses = 2, batchSize = 4))
    // pretokens "aa", " aa", " aa" → hex 6161 / 20 61 61; rule 1 fuses
    // 61+61, rule 2 fuses the space prefix (the trainer test's merges)
    val syms = Bpe.bpeSegmentBytes(df, "doc_id", "text", rules)
      .select(col("syms")).head().getSeq[String](0)
    assert(syms == Seq("6161", "206161", "206161"), s"byte segmentation: $syms")
    // spaces ride INSIDE pretokens, so unhex(concat(syms)) == text —
    // byte-lossless on arbitrary unicode, and unseen bytes decompose
    // to byte symbols instead of UNK
    val uni = Seq((1L, "éé  naïve café!"), (2L, "aa aa aa"), (3L, "添añ😀"))
      .toDF("doc_id", "text")
    val rt = Bpe.bpeSegmentBytes(uni, "doc_id", "text", rules)
      .select(col("doc_id"),
              decode(unhex(concat_ws("", col("syms"))), "UTF-8").as("rt"))
      .join(uni, Seq("doc_id")).collect()
    assert(rt.nonEmpty && rt.forall(r =>
             r.getAs[String]("rt") == r.getAs[String]("text")),
           s"byte round-trip must be lossless: ${rt.toSeq}")
  }

  test("byte-level apply equals the batched training state on every corpus word") {
    val st = Bpe.bpeTrainBytesState(classic, "doc_id", "text",
                                    nPasses = 3, batchSize = 4)
    val rules = Bpe.rulesOf(st.merges)
    val words = st.wordSegs.select(col("w")).distinct()
      .select(col("w"), decode(unhex(col("w")), "UTF-8").as("wtxt"))
    val native = Bpe.bpeSegmentRowsBytes(words, "w", "wtxt", rules)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val state = st.wordSegs.select(col("w"), col("pos"), col("sym"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getAs[Number]("pos").longValue(), r.getString(2)))
      .toSet
    assert(native == state,
           s"native byte apply must replay the training state:\n native=$native\n state=$state")
    st.wordSegs.unpersist()
  }

  test("byte-level ids round-trip EXACTLY — whitespace included — at full vocab") {
    val docs = Seq((1L, "low  loweré newest"), (2L, " widest  low! 42 "))
      .toDF("doc_id", "text")
    val rules = Bpe.rulesOf(
      Bpe.bpeTrainBytes(docs, "doc_id", "text", nPasses = 2, batchSize = 4,
                        minPairFreq = 1L))
    val vocab = Bpe.bpeVocabularyBytes(docs, "doc_id", "text", rules, topK = 10000)
    val enc = Bpe.bpeEncodeIdsBytes(docs, "doc_id", "text", rules, vocab)
    val vp = vocab.select(col("rank"), col("sym")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val rt = Bpe.bpeDecode(enc, "doc_id", "ids", vp, oovSym = "EFBFBD")
      .join(docs, Seq("doc_id"))
      .select(col("text_rt"), hex(encode(col("text"), "UTF-8")).as("want"))
      .collect()
    assert(rt.length == 2 && rt.forall(r => r.getString(0) == r.getString(1)),
           s"byte ids must round-trip the raw text exactly: ${rt.toSeq}")
  }

  test("tokenizerFertility: counts line up across streams; empty docs keep null ratios") {
    val docs = Seq((1L, "low low"), (2L, "")).toDF("doc_id", "text")
    val cp = Seq(("l", "o"))          // lo w | lo w
    val by = Seq.empty[(String, String)] // no merges: one symbol per byte
    val out = Bpe.tokenizerFertility(docs, "doc_id", "text", cp, by)
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3), d1.getLong(4)) ==
             ((7L, 2L, 4L, 7L)), s"counts: $d1")
    assert(d1.getLong(5) == 2000000L && d1.getLong(6) == 1000000L,
           s"fertility ratios: $d1")
    val d2 = out(2L)
    assert((d2.getLong(1), d2.getLong(2), d2.getLong(3), d2.getLong(4)) ==
             ((0L, 0L, 0L, 0L)) && d2.isNullAt(5) && d2.isNullAt(6),
           s"empty doc: zero counts, null ratios: $d2")
  }

  test("bpeDecode: full-vocab round-trip is lossless; OOV ids surface as the marker") {
    val rules = Bpe.rulesOf(Bpe.bpeTrain(classic, "doc_id", "text", 4))
    val fullVocab = Bpe.bpeVocabulary(classic, "doc_id", "text", rules, topK = 100)
    val enc = Bpe.bpeEncodeIds(classic, "doc_id", "text", rules, fullVocab)
    val vp = fullVocab.select(col("rank"), col("sym")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val rt = Bpe.bpeDecode(enc, "doc_id", "ids", vp)
      .join(classic, Seq("doc_id"))
      .select(col("doc_id"), col("text_rt"),
              translate(col("text"), " ", "").as("orig"))
      .collect()
    assert(rt.nonEmpty && rt.forall(r => r.getString(1) == r.getString(2)),
           s"no-OOV decode must reproduce the space-stripped text: ${rt.toSeq}")
    // a 1-symbol vocabulary forces OOV everywhere except that symbol
    val tiny = Bpe.bpeVocabulary(classic, "doc_id", "text", rules, topK = 1)
    val tinyPairs = tiny.select(col("rank"), col("sym")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val encT = Bpe.bpeEncodeIds(classic, "doc_id", "text", rules, tiny)
    val decT = Bpe.bpeDecode(encT, "doc_id", "ids", tinyPairs)
      .collect().map(_.getString(1))
    assert(decT.forall(_.contains("<unk>")),
           s"OOV ids must decode to the marker: ${decT.toSeq}")
  }

  test("append ingestion: maintained state equals the full recount over corpus+batch") {
    val merges = Bpe.bpeTrain(classic, "doc_id", "text", 4)
    // batch mixes KNOWN types (freq bumps: low, newest), a NEW type
    // sharing merge structure (lowest -> low est), and a NEW type
    // with no merges (xyz)
    val batch = Seq((100L, "low lowest newest"), (101L, "xyz low"))
      .toDF("doc_id", "text")
    val st0 = Bpe.bpeIngestState(classic, "doc_id", "text", merges)
    val appended = Bpe.bpeIngestAppend(st0, batch, "doc_id", "text")
    val recount = Bpe.bpeIngestState(
      classic.unionByName(batch), "doc_id", "text", merges)
    def adjRows(s: Bpe.BpeIngest) =
      s.adj.orderBy("w", "pos").collect().map(_.toString).toSeq
    def pcRows(s: Bpe.BpeIngest) =
      s.pairCounts.orderBy("l", "r").collect().map(_.toString).toSeq
    assert(adjRows(appended) == adjRows(recount),
           "appended adjacency must equal the recount")
    assert(pcRows(appended) == pcRows(recount),
           "appended pair counts must equal the recount")
    // the known-type delta really fired: 'low' freq rose 5 -> 7
    val lowFreq = appended.adj.filter(col("w") === "low" && col("pos") === 0)
      .collect().head.getAs[Long]("freq")
    assert(lowFreq == 7L, s"low freq after append: $lowFreq")
    st0.release(); appended.release(); recount.release()
  }
}
