package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different words appear in this text here")
  ).toDF("doc_id", "text")

  test("cdc chunks tile every document exactly; short docs are one chunk; empty docs vanish") {
    val texts = Seq(
      (1L, "x"),                              // shorter than the window
      (2L, "exactly fifteen"),                // len 15 < w = 16
      (3L, ("the quick brown fox " * 40).trim), // long, repeating
      (4L, ""),                               // empty -> no rows
      (5L, scala.util.Random.javaRandomToRandom(new java.util.Random(7))
             .alphanumeric.take(500).mkString)
    ).toDF("doc_id", "text")
    val chunks = TextDedup.cdcChunks(texts, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getInt(2), r.getInt(3))).toSeq
    assert(!chunks.exists(_._1 == 4L), "empty doc must emit no chunks")
    for ((id, len) <- Seq(1L -> 1, 2L -> 15)) {
      val c = chunks.filter(_._1 == id)
      assert(c == Seq((id, 1L, 1, len)), s"doc $id should be one whole-doc chunk: $c")
    }
    // tiling: per doc, spans are contiguous from 1 and sum to the length
    val lens = Map(3L -> ("the quick brown fox " * 40).trim.length, 5L -> 500)
    for ((id, total) <- lens) {
      val c = chunks.filter(_._1 == id).sortBy(_._2)
      assert(c.head._3 == 1, "first chunk starts at 1")
      c.sliding(2).foreach { case Seq(a, b) =>
        assert(b._3 == a._3 + a._4, s"doc $id: gap between chunks $a -> $b")
      case _ => }
      assert(c.map(_._4).sum == total, s"doc $id chunks must sum to the doc length")
      assert(c.forall(_._4 > 0))
    }
  }

  test("cdc boundaries resynchronize after an insertion (the reason CDC exists)") {
    // one sentence inserted near the front of a 1000-char doc: fixed-width
    // chunking shifts every later boundary (zero shared chunks after the
    // edit); content-defined boundaries depend only on the local window,
    // so the untouched tail re-aligns and its chunks hash identically
    val base = scala.util.Random.javaRandomToRandom(new java.util.Random(11))
      .alphanumeric.grouped(8).take(125).map(_.mkString).mkString(" ")
    val edited = base.substring(0, 100) + " INSERTED SENTENCE HERE " + base.substring(100)
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val byDoc = TextDedup.cdcChunks(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(4))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val shared = byDoc(1L) & byDoc(2L)
    assert(shared.size >= math.min(byDoc(1L).size, byDoc(2L).size) / 2,
      s"tail chunks must re-align after the edit: ${byDoc(1L).size}/${byDoc(2L).size} " +
      s"chunks, only ${shared.size} shared")
    // and chunk-level dedup sees exactly those shared contents as 2-doc rows
    val dd = TextDedup.chunkDedup(TextDedup.cdcChunks(df, "doc_id", "text"))
      .filter(col("n_docs") === 2).count()
    assert(dd == shared.size)
  }

  test("cdc maxLen clamp bounds every chunk; stateless mode is unclamped") {
    val long = ("z" * 2000) // pathological: no mask match in constant text region?
    val df = Seq((1L, long)).toDF("doc_id", "text")
    val clamped = TextDedup.cdcChunks(df, "doc_id", "text", maxLen = 100).collect()
    assert(clamped.forall(_.getInt(3) <= 100), "maxLen must bound every chunk")
    assert(clamped.map(_.getInt(3)).sum == 2000)
  }

  test("minhash+LSH finds exact and near duplicates, skips unrelated") {
    val sh = TextDedup.bigramShingles(docs, "doc_id", "text")
    val sig = TextDedup.minhashSignature(sh, 4)
    val pairs = TextDedup.candidatePairs(TextDedup.lshBands(sig, 4, 2))
    val jac = TextDedup.jaccard(sh, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((1L, 2L)) == 1.0)
    assert(jac.get((1L, 4L)).isEmpty && jac.get((2L, 4L)).isEmpty)
    // near-dup pair: 6 shared of 10 distinct bigrams = exactly 0.6
    jac.get((1L, 3L)).foreach(j => assert(j >= 0.6 && j < 1.0))
  }

  test("identical texts share simhash; different texts differ") {
    val sh = TextDedup.simhash16(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(4L))
    assert(sh.values.forall(v => v >= 0 && v < 65536))
  }

  test("banded width-16 pairs equal brute-force Hamming filtering (pigeonhole recall is perfect)") {
    // the dedicated 16-bit pair operator is retired (16-bucket bands
    // are O(n²/16) — q77/q85 are the production widths); the banding
    // machinery's recall proof at width 16 rides the generic form
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the sleepy dog"),
      (4L, "completely different words appear in this text here"),
      (5L, "yet another unrelated document with its own vocabulary"),
      (6L, "   ")  // token-less: must not join anything
    ).toDF("doc_id", "text")
    val fps = TextDedup.withRowSimhash16(
        corpus.filter(trim($"text") =!= ""), "text")
      .select($"doc_id", $"simhash".cast("long").as("fp"))
    val got = TextDedup.fingerprintNearDupPairs(fps, "doc_id", "fp", 16, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force over the same sketches
    val sh = TextDedup.simhash16(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = Integer.bitCount(sh(a) ^ sh(b)) if h <= 3
    } yield (a, b) -> h.toLong).toMap
    assert(got == want, s"banded pairs must equal brute force: $got vs $want")
    assert(got((1L, 2L)) == 0L, "identical docs are a hamming-0 pair")
    assert(!got.keySet.exists(p => p._1 == 6L || p._2 == 6L), "token-less doc joins nothing")
  }

  test("simhashNearDupPairs64 equals brute-force Hamming filtering at width 64") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the sleepy dog"),
      (4L, "completely different words appear in this text here"),
      (5L, "yet another unrelated document with its own vocabulary"),
      (6L, "   ")  // token-less: must not join anything
    ).toDF("doc_id", "text")
    val got = TextDedup.simhashNearDupPairs64(corpus, "doc_id", "text", maxHamming = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force over the batch 64-bit sketches (maxHamming generous
    // enough that CONFIRMED pairs exist across band-width boundaries —
    // 41 bands over 64 bits exercises the variable-width band split)
    val sh = TextDedup.simhash64(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= 40
    } yield (a, b) -> h.toLong).toMap
    assert(got == want, s"banded 64-bit pairs must equal brute force: $got vs $want")
    assert(got((1L, 2L)) == 0L, "identical docs are a hamming-0 pair")
    assert(!got.keySet.exists(p => p._1 == 6L || p._2 == 6L), "token-less doc joins nothing")
  }

  test("per-row simhash64 equals the shuffle-based batch simhash64") {
    val many = docs.union(Seq(
      (5L, "the quick red fox naps under the lazy dog"),
      (6L, "")).toDF("doc_id", "text"))
    val batch = TextDedup.simhash64(many, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byRow = TextDedup.withRowSimhash64(many, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("simhash"))).toMap
    assert(batch.keySet.forall(id => byRow(id) == batch(id)),
           "per-row simhash64 diverges from batch")
    assert(byRow(6L) == 0L) // tokenless doc: batch absent, row form 0
    // identical texts share the sketch; 64 bits resolve the sleepy-dog
    // near-pair and the unrelated docs to distinct values
    assert(batch(1L) == batch(2L) && batch(1L) != batch(4L))
  }

  test("simhash128: lo half equals simhash64 by construction; banding equals brute force") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the sleepy dog"),
      (4L, "completely different words appear in this text here"),
      (5L, "   ")  // token-less: must not join anything
    ).toDF("doc_id", "text")
    // lanes 0-63 use the same digests/votes as simhash64 → lo == sh64
    val s128 = TextDedup.withRowSimhash128(corpus.filter(trim($"text") =!= ""), "text")
      .select($"doc_id", $"simhash.hi", $"simhash.lo").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val s64 = TextDedup.withRowSimhash64(corpus.filter(trim($"text") =!= ""), "text")
      .select($"doc_id", $"simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s128.forall { case (id, (_, lo)) => lo == s64(id) },
           "the 128-bit sketch's low half must equal the 64-bit sketch")
    // banded pairing equals brute force over (hi, lo) at a wide radius
    // (maxHamming = 31 → 4 bands of 32: exercises both longs' bands)
    val got = TextDedup.simhashNearDupPairs128(corpus, "doc_id", "text", maxHamming = 31)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for {
      a <- s128.keys; b <- s128.keys if a < b
      h = java.lang.Long.bitCount(s128(a)._1 ^ s128(b)._1) +
          java.lang.Long.bitCount(s128(a)._2 ^ s128(b)._2) if h <= 31
    } yield (a, b) -> h.toLong).toMap
    assert(got == want, s"banded 128-bit pairs must equal brute force: $got vs $want")
    assert(got((1L, 2L)) == 0L)
    assert(!got.keySet.exists(p => p._1 == 5L || p._2 == 5L), "token-less doc joins nothing")
    // invalid configurations (bands would straddle the hi/lo boundary)
    intercept[IllegalArgumentException] {
      TextDedup.simhashNearDupPairs128(corpus, "doc_id", "text", maxHamming = 2)
    }
    // maxHamming = 0 (2 bands of 64): exact sketch equality only —
    // API-consistent with the 16/64-bit widths, which also accept 0
    val exact = TextDedup.simhashNearDupPairs128(corpus, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wantExact = (for {
      a <- s128.keys; b <- s128.keys if a < b && s128(a) == s128(b)
    } yield (a, b) -> 0L).toMap
    assert(exact == wantExact, s"maxHamming=0 must be exact equality: $exact vs $wantExact")
    assert(exact.contains((1L, 2L)))
  }

  test("variable-width band split (non-divisor maxHamming) keeps perfect recall") {
    // maxHamming = 2 over the 16-bit sketch ⇒ 3 bands of widths 6/5/5:
    // the remainder bit is distributed (every bit participates in
    // exactly one band) and brute-force equality must still hold
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the sleepy dog"),
      (4L, "completely different words appear in this text here")
    ).toDF("doc_id", "text")
    val fps = TextDedup.withRowSimhash16(
        corpus.filter(trim($"text") =!= ""), "text")
      .select($"doc_id", $"simhash".cast("long").as("fp"))
    val got = TextDedup.fingerprintNearDupPairs(fps, "doc_id", "fp", 16, 9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sh = TextDedup.simhash16(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = Integer.bitCount(sh(a) ^ sh(b)) if h <= 9
    } yield (a, b) -> h.toLong).toMap
    assert(got == want, s"variable-width bands must equal brute force: $got vs $want")
  }

  test("dupClusters: min-label propagation finds components and keepers") {
    val ids = (1L to 7L).map(Tuple1(_)).toDF("doc_id")
    // components: {1,2,3} (chain 1-2, 2-3), {5,6}, singletons 4 and 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("da", "db")
    val out = TextDedup.dupClusters(ids, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 1L) && out(2L) == (1L, 0L) && out(3L) == (1L, 0L))
    assert(out(5L) == (5L, 1L) && out(6L) == (5L, 0L))
    assert(out(4L) == (4L, 1L) && out(7L) == (7L, 1L))
  }

  test("planted J≈0.5 near-dups: nHashes=16 bands-of-2 recalls >= 80%") {
    // 20 planted pairs: doc i+100 shares a 9-word prefix with doc i and
    // diverges in a 3-word tail → Jaccard ≈ 0.5 on bigrams. At 8 bands
    // of 2 the expected candidate probability is 1-(1-J²)^8 ≈ 0.9. The
    // corpus is FIXED and md5 is deterministic, so the outcome is exact
    // and stable — this pins the recall the 16-hash config buys (the old
    // 4-hash/2-band config caught roughly half of these).
    val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
                    "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rnd = new scala.util.Random(11)
    val bases = Seq.fill(20)(Seq.fill(12)(vocab(rnd.nextInt(vocab.size))))
    val rows = bases.zipWithIndex.flatMap { case (ws, i) =>
      Seq((i.toLong, ws.mkString(" ")),
          (i.toLong + 100, (ws.take(9) ++ Seq(s"xx$i", s"yy$i", s"zz$i")).mkString(" ")))
    }
    val df = rows.toDF("doc_id", "text")
    val sh = TextDedup.bigramShingles(df, "doc_id", "text")
    val sig = TextDedup.minhashSignature(sh, 16)
    // the full production chain including the estimate-then-verify
    // prefilter (expected loss at J≈0.5 is ~1% of pairs)
    val found = TextDedup.jaccard(sh,
        TextDedup.filterBySignatureAgreement(
          TextDedup.candidatePairs(TextDedup.lshBands(sig, 16, 2)), sig, 16, 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = bases.indices.map(i => (i.toLong, i.toLong + 100))
    val recall = planted.count(found).toDouble / planted.size
    assert(recall >= 0.8, s"recall $recall (${planted.count(found)}/${planted.size})")
  }

  test("dupClusters throws when a component's diameter exceeds maxRounds") {
    // a 12-node chain needs ~11 rounds for the min label to reach the end
    val ids = (1L to 12L).map(Tuple1(_)).toDF("doc_id")
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("da", "db")
    val e = intercept[IllegalStateException] {
      TextDedup.dupClusters(ids, chain, maxRounds = 3, broadcastEdgeMax = 0)
    }
    assert(e.getMessage.contains("did not converge"))
    // and with enough rounds the same chain resolves to one cluster
    val ok = TextDedup.dupClusters(ids, chain, broadcastEdgeMax = 0).collect()
    assert(ok.forall(_.getLong(1) == 1L))
  }

  test("pointer jumping converges a diameter-100 chain in O(log d) rounds, labels identical") {
    // a 101-node chain: plain propagation needs ~100 rounds (throws at
    // the default maxRounds = 50); pointer jumping doubles label reach
    // per round, so it must converge in ~log2(100) + slack rounds
    val ids = (1L to 101L).map(Tuple1(_)).toDF("doc_id")
    val chain = (1L until 101L).map(i => (i, i + 1)).toDF("da", "db")
    intercept[IllegalStateException] {
      // plain DISTRIBUTED form exhausts maxRounds
      TextDedup.dupClusters(ids, chain, broadcastEdgeMax = 0)
    }
    var rounds = 0
    val jumped = TextDedup.dupClusters(ids, chain, pointerJump = true,
        onRound = (r, _, _) => rounds = r, broadcastEdgeMax = 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rounds <= 10, s"pointer jumping took $rounds rounds for diameter 100")
    assert(jumped.keySet == (1L to 101L).toSet)
    assert(jumped.values.forall(_._1 == 1L), "one component, min label 1")
    assert(jumped(1L)._2 == 1L && (2L to 101L).forall(jumped(_)._2 == 0L))
    // and on a multi-component graph the labels equal the plain form's
    val ids2 = (1L to 7L).map(Tuple1(_)).toDF("doc_id")
    val pairs2 = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("da", "db")
    val plain = TextDedup.dupClusters(ids2, pairs2, broadcastEdgeMax = 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pj = TextDedup.dupClusters(ids2, pairs2, pointerJump = true,
        broadcastEdgeMax = 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pj == plain, "pointer jumping must not change the resolved labels")
  }

  test("broadcast union-find path: labels identical to the distributed loop") {
    // a graph exercising every shape at once: a deep chain (1-10), a
    // star (20 ← 21..25), a triangle with a redundant edge (30,31,32),
    // reversed/duplicate edge rows, and singletons (40, 41)
    val ids = ((1L to 10L) ++ (20L to 25L) ++ (30L to 32L) ++ Seq(40L, 41L))
      .map(Tuple1(_)).toDF("doc_id")
    val edges = ((1L until 10L).map(i => (i, i + 1)) ++
      (21L to 25L).map(i => (20L, i)) ++
      Seq((30L, 31L), (31L, 32L), (32L, 30L), (31L, 30L), (32L, 31L)))
      .toDF("da", "db")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dist = asMap(TextDedup.dupClusters(ids, edges, broadcastEdgeMax = 0))
    val bc = asMap(TextDedup.dupClusters(ids, edges)) // default: broadcast path
    assert(bc == dist, "broadcast union-find must reproduce the distributed labels")
    // output schema parity (name order and types feed the same oracles)
    val dDf = TextDedup.dupClusters(ids, edges, broadcastEdgeMax = 0)
    val bDf = TextDedup.dupClusters(ids, edges)
    assert(bDf.schema.map(f => (f.name, f.dataType)) ==
           dDf.schema.map(f => (f.name, f.dataType)))
    // a threshold SMALLER than the edge count falls through to the
    // distributed loop and still converges to the same labels
    val viaFallthrough = asMap(TextDedup.dupClusters(ids, edges, broadcastEdgeMax = 3))
    assert(viaFallthrough == dist)
    // empty edge set: every doc is its own keeper on both paths
    val none = Seq.empty[(Long, Long)].toDF("da", "db")
    val soloBc = asMap(TextDedup.dupClusters(ids, none))
    assert(soloBc.forall { case (id, (cl, k)) => cl == id && k == 1L })
    assert(soloBc == asMap(TextDedup.dupClusters(ids, none, broadcastEdgeMax = 0)))
  }

  test("dedupCorpus: exact + near + transitive dedup in one verdict, short docs covered") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog tonight"), // near dup (J = 8/9)
      (4L, "completely different words appear in this text here"),
      (5L, "hi"),                                            // shingle-less short doc
      (6L, "hi"),                                            // exact dup of 5 — ONLY md5 sees it
      (7L, "hello")                                          // short unique
    ).toDF("doc_id", "text")
    // maxDocFrac = 1.0: the production 0.1 default presumes > 10 docs
    // (documented) — at 7 docs it would prune every shingle
    val out = TextDedup.dedupCorpus(corpus, "doc_id", "text", maxDocFrac = 1.0)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // {1,2,3} one cluster via exact(1,2) + near(1,3): keeper 1, size 3
    assert(out(1L) == (1L, 1L, 3L) && out(2L) == (1L, 0L, 3L) && out(3L) == (1L, 0L, 3L))
    // {5,6} exact-dup cluster of SHORT docs the shingle path can't see
    assert(out(5L) == (5L, 1L, 2L) && out(6L) == (5L, 0L, 2L))
    // singletons keep themselves
    assert(out(4L) == (4L, 1L, 1L) && out(7L) == (7L, 1L, 1L))
  }

  test("curateCorpus: quality-dropped docs never reach dedup; keepers get splits; ledger complete") {
    import graft.pipeline.TextAnalysis
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // dup of 1
      (3L, "completely different words appear in this text here"),
      (4L, "x"),                                             // quality-dropped (1 token)
      (5L, "the quick brown fox jumps over the lazy dog")    // dup of 1 too
    ).toDF("doc_id", "text")
    val out = TextAnalysis.curateCorpus(corpus, "doc_id", "text",
        minTokens = 5, minQuality = 0.0, maxDocFrac = 1.0).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5, "every input doc appears in the ledger")
    // quality-dropped: no cluster (dedup never saw it), no split, reason
    val d4 = out(4L)
    assert(d4.isNullAt(d4.fieldIndex("cluster")) && d4.isNullAt(d4.fieldIndex("split")))
    assert(d4.getString(d4.fieldIndex("drop_reason")) == "quality" &&
           d4.getLong(d4.fieldIndex("keep")) == 0L)
    // duplicates: clustered under 1, dropped with reason, no split
    for (id <- Seq(2L, 5L)) {
      val r = out(id)
      assert(r.getLong(r.fieldIndex("cluster")) == 1L &&
             r.getString(r.fieldIndex("drop_reason")) == "duplicate" &&
             r.getLong(r.fieldIndex("keep")) == 0L && r.isNullAt(r.fieldIndex("split")))
    }
    // keepers: keep = 1, a split assigned, no reason
    for (id <- Seq(1L, 3L)) {
      val r = out(id)
      assert(r.getLong(r.fieldIndex("keep")) == 1L &&
             !r.isNullAt(r.fieldIndex("split")) && r.isNullAt(r.fieldIndex("drop_reason")))
      assert(Set("train", "val", "test")(r.getString(r.fieldIndex("split"))))
    }
  }

  test("leakageSafeSplit: near-dup renditions never straddle splits; doc-keyed split can") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog tonight"), // near dup of 1
      (4L, "completely different words appear in this text here"),
      (5L, "hi"), (6L, "hi"), (7L, "hello")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.leakageSafeSplit(corpus, "doc_id", "text",
                                            maxDocFrac = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 7)
    // the whole {1,2,3} component shares one split; so does {5,6}
    assert(out(1L)._2 == out(2L)._2 && out(2L)._2 == out(3L)._2)
    assert(out(5L)._2 == out(6L)._2)
    // split is a pure function of the cluster id: equal clusters, equal splits
    assert(out.values.groupBy(_._1).forall(_._2.map(_._2).toSet.size == 1))
    // and the split values agree with deterministicSplit keyed on the cluster
    val want = TextAnalysis.deterministicSplit(
        out.values.map(_._1).toSeq.distinct.toDF("cluster"), "cluster")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.values.forall { case (c, s) => want(c) == s })
  }

  test("repetitionStats separates looping text from diverse text") {
    import graft.pipeline.TextAnalysis
    val corpus = Seq(
      (1L, "buy now buy now buy now buy now buy now"),       // degenerate loop
      (2L, "the quick brown fox jumps over the lazy dog"),   // diverse
      (3L, "x")                                              // <2 words: no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
                                 r.getDouble(3), r.getDouble(4))).toMap
    assert(!out.contains(3L), "sub-bigram docs emit nothing")
    // doc 1: 9 bigram occurrences, 2 distinct (buy_now x5, now_buy x4)
    assert(out(1L)._1 == 9L && out(1L)._2 == 2L)
    assert(out(1L)._3 > 0.5 && out(1L)._4 > 0.7, s"loop must score high: ${out(1L)}")
    // doc 2: all 8 bigrams distinct → zero duplication
    assert(out(2L) == ((8L, 8L, 0.125, 0.0)), s"diverse doc: ${out(2L)}")
  }

  test("contaminatedDocs flags verbatim n-gram inclusion, never shared vocabulary") {
    val benchSentence = "what is the capital of france and when was it founded"
    val corpus = Seq(
      // doc 1 QUOTES the benchmark item inside other text → contaminated
      (1L, "some crawled page text " + benchSentence + " with trailing boilerplate"),
      // doc 2 shares VOCABULARY but never 8 consecutive words → clean
      (2L, "france is a country and paris is the capital when it was founded"),
      (3L, "completely unrelated document about spark shuffle partitions here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchSentence)).toDF("bench_id", "btext")
    val hits = TextDedup.contaminatedDocs(corpus, "doc_id", "text",
                                          bench, "bench_id", "btext")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hits.keySet == Set((1L, 100L)), s"only the quoting doc is flagged: $hits")
    // an 11-word benchmark quoted verbatim yields 11-8+1 = 4 shared 8-grams
    assert(hits((1L, 100L)) == 4L, s"shared-gram count is the audit trail: $hits")
    // ngram generalization: n=2 equals bigramShingles exactly
    val bi = TextDedup.bigramShingles(corpus, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val n2 = TextDedup.ngramShingles(corpus, "doc_id", "text", 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(n2 == bi, "ngramShingles(2) must equal bigramShingles")
  }

  test("bm25TopK: tf raises, rarity raises, length normalizes, ranks are dense") {
    import graft.pipeline.TextAnalysis
    val corpus = Seq(
      (1L, "spark shuffle spark shuffle spark"),   // tf(spark)=3, dl 5
      (2L, "spark shuffle join window group agg"), // tf(spark)=1, dl 6
      (3L, "join join join join join join"),       // no query terms
      (4L, "rare spark"),                          // short doc, tf 1
      (5L, "window group agg sort")                // no query terms
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(corpus, "doc_id", "text", Seq("spark", "rare"), 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs without query terms never appear
    assert(!out.contains(3L) && !out.contains(5L))
    assert(out.keySet == Set(1L, 2L, 4L))
    // doc 4 carries the RAREST term (df=1) plus spark in the shortest
    // doc: highest score; doc 1's tf=3 beats doc 2's tf=1
    val ranks = out.map { case (id, (_, rank)) => id -> rank }
    assert(ranks(4L) == 1L, s"rarity + brevity must lead: $out")
    assert(ranks(1L) == 2L && ranks(2L) == 3L, s"tf must order 1 above 2: $out")
    // scores strictly positive and consistent with rank order
    val byRank = out.values.toSeq.sortBy(_._2).map(_._1)
    assert(byRank == byRank.sorted.reverse && byRank.forall(_ > 0L))
  }

  test("clusterKeywords: separating terms rank, ubiquitous terms score exactly zero") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "spark spark shuffle common"),
      (2L, "spark join common"),
      (3L, "pandas pandas frame common"),
      (4L, "pandas index common")
    ).toDF("doc_id", "text")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("doc_id", "cell")
    val out = TextAnalysis.clusterKeywords(docs, "doc_id", "text", assign, topM = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byCell = out.groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    // ctf(spark, c0) = 3, df = 1 cluster → score 3·ln2; shuffle/join 1·ln2;
    // 'common' appears in both clusters → ln(2/2) = 0, never a label
    assert(byCell(0L) == Seq("spark", "join") && byCell(1L) == Seq("pandas", "frame"),
           s"separating terms must label: $byCell")
    assert(!out.exists(_._2 == "common"), s"ubiquitous term cannot outrank: ${out.toSeq}")
    val spark0 = out.find(t => t._1 == 0L && t._2 == "spark").get
    assert(spark0._3 == math.round(3 * math.log(2.0) * 1e6),
           s"score replays ctf · ln(K/df) · 1e6: $spark0")
  }

  test("curateCorpusSemantic: four-reason verdict; reordered paraphrase caught by the semantic stage only") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "tiny"),                                           // quality-dropped
      (4L, "one two three four five six seven eight nine"),
      (5L, "nine eight seven six five four three two one"),   // same bag, reordered:
                                                              // shingles disjoint, embedding identical
      (6L, "completely different vocabulary occupies this final document here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.curateCorpusSemantic(docs, "doc_id", "text",
                                                minTokens = 3, semTau = 0.98)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(8)).map(_.toString), r.getLong(9))).toMap
    assert(out(3L)._1.contains("quality"), s"doc 3 drops on quality: $out")
    assert(out(2L)._1.contains("duplicate") && out(1L)._2 == 1L,
           s"exact dup resolves in the near-dup stage: $out")
    assert(out(5L)._1.contains("semantic_dup") && out(4L)._2 == 1L,
           s"the reordered paraphrase must fall to the SEMANTIC stage: $out")
    assert(out(6L)._1.isEmpty && out(6L)._2 == 1L, s"distinct doc keeps: $out")
    assert(out.values.count(_._2 == 1L) == 3, s"keepers: 1, 4, 6: $out")
  }

  test("diversifyByCluster: one rendition per cluster, dense re-rank, partial ledger safe") {
    import graft.pipeline.TextAnalysis
    val ranked = Seq((10L, 900L, 1L), (20L, 800L, 2L), (30L, 700L, 3L), (40L, 600L, 4L))
      .toDF("doc_id", "rrf_e6", "rank")
    val clusters = Seq((10L, 10L), (30L, 10L), (40L, 40L)) // 20 missing from ledger
      .toDF("doc_id", "cluster")
    val out = TextAnalysis.diversifyByCluster(ranked, clusters)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cluster"), r.getAs[Long]("rank")))
      .sortBy(_._3).toSeq
    // 30 collapses into 10's cluster; 20 survives as its own singleton
    assert(out == Seq((10L, 10L, 1L), (20L, 20L, 2L), (40L, 40L, 3L)),
           s"diversified page: $out")
  }

  test("keeperByScore: best copy wins, ties break low, unscored docs never steal") {
    val verdict = Seq(
      (1L, 1L, 1L, 3L), (2L, 1L, 0L, 3L), (3L, 1L, 0L, 3L), // cluster of 3
      (4L, 4L, 1L, 1L),                                      // singleton
      (5L, 5L, 1L, 2L), (6L, 5L, 0L, 2L)                     // tie cluster
    ).toDF("doc_id", "cluster", "is_keeper", "n_cluster")
    val scores = Seq(
      (1L, 0.1), (2L, 0.9), (3L, 0.5), (5L, 0.7), (6L, 0.7) // doc 4 unscored
    ).toDF("doc_id", "score")
    val out = TextDedup.keeperByScore(verdict, scores).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 0L,   // 2 outranks min-id 1
                      4L -> 1L,                        // singleton keeps itself
                      5L -> 1L, 6L -> 0L),             // score tie → lower id
           s"quality keeper: $out")
  }

  test("hybridTopK: RRF fuses lexical and semantic evidence; pool ranks audit") {
    import graft.pipeline.TextAnalysis
    val corpus = Seq(
      (1L, "spark shuffle spark shuffle spark"),   // lexical hit only
      (2L, "spark shuffle join window group agg"), // lexical + some overlap
      (3L, "join join join join join join"),       // no query terms, distinct text
      (4L, "rare spark"),                          // strongest lexical
      (5L, "window group agg sort")                // no query terms
    ).toDF("doc_id", "text")
    val out = TextAnalysis.hybridTopK(corpus, "doc_id", "text",
                                      Seq("spark", "rare"), k = 5)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
         Option(r.get(3)).map(_.asInstanceOf[Long]),
         Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    // every doc embeds, so the dense pool covers all 5; lexical covers 1/2/4
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(3L)._3.isEmpty && out(5L)._3.isEmpty,
           s"docs without query terms carry no bm25 rank: $out")
    assert(Seq(1L, 2L, 4L).forall(out(_)._3.nonEmpty))
    assert(out.values.forall(_._4.nonEmpty), "dense pool covers the corpus")
    // two-pool membership must dominate single-pool membership here:
    // the worst two-pool score 1/80+1/80 = 0.025 beats the best
    // possible single-pool score 1/61
    val (two, one) = out.values.partition(v => v._3.nonEmpty && v._4.nonEmpty)
    assert(two.map(_._2).max < one.map(_._2).min,
           s"both-pool docs must outrank dense-only docs: $out")
    // rrf_e6 is consistent with rank order and reproducible arithmetic
    val byRank = out.values.toSeq.sortBy(_._2)
    assert(byRank.map(_._1) == byRank.map(_._1).sorted.reverse)
    val top = byRank.head
    assert(top._1 == math.round((1.0 / (60 + top._3.get) + 1.0 / (60 + top._4.get)) * 1e6),
           s"rrf_e6 replays the published formula: $top")
  }

  test("wordOccurrences counts word-boundary hits") {
    val got = docs.filter($"doc_id" === 1)
      .select(TextDedup.wordOccurrences($"text", "the").as("n"))
      .head().getDouble(0)
    assert(got == 2.0)
  }

  test("per-row simhash equals the shuffle-based batch simhash") {
    val many = docs.union(Seq(
      (5L, "the quick red fox naps under the lazy dog"),
      (6L, "")).toDF("doc_id", "text"))
    val batch = TextDedup.simhash16(many, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byRow = TextDedup.withRowSimhash16(many, "text").collect()
      .map(r => r.getLong(0) -> r.getInt(r.fieldIndex("simhash"))).toMap
    assert(batch.keySet.forall(id => byRow(id) == batch(id)),
           "per-row simhash diverges from batch")
    assert(byRow(6L) == 0) // tokenless doc: batch absent, row form 0
  }

  test("per-row minhash signature equals the shuffle-based batch signature") {
    // the ingestion-time form must produce bit-identical h* values —
    // including under the frequent-shingle prune, where the exclude
    // literal must reproduce pruneFrequentShingles' effect exactly
    val many = docs.union(Seq(
      (5L, "the quick red fox naps under the lazy dog"),
      (6L, "one"), // <2 words: batch drops it, row form yields nulls
      (7L, "")).toDF("doc_id", "text"))
    def collectSig(df: org.apache.spark.sql.DataFrame, idCol: String) =
      df.collect().map(r => r.getLong(r.fieldIndex(idCol)) ->
        (0 until 16).map(i => r.getAs[String](s"h$i")).toList).toMap

    val sh = TextDedup.bigramShingles(many, "doc_id", "text")
    val batch = collectSig(TextDedup.minhashSignature(sh, 16), "id")
    val byRow = collectSig(
      TextDedup.withRowMinhashSignature(many, "text", 16), "doc_id")
    assert(batch.keySet.forall(id => byRow(id) == batch(id)),
           "unpruned signatures diverge")
    assert(byRow(6L).forall(_ == null) && byRow(7L).forall(_ == null))

    // pruned parity: "the_quick" etc. appear in >40% of docs
    val pruned = TextDedup.pruneFrequentShingles(sh, 0.4)
    val frequent = sh.select("bg").distinct().except(pruned.select("bg").distinct())
      .collect().map(_.getString(0)).toSeq
    assert(frequent.nonEmpty, "test corpus has no frequent shingles to prune")
    val batchP = collectSig(TextDedup.minhashSignature(pruned, 16), "id")
    val byRowP = collectSig(
      TextDedup.withRowMinhashSignature(many, "text", 16, exclude = frequent), "doc_id")
    assert(batchP.keySet.forall(id => byRowP(id) == batchP(id)),
           "pruned signatures diverge")
  }

  test("redactPii: sequential counts + replacement, non-PII text untouched") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "mail a@b.com and c.d@e.org plus ip 10.0.0.1 call +12345678 done"),
      (2L, "no personal data in this row at all"),
      (3L, "server at 192.168.255.3 only")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(out(1L)._1 == 2L && out(1L)._2 == 1L && out(1L)._3 == 1L && out(1L)._4 == 4L)
    assert(out(1L)._5 ==
      "mail <EMAIL> and <EMAIL> plus ip <IP> call <PHONE> done")
    assert(out(2L) == ((0L, 0L, 0L, 0L, "no personal data in this row at all")))
    assert(out(3L)._2 == 1L && out(3L)._5 == "server at <IP> only")
  }

  test("temperatureResample: alpha flattens the mixture, ledger is deterministic") {
    import graft.pipeline.TextAnalysis
    // two domains, 10:1 skew
    val rows = ((1L to 200L).map(i => (i, "big")) ++ (201L to 220L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    def rates(alpha: Double) =
      TextAnalysis.temperatureResample(rows, "doc_id", "source", 100L, alpha)
        .select("source", "n_group", "target_n", "rate_e6").distinct()
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // alpha = 1: natural mixture — targets proportional to counts
    val nat = rates(1.0)
    assert(nat("big")._2 == 91L && nat("small")._2 == 9L, s"natural: $nat")
    // alpha = 0: equal targets per group
    val flat = rates(0.0)
    assert(flat("big")._2 == flat("small")._2, s"flat: $flat")
    // alpha = 0.5: in between, and the small domain's RATE exceeds the big one's
    val mid = rates(0.5)
    assert(mid("small")._3 > mid("big")._3, s"temperature upweights small: $mid")
    // deterministic: same inputs, same sampled set, and it honors rate_e6 = 1e6 → all kept
    val all = TextAnalysis.temperatureResample(rows, "doc_id", "source", 220L, 1.0)
    assert(all.filter(col("rate_e6") === 1000000L && col("sampled") === 1L).count() >=
           all.filter(col("rate_e6") === 1000000L).count())
    val s1 = TextAnalysis.temperatureResample(rows, "doc_id", "source", 100L, 0.5)
      .filter(col("sampled") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = TextAnalysis.temperatureResample(rows, "doc_id", "source", 100L, 0.5)
      .filter(col("sampled") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "hash-point sampling must be reproducible")
  }

  test("packSequences: packs are bucket-pure, slots dense, capacity respected") {
    import graft.pipeline.TextAnalysis
    val rows = (1L to 300L).map { i =>
      (i, Seq.fill((i % 97 + 3).toInt)("w").mkString(" "))  // 3..99 tokens
    }.toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(rows, "doc_id", "text",
        contextLen = 256, minBucket = 16, maxBucket = 128, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 300)
    // bucket covers the token count (no doc exceeds maxBucket here)
    assert(out.forall { case (_, n, b, _, _) => n <= b && Seq(16L, 32L, 64L, 128L).contains(b) })
    val byPack = out.groupBy(_._4)
    byPack.foreach { case (pack, docs) =>
      val buckets = docs.map(_._3).toSet
      assert(buckets.size == 1, s"pack $pack mixes buckets $buckets")
      val k = 256 / buckets.head
      val slots = docs.map(_._5).sorted.toSeq
      assert(slots == (0L until docs.length.toLong).toSeq,
             s"pack $pack slots not dense: $slots")
      assert(docs.length <= k, s"pack $pack exceeds capacity $k")
    }
    // capacity is hit: at least one pack of the smallest bucket is full
    assert(byPack.exists { case (_, docs) => docs.head._3 == 16L && docs.length == 16 })
  }

  test("duplicatedSpanStats: shared 8-gram spans counted, unique text clean") {
    val span = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 words
    val corpus = Seq(
      (1L, s"$span one two three four five six seven"),   // shares the span with 2
      (2L, s"nine ten $span eleven twelve"),
      (3L, "totally different words with no overlap at all whatsoever"),
      (4L, "short doc")                                   // < 8 words: no row
    ).toDF("doc_id", "text")
    val out = TextDedup.duplicatedSpanStats(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(!out.contains(4L), "sub-n docs emit nothing")
    // each of docs 1/2 contains exactly ONE copy of the shared 8-gram
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L, s"shared span: $out")
    assert(out(3L)._2 == 0L && out(3L)._4 == 0L, "unique doc must be clean")
    assert(out(1L)._1 == 8L, s"15 words -> 8 distinct 8-grams: ${out(1L)}")
  }

  test("incrementalDedup: exact/near/unique verdicts against the existing corpus only") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about spark internals here"),
      (3L, "hello world tiny doc"))
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),     // exact dup of 1
      (11L, "the quick brown fox jumps over the lazy dog tonight ok"),// near dup of 1
      (12L, "fresh unseen content with brand new words entirely"),
      (13L, "fresh unseen content with brand new words entirely"))    // exact dup of 12 — but 12 is NEW
    val docs = (existing ++ batch).toDF("doc_id", "text")
    val out = TextDedup.incrementalDedup(docs, "doc_id", "text",
        col("doc_id") >= 10L, maxDocFrac = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L), "one verdict per NEW doc")
    assert(out(10L) == (("exact", 1L)), s"exact: ${out(10L)}")
    assert(out(11L) == (("near", 1L)), s"near: ${out(11L)}")
    // new-vs-new duplication is NOT judged here (next full dedupCorpus pass does)
    assert(out(12L) == (("unique", -1L)) && out(13L) == (("unique", -1L)), s"$out")
  }

  test("qualityRules: each rule fires on exactly its designed violation") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "the cat sat on a mat and then the dog sat too"),  // passes all
      (2L, "the tiny one"),                                   // too few words
      (3L, "the extraordinarily incomprehensible multisyllabic " +
           "hippopotamus confabulation extravaganza misunderstanding"), // avg len high
      (4L, "red green blue cyan teal pink gray black white brown"),     // no stopwords
      (5L, "the spam spam spam spam spam spam spam spam spam")          // top-token dominant
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityRules(rows, "doc_id", "text",
        minWords = 5, maxWords = 20, minAvgLen = 2.0, maxAvgLen = 6.0,
        minStopHits = 1, maxTopFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    def rules(id: Long) = (out(id).getAs[Long]("r_words"), out(id).getAs[Long]("r_avg_len"),
                           out(id).getAs[Long]("r_stop"), out(id).getAs[Long]("r_top_frac"),
                           out(id).getAs[Long]("q_keep"))
    assert(rules(1L) == ((1L, 1L, 1L, 1L, 1L)), s"doc 1 clean: ${rules(1L)}")
    assert(rules(2L)._1 == 0L && rules(2L)._5 == 0L, s"word floor: ${rules(2L)}")
    assert(rules(3L)._2 == 0L, s"avg-len ceiling: ${rules(3L)}")
    assert(rules(4L)._3 == 0L, s"stopword floor: ${rules(4L)}")
    assert(rules(5L)._4 == 0L, s"dominance ceiling: ${rules(5L)}")
    // evidence is consistent: n_tokens counts words, top_tok_frac in (0, 1]
    assert(out(1L).getAs[Long]("n_tokens") == 12L)
    val f = out(5L).getAs[Double]("top_tok_frac")
    assert(f > 0.5 && f <= 1.0, s"spam dominance measured: $f")
  }

  test("tfidfTopK: rare term outweighs ubiquitous one, scores in (0, 1], deterministic") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "apple banana cherry zebra"),        // the one doc with the rare term
      (2L, "apple apple apple apple banana"),   // common-term stuffing
      (3L, "apple banana cherry fig"),
      (4L, "apple cherry fig grape")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(rows, "doc_id", "text", Seq("zebra", "apple"), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.length == 3, "k respected")
    assert(out.head._1 == 1L, s"rare-term doc must rank first: ${out.toSeq}")
    assert(out.forall { case (_, s, _) => s > 0.0 && s <= 1.0 }, s"cosine range: ${out.toSeq}")
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L), "dense ranks")
    val again = TextAnalysis.tfidfTopK(rows, "doc_id", "text", Seq("zebra", "apple"), 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq, "integer-weight scoring is reproducible")
  }

  test("shuffleShards: dense per-shard ranks, injective interleaved order, growth-stable shards") {
    import graft.pipeline.TextAnalysis
    val rows = (1L to 200L).toDF("doc_id")
    val out = TextAnalysis.shuffleShards(rows, "doc_id", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 200)
    // per-shard positions are dense from 0
    out.groupBy(_._2).foreach { case (shard, docs) =>
      assert(docs.map(_._3).sorted.toSeq == (0L until docs.length.toLong).toSeq,
             s"shard $shard ranks not dense")
    }
    // the interleaving is injective and round-robin-consistent
    assert(out.map(_._4).distinct.length == 200, "global_pos must be unique")
    assert(out.forall { case (_, s, p, g) => g == p * 4 + s })
    // every shard is populated (hash balance at n/s = 50)
    assert(out.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // appending documents never moves an existing document's shard
    val grown = TextAnalysis.shuffleShards((1L to 300L).toDF("doc_id"), "doc_id", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.forall { case (id, s, _, _) => grown(id) == s },
           "content-hash shards are growth-stable")
  }

  test("lmSurprisal: rare-token docs score higher and flag; exact milli-nat ledger") {
    import graft.pipeline.TextAnalysis
    // corpus LM: T = 8 occurrences, c(a) = 7, c(b) = 1
    // s(a) = round(ln(8/7)*1000) = 134, s(b) = round(ln(8)*1000) = 2079
    val rows = Seq((1L, "a a a a"), (2L, "a a a b")).toDF("doc_id", "text")
    val out = TextAnalysis.lmSurprisal(rows, "doc_id", "text", maxAvgNatsE3 = 500.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    assert(out(1L)._1 == 4L && out(1L)._2 == 4 * 134L, s"common doc ledger: ${out(1L)}")
    assert(out(2L)._2 == 3 * 134L + 2079L, s"rare-token doc ledger: ${out(2L)}")
    assert(out(1L)._3 == 134.0 && out(2L)._3 == 620.25, s"means: $out")
    assert(out(2L)._3 > out(1L)._3, "rare token raises mean surprisal")
    assert(out(1L)._5 == 0L && out(2L)._5 == 1L, s"flag at 500 milli-nats: $out")
    // perplexity = exp(mean nats), round-6
    assert(math.abs(out(1L)._4 - math.exp(0.134)) < 1e-6, s"ppl: ${out(1L)._4}")
    assert(math.abs(out(2L)._4 - math.exp(0.62025)) < 1e-6, s"ppl: ${out(2L)._4}")
  }

  test("writeShards: shard-partitioned files replay the reproducible order on plain readback") {
    import graft.pipeline.TextAnalysis
    val rows = (1L to 120L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val ledger = TextAnalysis.writeShards(rows, "doc_id", dir, nShards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
                           r.getAs[Long]("pos"))).toSeq
    // one directory per shard, payload + order both survive the round-trip
    val back = spark.read.parquet(dir)
    assert(back.count() == 120 && back.columns.toSet
             .contains("text"), "payload written")
    for (s <- 0L to 3L) {
      val files = new java.io.File(s"$dir/shard=$s").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s should be one writer task's file")
      // plain file-order readback == the ledger's pos order: the loader
      // needs no sort and no metadata
      val got = spark.read.parquet(files.head.getPath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val want = ledger.filter(_._2 == s).sortBy(_._3).map(_._1)
      assert(got == want, s"shard $s order must replay the permutation")
    }
  }

  test("materializePacks: contiguous slot ranges, unique positions, ids preserved") {
    import graft.pipeline.TextAnalysis
    val rows = (1L to 10L).map { i =>
      (i, Seq.tabulate((i % 6 + 3).toInt)(j => s"w${(i + j) % 7}").mkString(" "))
    }.toDF("doc_id", "text")  // 3..8 tokens per doc
    val vocab = TextAnalysis.vocabulary(rows, "doc_id", "text", topK = 5)
    val out = TextAnalysis.materializePacks(rows, "doc_id", "text", vocab,
        contextLen = 32, minBucket = 8, maxBucket = 8, nShards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every (pack, pos) cell is written at most once
    assert(out.map(t => (t._1, t._2)).distinct.length == out.length,
           "pack positions must not collide")
    // each doc's tokens are contiguous from its slot base (slot*8)
    val enc = TextAnalysis.encodeTokens(rows, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    out.groupBy(_._4).foreach { case (doc, cells) =>
      val sorted = cells.sortBy(_._2)
      val base = sorted.head._2
      assert(base % 8 == 0, s"doc $doc base $base must sit on a slot boundary")
      assert(sorted.map(_._2).toSeq == (base until base + sorted.length).toSeq,
             s"doc $doc tokens must be contiguous")
      assert(sorted.map(_._3).toSeq == enc(doc), s"doc $doc ids must survive flattening")
    }
    assert(out.map(_._4).distinct.length == 10, "all docs materialized")
  }

  test("dsirWeights: target-like raw docs score positive, off-domain negative") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "alpha beta alpha beta alpha beta"),   // target exemplar
      (2L, "alpha beta gamma alpha beta"),        // target exemplar
      (10L, "alpha beta alpha beta gamma"),       // raw, target-like
      (11L, "delta epsilon zeta delta epsilon"),  // raw, off-domain
      (12L, "solo")                               // one word: no bigrams, no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(rows, "doc_id", "text", col("doc_id") <= 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set(1L, 2L, 10L, 11L), "sub-bigram docs emit nothing")
    assert(out(1L)._1 == 1L && out(10L)._1 == 0L, "is_target ledger column")
    assert(out(10L)._2 == 4L, s"n_feats counts bigram occurrences: ${out(10L)}")
    assert(out(10L)._3 > 0L && out(10L)._4 == 1L,
           s"target-like raw doc selected: ${out(10L)}")
    assert(out(11L)._3 < 0L && out(11L)._4 == 0L,
           s"off-domain raw doc rejected: ${out(11L)}")
    // importance ordering: the pure-exemplar doc outscores the mixed one
    assert(out(1L)._3 > out(11L)._3)
  }

  test("encodeTokens: frequency-ranked ids in document order, OOV hits the reserved slot") {
    import graft.pipeline.TextAnalysis
    // occurrences: b=4, a=3, c=2, z=1 -> ranks b=1, a=2, c=3; topK=3 makes z OOV
    val rows = Seq((1L, "a b c b"), (2L, "b a z b c a")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(rows, "doc_id", "text", topK = 3)
    val out = TextAnalysis.encodeTokens(rows, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toSeq, r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((Seq(2L, 1L, 3L, 1L), 4L, 0L)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((Seq(1L, 2L, 0L, 1L, 3L, 2L), 6L, 1L)),
           s"doc 2 keeps order and encodes z as UNK: ${out(2L)}")
  }

  test("corpusReport: dataset-card counts are exact on a constructed corpus") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "the cat sat on a mat and then the dog sat too"),
      (2L, "the cat sat on a mat and then the dog sat too"),  // exact dup of 1
      (3L, "the tiny one")                                    // quality-dropped (word floor)
    ).toDF("doc_id", "text")
    val r = TextAnalysis.corpusReport(rows, "doc_id", "text").collect()
    assert(r.length == 1, "one report row")
    val row = r.head
    assert(row.getAs[Long]("n_docs") == 3L)
    assert(row.getAs[Long]("n_tokens") == 12L + 12L + 3L)
    // vocab: docs 1/2 share 10 distinct words; doc 3 adds tiny, one ('the' shared)
    assert(row.getAs[Long]("vocab_size") == 12L, s"vocab: $row")
    assert(row.getAs[Long]("n_exact_dup_docs") == 2L, "both copies count")
    assert(row.getAs[Long]("n_quality_drop") >= 1L, "short doc fails the rulebook")
  }

  test("corpusReport: token-less documents count as quality drops") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "the cat sat on a mat and then the dog sat too " +
           "because the day is a good day and the mat is soft"),  // passes rulebook
      (2L, ""),                                                   // zero tokens
      (3L, "   ")                                                 // whitespace only
    ).toDF("doc_id", "text")
    val row = TextAnalysis.corpusReport(rows, "doc_id", "text").collect().head
    assert(row.getAs[Long]("n_docs") == 3L)
    // qualityRules emits no evidence row for docs 2/3, but the report's
    // doc-universe left join still counts them as drops: n_quality_drop
    // covers every doc that is not a verified keeper
    assert(row.getAs[Long]("n_quality_drop") == 3L,
           s"token-less docs must land in the kill count: $row")
  }

  test("materializePacks: docs longer than maxBucket are truncated to their slot") {
    import graft.pipeline.TextAnalysis
    // doc 1 has 12 tokens but maxBucket = 8: only its first 8 ids may
    // materialize, confined to [base, base+8) — no spill into slot 2's range
    val rows = Seq(
      (1L, (1 to 12).map(j => s"w${j % 5}").mkString(" ")),
      (2L, "w0 w1 w2"),
      (3L, "w1 w2 w3 w4")
    ).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(rows, "doc_id", "text", topK = 5)
    val out = TextAnalysis.materializePacks(rows, "doc_id", "text", vocab,
        contextLen = 32, minBucket = 8, maxBucket = 8, nShards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(t => (t._1, t._2)).distinct.length == out.length,
           "no (pack, pos) collisions even with an over-long doc")
    val longDoc = out.filter(_._4 == 1L).sortBy(_._2)
    assert(longDoc.length == 8, s"over-long doc truncated to its bucket: ${longDoc.length}")
    val base = longDoc.head._2
    assert(longDoc.map(_._2).toSeq == (base until base + 8).toSeq,
           "truncated tokens stay inside the slot range")
    val enc = TextAnalysis.encodeTokens(rows, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(longDoc.map(_._3).toSeq == enc(1L).take(8),
           "the materialized ids are the PREFIX of the encoding")
    assert(out.filter(_._4 == 2L).length == 3, "short docs still fully materialized")
  }

  test("dsirWeights: an empty target or raw side fails loudly, not as a null ledger") {
    import graft.pipeline.TextAnalysis
    val rows = Seq(
      (1L, "alpha beta alpha beta"),
      (2L, "gamma delta gamma delta")
    ).toDF("doc_id", "text")
    val noTarget = intercept[IllegalArgumentException] {
      TextAnalysis.dsirWeights(rows, "doc_id", "text", lit(false)).collect()
    }
    assert(noTarget.getMessage.contains("target LM undefined"))
    val noRaw = intercept[IllegalArgumentException] {
      TextAnalysis.dsirWeights(rows, "doc_id", "text", lit(true)).collect()
    }
    assert(noRaw.getMessage.contains("raw LM undefined"))
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(1.0, 0.0, 0.0)),   // identical to 0
    (2L, Seq(0.9, 0.1, 0.0)),   // close to 0
    (3L, Seq(-1.0, 0.0, 0.0)),  // opposite
    (4L, Seq(0.0, 1.0, 0.0))    // orthogonal
  ).toDF("vec_id", "v")

  test("brute-force cosine ranks identical > close > orthogonal > opposite") {
    val out = Similarity.cosineTopK(vecs, col("vec_id") === 0, 4)
      .orderBy("rn").collect().map(_.getAs[Long]("neighbor_id"))
    assert(out.head == 1L)
    assert(out(1) == 2L)
    assert(out.last == 3L)
  }

  test("IVF cells assign by nearest centroid; search stays within cell") {
    val cents = Seq(0 -> Seq(1.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0))
    val out = Similarity.ivfTopK(vecs, cents, 3).collect()
    val cellOf = out.map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("cell")).toMap
    // 0,1,2 point along +x → cell 0; 3 (-x) and 4 (+y) prefer centroid 1
    assert(cellOf(0L) == 0L && cellOf(1L) == 0L && cellOf(2L) == 0L)
    assert(cellOf(3L) == 1L && cellOf(4L) == 1L)
    val n0 = out.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Long]("neighbor_id")).toSet
    assert(n0 == Set(1L, 2L)) // only same-cell vectors are candidates
    val n4 = out.filter(_.getAs[Long]("query_id") == 4L).map(_.getAs[Long]("neighbor_id")).toSet
    assert(n4 == Set(3L))
  }

  test("ivf_assign fails loudly on dimension mismatch (no silent truncation)") {
    // non-uniform centroid dims are rejected at construction
    intercept[IllegalArgumentException] {
      graft.plans.IvfAssign.Quantizer(
        Array(Array(1.0, 0.0), Array(1.0)),
        Array(Array(Array(1.0, 0.0)), Array(Array(1.0))),
        Array(Array(0), Array(1)), 1, 1)
    }
    // a row vector shorter than the quantizer's dim errors instead of
    // scoring a truncated (plausible-but-wrong) cosine
    val cents = Seq(0 -> Seq(1.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0))
    val bad = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("vec_id", "v")
    val e = intercept[Exception] { Similarity.ivfTopK(bad, cents, 1).collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " | " + msgs(t.getCause)
    assert(msgs(e).contains("quantizer expects"), msgs(e).take(300))
  }

  test("k-means-trained IVF centroids separate the two natural clusters") {
    // two tight clusters around +x and +y
    val data = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Seq(1.0, 0.0, 0.0) else Seq(0.0, 1.0, 0.0)
      (i.toLong, base.map(_ + (i % 5) * 0.01))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 2)
    assert(cents.size == 2)
    val out = Similarity.ivfTopK(data, cents, 3).collect()
    // neighbors returned from WITHIN the query's cluster only: parity of
    // ids encodes the cluster, so neighbor parity must match query parity
    assert(out.nonEmpty)
    assert(out.forall(r =>
      r.getAs[Long]("query_id") % 2 == r.getAs[Long]("neighbor_id") % 2))
  }

  private def recallAt3(e: org.apache.spark.sql.DataFrame,
                        cents: Seq[(Int, Seq[Double])], nprobe: Int,
                        truth: Set[(Long, Long)]): Double = {
    val got = Similarity.ivfTopK(e, cents, 3, nprobe).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    truth.intersect(got).size.toDouble / truth.size
  }

  private def exactTop3(e: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    Similarity.cosineTopK(e, lit(true), 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

  test("IVF nprobe=2 reaches recall@3 >= 0.9 on clustered embeddings") {
    // 16 planted clusters in 64-dim (the structure real embedding corpora
    // have); trained cells then align with clusters and probing the 2
    // nearest cells recovers nearly all true neighbors
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 16)
    val truth = exactTop3(data)
    val r2 = recallAt3(data, cents, 2, truth)
    assert(r2 >= 0.9, s"recall@3 at nprobe=2 is $r2 on clustered data")
  }

  test("JL projection: deterministic ±1 matrix; shortlist knob lifts recall toward exact") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val m = Similarity.jlMatrix(16, 64)
    assert(m == Similarity.jlMatrix(16, 64), "matrix not deterministic")
    assert(m.flatten.forall(x => x == 1.0 || x == -1.0) && m.size == 16
           && m.forall(_.size == 64))
    val qp = col("vec_id") < 50
    val exact = Similarity.cosineTopK(e, qp, 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(shortlist: Int): Double = {
      val got = Similarity.jlTopKRefine(e, qp, 3, shortlist, 64, 16)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    // isotropic 64-dim bench embeddings are JL's HARD case (no cluster
    // structure, all pairwise cos ≈ 0, ε ≈ √(ln n / 16) ≈ 0.6 swamps
    // the 0.36 top-1 margin) — here the projection is a SHORTLIST
    // GENERATOR only: assert the knob's monotone lift and the measured
    // floor (0.43 at 15×, vs 0.006 for a random 45-of-499 shortlist)
    val r5 = recall(15); val r15 = recall(45)
    assert(r5 <= r15 + 1e-9, s"shortlist knob not monotone: $r5 vs $r15")
    assert(r15 >= 0.35, s"recall@3 with 15x shortlist is $r15")

    // clustered data (the structure real embedding corpora have — same
    // fixture family as the IVF recall tests): margins survive the
    // projection and the refine tail recovers the exact set
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val cd = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cExact = Similarity.cosineTopK(cd, col("vec_id") < 50, 3)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cGot = Similarity.jlTopKRefine(cd, col("vec_id") < 50, 3, 18, 64, 16)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cRecall = cGot.intersect(cExact).size.toDouble / cExact.size
    assert(cRecall >= 0.9, s"clustered recall@3 with 6x shortlist is $cRecall")
  }

  test("IVF nprobe is a working recall knob on isotropic bench embeddings") {
    // The bench embeddings are isotropic (mean pairwise cos ≈ 0, top-1
    // cos ≈ 0.36): with no cluster structure, recall is bounded by the
    // probed corpus fraction (measured: k=16 nprobe=2 → 0.42 vs 0.12
    // random baseline). Assert the knob's monotone lift here, and the
    // ≥0.9 bar at a probe fraction that can reach it (3 of 4 cells).
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val truth = exactTop3(e)
    val cents = Similarity.trainCentroids(e, k = 4)
    val r1 = recallAt3(e, cents, 1, truth)
    val r2 = recallAt3(e, cents, 2, truth)
    val r3 = recallAt3(e, cents, 3, truth)
    assert(r1 < r2 && r2 < r3, s"recall not monotone in nprobe: $r1, $r2, $r3")
    assert(r3 >= 0.85, s"recall@3 at k=4, nprobe=3 is $r3")
    assert(r1 >= 0.35, s"nprobe=1 recall $r1 below the cell-affinity lift")
  }

  test("hierarchical IVF: probing every coarse group reproduces the flat result exactly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    val idx = Similarity.buildCoarseIndex(cents)
    def rows(coarseProbe: Int) =
      Similarity.ivfTopK(e, cents, 3, nprobe = 2, coarseProbe = coarseProbe)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
                             r.getAs[Long]("cell"), r.getAs[Double]("cos"))).toSet
    // exhaustive coarse probing must descend into every fine cell, so
    // the same tie rule yields the identical pair set — pins that the
    // hierarchy changes COST, not semantics
    assert(rows(idx.groups.size) == rows(0))
  }

  test("hierarchical IVF keeps recall@3 >= 0.9 on clustered embeddings at O(sqrt k) assign cost") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 16)
    val truth = exactTop3(data)
    val got = Similarity.ivfTopK(data, cents, 3, nprobe = 2, coarseProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9, s"hierarchical recall@3 is $recall")
  }

  test("tree IVF: exhaustive top+coarse probing reproduces the flat result exactly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    val tree = Similarity.buildTreeIndex(cents)
    def rows(coarseProbe: Int, topProbe: Int) =
      Similarity.ivfTopK(e, cents, 3, nprobe = 2,
                         coarseProbe = coarseProbe, topProbe = topProbe)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
                             r.getAs[Long]("cell"), r.getAs[Double]("cos"))).toSet
    // probing every top group scores every coarse center; probing every
    // coarse group descends into every fine cell — so the 3-level
    // descent with exhaustive probes must equal the flat assignment,
    // pinning that the extra level changes COST, not semantics
    assert(rows(tree.fine.groups.size, tree.topGroups.size) == rows(0, 0))
  }

  test("tree IVF keeps recall@3 >= 0.9 on clustered embeddings at O(k^(1/3)) assign cost") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 16)
    // 16 fine cells -> 7 coarse -> 3 top; knobs sized like the 2-level
    // recall tests (probe ~half of each level)
    val got = Similarity.ivfTopK(data, cents, 3, nprobe = 2,
                                 coarseProbe = 3, topProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val truth = exactTop3(data)
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9, s"tree recall@3 is $recall")
  }

  test("frame-join assignment equals the literal descent at every quantizer depth") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    def literalCells(coarseProbe: Int, topProbe: Int) =
      Similarity.ivfIndex(e, cents, nprobe = 2, coarseProbe = coarseProbe,
                          topProbe = topProbe)
        .select(col("vec_id"), col("cells")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    def joinCells(frames: Similarity.IvfFrames, coarseProbe: Int, topProbe: Int) =
      Similarity.ivfCellsJoinFrame(e, frames, nprobe = 2,
                                   coarseProbe = coarseProbe, topProbe = topProbe)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    // flat (single group), two-level, and tree frames must reproduce
    // the native descent's probe list CELL FOR CELL, order included
    val flat = joinCells(Similarity.framesFlat(spark, cents), 1, 1)
    assert(flat == literalCells(0, 0), "flat frame path diverges from literal descent")
    val hier = joinCells(
      Similarity.framesOf(spark, Similarity.buildCoarseIndex(cents)), 2, 1)
    assert(hier == literalCells(2, 0), "hier frame path diverges from literal descent")
    val tree = joinCells(
      Similarity.framesOfTree(spark, Similarity.buildTreeIndex(cents)), 2, 2)
    assert(tree == literalCells(2, 2), "tree frame path diverges from literal descent")
  }

  test("ivfTopKJoin returns the identical result set to the literal ivfTopK") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    val frames = Similarity.framesOf(spark, Similarity.buildCoarseIndex(cents))
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
                 r.getAs[Long]("cell"), r.getAs[Double]("cos"),
                 r.getAs[Int]("rn"))).toSet
    val want = asSet(Similarity.ivfTopK(e, cents, 3, nprobe = 2, coarseProbe = 2))
    val got = asSet(Similarity.ivfTopKJoin(e, frames, 3, nprobe = 2, coarseProbe = 2))
    assert(got == want, "frame-backed top-k diverges from the literal path")
  }

  test("driver-free frame build: exhaustive probe equals brute force over its own cells") {
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(8)(Seq.fill(16)(rnd.nextGaussian()))
    val data = (0 until 240).map { i =>
      (i.toLong, centers(i % 8).map(_ + rnd.nextGaussian() * 0.1))
    }.toDF("vec_id", "v")
    val frames = Similarity.buildIvfFramesDistributed(data, k = 16)
    // structure: groups partition the cells, every group non-empty,
    // population-proportional shares land near k total
    val fine = frames.fine.collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("g"), r.getSeq[Double](2).toSeq))
    assert(fine.nonEmpty && fine.map(_._1).distinct.length == fine.length)
    val groups = fine.map(_._2).distinct.sorted
    assert(groups.forall(g => g >= 0 && g < frames.coarse.size))
    assert((groups.toSet -- (0L until frames.coarse.size.toLong).toSet).isEmpty)
    assert(math.abs(fine.length - 16) <= frames.coarse.size,
           s"${fine.length} cells vs k=16 (±coarseK slack)")
    // exhaustive probing (every group, every cell) must put each vector
    // in its true global-argmax cell — brute-forced over the collected
    // fine frame with the same round-4/tie discipline
    val got = Similarity.ivfCellsJoinFrame(data, frames,
        nprobe = 1, coarseProbe = frames.coarse.size)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).head).toMap
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = data.collect().map { r =>
      val v = r.getSeq[Double](1).toSeq
      r.getLong(0) -> fine.map(f => (f._1, r4(cos(v, f._3))))
        .minBy { case (cid, cs) => (-cs, cid) }._1
    }.toMap
    assert(got == want, "exhaustive frame probe diverges from brute-force argmax")
  }

  test("ivfIndexAuto: corpus to served index driver-free, recall >= 0.9 on clustered data") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val (frames, index) = Similarity.ivfIndexAuto(data, k0 = 16, nprobe = 2,
                                                  coarseProbe = 2)
    assert(index.columns.toSeq == Seq("vec_id", "v", "nrm", "cell", "cells"),
           s"index shape must match ivfIndex: ${index.columns.mkString(",")}")
    val truth = exactTop3(data)
    val got = Similarity.ivfTopKJoin(data, frames, 3, nprobe = 2, coarseProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9, s"driver-free IVF recall@3 is $recall")
  }

  test("distributed coarse training: valid structure, exhaustive probing equals flat") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    val idx = Similarity.buildCoarseIndexDistributed(cents)
    // structural contract: groups partition the centroid ids, no empty
    // group survives, one coarse center per kept group
    assert(idx.coarse.size == idx.groups.size)
    assert(idx.groups.forall(_.nonEmpty))
    assert(idx.groups.flatMap(_.map(_._1)).sorted == cents.map(_._1).sorted,
           "groups must partition the centroids")
    // exhaustive coarse probing must reproduce the flat assignment
    // under ANY valid grouping — the same pin the driver builder has
    graft.plans.GraftFunctions.register(spark)
    val nrm = sqrt(graft.pipeline.Similarity.dot(col("v"), col("v")))
    def assign(c: org.apache.spark.sql.Column) =
      e.select(col("vec_id"), element_at(c, 1).as("cell")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = assign(Similarity.ivfCellsOf(col("v"), nrm, cents, 1))
    val hier = assign(Similarity.ivfCellsOfHier(col("v"), nrm, idx, 1,
                                                coarseProbe = idx.groups.size))
    assert(hier == flat, "exhaustive distributed-index descent must equal flat")
    // and the auto builder picks the driver form below the bound
    val auto = Similarity.buildCoarseIndexAuto(cents)
    val driver = Similarity.buildCoarseIndex(cents)
    assert(auto.coarse == driver.coarse && auto.groups == driver.groups)
  }

  test("distributed coarse training keeps recall@3 >= 0.9 on clustered embeddings") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 16)
    val idx = Similarity.buildCoarseIndexDistributed(cents)
    graft.plans.GraftFunctions.register(spark)
    // same probe budget as the driver-built hier recall test, routed
    // through the distributed index
    val nrm = sqrt(Similarity.dot(col("v"), col("v")))
    val celled = data.select(col("vec_id"), col("v"), nrm.as("nrm"),
      element_at(Similarity.ivfCellsOfHier(col("v"), nrm, idx, 2, 2), 1).as("cell"),
      Similarity.ivfCellsOfHier(col("v"), nrm, idx, 2, 2).as("cells"))
    val a = celled.select(col("vec_id").as("query_id"), col("v").as("qv"),
                          col("nrm").as("qn"), explode(col("cells")).as("cell"))
    val b = celled.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm"), col("cell"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              (Similarity.dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val got = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val truth = exactTop3(data)
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9, s"distributed-coarse recall@3 is $recall")
  }

  test("ivfCellCount growth rule: sqrt(n) flat, n^(2/3) hierarchical, n^(3/4) tree") {
    assert(Similarity.ivfCellCount(1000000L, hierarchical = false) == 1000)
    assert(Similarity.ivfCellCount(1000000L) == 10000)
    assert(Similarity.ivfCellCount(1000000L, tree = true) == 31623)
    assert(Similarity.ivfCellCount(1L) == 1)
    assert(Similarity.ivfCellCount(8L) <= 8) // never more cells than vectors
  }

  test("the n^(2/3) cell-growth rule holds recall@3 >= 0.9 with a proportional nprobe") {
    // same planted-cluster corpus as the fixed-k recall tests, but the
    // index is sized by the rule ScaleProbe validated: cells = n^(2/3)
    // (47 at n=320) on the two-level quantizer. More cells mean smaller
    // cells, so the companion knobs scale with them — nprobe holds the
    // probed corpus fraction at ~1/8 and coarseProbe covers half the
    // coarse groups (FAISS grows nprobe with nlist the same way);
    // the per-query probe COST still falls because each probed cell is
    // a ~1/47th slice instead of a ~1/16th one.
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val k = Similarity.ivfCellCount(320)
    assert(k == 47, s"growth rule changed: cells($k) at n=320")
    val cents = Similarity.trainCentroids(data, k = k)
    val nprobe = math.max(2, math.ceil(k / 8.0).toInt)
    val coarseProbe = math.max(2, math.ceil(math.sqrt(k.toDouble) / 2).toInt)
    val truth = exactTop3(data)
    val got = Similarity.ivfTopK(data, cents, 3, nprobe = nprobe, coarseProbe = coarseProbe)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9,
           s"recall@3 is $recall at cells=$k nprobe=$nprobe coarseProbe=$coarseProbe")
  }

  test("sq8 quantization: per-element error bounded by scale/2, codes are dim bytes") {
    graft.plans.GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rows = e.select(col("v"), call_function("sq8_encode", col("v")).as("q8"))
      .select(col("v"), col("q8.mn"), col("q8.scale"), col("q8.codes")).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val v = r.getSeq[Double](0)
      val mn = r.getDouble(1); val scale = r.getDouble(2)
      val codes = r.getAs[Array[Byte]](3)
      assert(codes.length == v.length, "one byte per dimension")
      val maxErr = v.zip(codes).map { case (x, c) =>
        math.abs(x - (mn + (c & 0xff) * scale))
      }.max
      // floor(x + 0.5) rounds to the nearest level: error <= scale/2
      // (+ a few ulps of slack for the division round-trip)
      assert(maxErr <= scale / 2 + 1e-12, s"max reconstruction error $maxErr vs scale $scale")
    }
  }

  test("asymmetric sq8 dot equals the exact dot against the reconstruction") {
    graft.plans.GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val rows = e.select(col("v"),
        call_function("sq8_encode", col("v")).as("q8"))
      .select(col("v"), col("q8.mn"), col("q8.scale"), col("q8.codes"),
              call_function("sq8_dot_asym", col("v"), col("q8")).as("asym"))
      .collect()
    for (r <- rows) {
      val v = r.getSeq[Double](0)
      val mn = r.getDouble(1); val scale = r.getDouble(2)
      val codes = r.getAs[Array[Byte]](3)
      // the same sequential fold over v_i * (mn + code*scale) — must be
      // BIT-identical, not merely close
      var want = 0.0
      v.indices.foreach(i => want += v(i) * (mn + (codes(i) & 0xff) * scale))
      assert(r.getDouble(4) == want, s"asym dot diverges: ${r.getDouble(4)} vs $want")
    }
  }

  test("sq8 index survives a parquet round-trip (nullable struct fields still score)") {
    graft.plans.GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(20)
    val enc = e.select(col("vec_id"), col("v"),
                       call_function("sq8_encode", col("v")).as("q8"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8-rt").toString
    enc.select(col("vec_id"), col("q8")).write.mode("overwrite").parquet(dir)
    // parquet marks struct fields nullable on read — the dot expressions
    // must accept the round-tripped schema (name/type match, nullability
    // ignored) and score identically to the in-memory form
    val back = spark.read.parquet(dir)
    val want = enc.select(col("vec_id"),
        call_function("sq8_dot", col("q8"), col("q8")).as("d"),
        call_function("sq8_dot_asym", col("v"), col("q8")).as("da"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val got = back.join(e, Seq("vec_id"))
      .select(col("vec_id"),
        call_function("sq8_dot", col("q8"), col("q8")).as("d"),
        call_function("sq8_dot_asym", col("v"), col("q8")).as("da"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == want, "reloaded sq8 index scores diverge from the in-memory index")
  }

  test("sq8-compressed IVF: float-free index schema, recall parity with the float index") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 16)
    // the index must hold NO float vector column — that's its point
    val idx = Similarity.ivfIndexSq8(data, cents, nprobe = 2)
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    assert(!idx.schema.fields.exists(f => f.dataType == ArrayType(DoubleType, false) ||
                                          f.dataType == ArrayType(DoubleType, true)),
           s"sq8 index must not carry the float column: ${idx.schema.simpleString}")
    val truth = exactTop3(data)
    val got = Similarity.ivfTopKSq8(data, cents, 3, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    // same bar as the float-index ivfTopK test: compression must not
    // cost recall (cells are assigned on exact floats either way)
    assert(recall >= 0.9, s"sq8 IVF recall@3 is $recall")
  }

  test("sq8 top-k reaches recall >= 0.9 against the exact float scan") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val truth = exactTop3(e)
    val got = Similarity.sq8TopK(e, col("vec_id").isNotNull, 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    // 8 bits per dim on isotropic embeddings: near-exact ranking is
    // expected; the bar pins that compression does not cost recall
    assert(recall >= 0.9, s"sq8 recall@3 is $recall vs exact")
  }

  test("pq encode/score: asym is bit-exact vs reconstruction, sym matches its grouping") {
    graft.plans.GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(40)
    // fixed codebooks: sub-slices of the first 16 vectors (m=4, dsub=16)
    val base = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val cb = (0 until 4).map(s => base.map(_.slice(s * 16, s * 16 + 16)))
    val cbLit = typedLit(cb)
    val rows = e.select(col("v"),
        call_function("pq_encode", col("v"), cbLit).as("pqc"))
      .select(col("v"), col("pqc"),
        call_function("pq_dot", col("pqc"), col("pqc"), cbLit).as("sym"),
        call_function("pq_dot_asym", col("v"), col("pqc"), cbLit).as("asym"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val v = r.getSeq[Double](0)
      val codes = r.getAs[Array[Byte]](1).map(_ & 0xff)
      assert(codes.length == 4, "one byte per subspace")
      // brute-force the encode rule: nearest sub-centroid by L2, tie low
      val wantCodes = (0 until 4).map { s =>
        val sub = v.slice(s * 16, s * 16 + 16)
        cb(s).zipWithIndex.minBy { case (c, j) =>
          (sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, j) }._2
      }
      assert(codes.toSeq == wantCodes, s"encode diverges: ${codes.toSeq} vs $wantCodes")
      // asym: ONE continuous accumulator over the reconstruction —
      // must be BIT-identical to the manual in-order fold
      var asymWant = 0.0
      (0 until 4).foreach { s =>
        val c = cb(s)(codes(s))
        (0 until 16).foreach(d => asymWant += v(s * 16 + d) * c(d))
      }
      assert(r.getDouble(3) == asymWant, s"asym ${r.getDouble(3)} != $asymWant")
      // sym: per-subspace partials summed in subspace order
      var symWant = 0.0
      (0 until 4).foreach { s =>
        val c = cb(s)(codes(s))
        var part = 0.0
        (0 until 16).foreach(d => part += c(d) * c(d))
        symWant += part
      }
      assert(r.getDouble(2) == symWant, s"sym ${r.getDouble(2)} != $symWant")
    }
  }

  test("pq fails loudly on dimension mismatch and oversized codebooks") {
    intercept[IllegalArgumentException] {
      graft.plans.PqOps.Codebooks(Array.fill(2)(Array.fill(300)(Array(0.0))))
    }
    graft.plans.GraftFunctions.register(spark)
    val cb = Seq(Seq(Seq(1.0, 0.0)), Seq(Seq(0.0, 1.0))) // expects dim 4
    val bad = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      bad.select(call_function("pq_encode", col("v"), typedLit(cb))).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " | " + msgs(t.getCause)
    assert(msgs(e).contains("codebooks expect"), msgs(e).take(300))
  }

  test("ivf-pq: float-free m-byte index, recall near the float index on clustered data") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 16)
    val cb = Similarity.trainPqCodebooks(data, m = 8, ksub = 16)
    val idx = Similarity.ivfIndexPq(data, cents, cb, nprobe = 2)
    import org.apache.spark.sql.types.{ArrayType, DoubleType, BinaryType}
    assert(!idx.schema.fields.exists(f => f.dataType == ArrayType(DoubleType, false) ||
                                          f.dataType == ArrayType(DoubleType, true)),
           s"pq index must not carry the float column: ${idx.schema.simpleString}")
    assert(idx.schema("pqc").dataType == BinaryType)
    // memory ratio: m bytes of codes vs dim float64s — the codebook is
    // shared (ksub·dim doubles, amortized over the corpus), so the
    // per-vector ratio is dim·8 / m = 64× here
    val codeBytes = idx.select(length(col("pqc"))).head().getInt(0)
    assert(codeBytes == 8, s"expected m=8 code bytes, got $codeBytes")
    assert(64 * 8 / codeBytes >= 32, "per-vector compression below the PQ point")
    // 8-byte codes collapse same-cluster vectors toward shared
    // codebook centroids, so exact-neighbor ORDER within a cluster is
    // not PQ's contract — shortlist generation is. Assert the job it
    // is built for: every returned neighbor is from the query's
    // planted cluster (measured fidelity 1.000 at this ksub)
    val short = Similarity.ivfTopKPq(data, cents, cb, 3, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(short.nonEmpty)
    val offCluster = short.count { case (q, n) => q % 16 != n % 16 }
    assert(offCluster == 0,
           s"$offCluster/${short.length} PQ neighbors left the planted cluster")
  }

  test("ivf-pq refine: PQ shortlist + SQ8 re-rank recovers exact-neighbor recall") {
    // the FAISS IVFPQ + IndexRefine composition: direct PQ ordering
    // measures recall@3 ~0.5 at ksub=128 (codes collapse in-cluster),
    // the same codes as a SHORTLIST feeding an SQ8 re-rank recover it —
    // floats untouched at serve time on both legs
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 16)
    val cb = Similarity.trainPqCodebooks(data, m = 8, ksub = 128)
    val truth = exactTop3(data)
    val got = Similarity.ivfTopKPqRefine(data, cents, cb, k = 3, shortlist = 10,
                                         nprobe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9, s"refined ivf-pq recall@3 is $recall")
    // the refine leg must hand back exactly k rows per query
    val perQuery = got.groupBy(_._1).map(_._2.size).toSet
    assert(perQuery == Set(3), s"per-query result sizes $perQuery")
  }

  test("pqTopKRefine: exact-scan PQ shortlist + SQ8 re-rank recovers recall") {
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cb = Similarity.trainPqCodebooks(data, m = 8, ksub = 128)
    val truth = exactTop3(data)
    val got = Similarity.pqTopKRefine(data, lit(true), 3, 10, cb)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    assert(recall >= 0.9, s"exact-scan pq refine recall@3 is $recall")
  }

  test("ivfTopKJoinPq: frame-backed PQ equals the literal IVF-PQ path") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    val base = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val cb = (0 until 4).map(sp => base.map(_.slice(sp * 16, sp * 16 + 16)))
    val frames = Similarity.framesOf(spark, Similarity.buildCoarseIndex(cents))
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
                 r.getAs[Long]("cell"), r.getAs[Double]("cos"),
                 r.getAs[Int]("rn"))).toSet
    val want = asSet(Similarity.ivfTopKPq(e, cents, cb, 3, nprobe = 2,
                                          coarseProbe = 2))
    val got = asSet(Similarity.ivfTopKJoinPq(e, frames, cb, 3, nprobe = 2,
                                             coarseProbe = 2))
    assert(got == want, "frame-backed PQ top-k diverges from the literal IVF-PQ path")
    // the frame+PQ+refine stack returns k rows per query and stays
    // inside the candidate cells' pair universe
    val refined = Similarity.ivfTopKJoinPqRefine(e, frames, cb, 3, 10,
                                                 nprobe = 2, coarseProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val shortPairs = asSet(Similarity.ivfTopKJoinPq(e, frames, cb, 10, nprobe = 2,
                                                    coarseProbe = 2))
      .map(t => (t._1, t._2))
    assert(refined.subsetOf(shortPairs), "refine left its own shortlist")
    assert(refined.groupBy(_._1).forall(_._2.size == 3))
  }

  test("ivfTopKJoinSq8: frame-backed SQ8 equals the literal SQ8 path") {
    // the memory rung and the past-the-literal-ceiling rung COMPOSE:
    // same cells (assigned on exact floats via the frame join), same
    // SQ8 scores — result sets identical tuple for tuple
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    val frames = Similarity.framesOf(spark, Similarity.buildCoarseIndex(cents))
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
                 r.getAs[Long]("cell"), r.getAs[Double]("cos"),
                 r.getAs[Int]("rn"))).toSet
    val want = asSet(Similarity.ivfTopKSq8(e, cents, 3, nprobe = 2, coarseProbe = 2))
    val got = asSet(Similarity.ivfTopKJoinSq8(e, frames, 3, nprobe = 2, coarseProbe = 2))
    assert(got == want, "frame-backed SQ8 top-k diverges from the literal SQ8 path")
    // and the frame index is float-free like the literal SQ8 index
    val idx = Similarity.ivfIndexJoinSq8(e, frames, nprobe = 2, coarseProbe = 2)
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    assert(!idx.schema.fields.exists(f => f.dataType == ArrayType(DoubleType, false) ||
                                          f.dataType == ArrayType(DoubleType, true)),
           s"frame SQ8 index must not carry floats: ${idx.schema.simpleString}")
  }

  test("ivfProbeConfig holds recall >= 0.9 at every quantizer depth from one fraction") {
    // the probed-corpus-fraction invariant: one fraction (1/8), three
    // depths — the returned knobs must hit the same recall bar the
    // hand-tuned suite configs do on clustered data
    val rnd = new scala.util.Random(7)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 16)
    val truth = exactTop3(data)
    def recallWith(np: Int, cp: Int, tp: Int): Double = {
      val got = Similarity.ivfTopK(data, cents, 3, nprobe = np,
                                   coarseProbe = cp, topProbe = tp)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val (fn, fc, ft) = Similarity.ivfProbeConfig(16, 0.125, hierarchical = false)
    assert(fc == 0 && ft == 0)
    val rFlat = recallWith(fn, 0, 0)
    val (hn, hc, ht) = Similarity.ivfProbeConfig(16, 0.125)
    assert(ht == 0 && hc >= 2)
    val rHier = recallWith(hn, hc, 0)
    val (tn, tc, tt) = Similarity.ivfProbeConfig(16, 0.125, tree = true)
    assert(tt >= 2)
    val rTree = recallWith(tn, tc, tt)
    assert(rFlat >= 0.9 && rHier >= 0.9 && rTree >= 0.9,
           s"recall flat=$rFlat hier=$rHier tree=$rTree at fraction 1/8")
    // structure: knob growth is monotone with depth (deeper quantizers
    // need wider beams to reach the same fraction), and the fraction
    // knob itself is monotone
    val (n2, _, _) = Similarity.ivfProbeConfig(16, 0.25)
    assert(n2 >= hn)
  }

  test("centroids round-trip through parquet persistence") {
    val cents = Similarity.trainCentroids(
      (0 until 40).map(i => (i.toLong, Seq.tabulate(8)(j => (i * 31 + j * 7 % 13).toDouble)))
        .toDF("vec_id", "v"), k = 5)
    val path = java.nio.file.Files.createTempDirectory("graft-cents").toString + "/cents"
    Similarity.saveCentroids(spark, cents, path)
    val loaded = Similarity.loadCentroids(spark, path)
    assert(loaded == cents.sortBy(_._1),
           "persisted centroids must round-trip exactly (bit-identical doubles)")
  }

  test("equal centroid sets share one cached IVF index across invocations") {
    // Quantizer equality must be structural: centroids rebuilt per call
    // are equal in value but not by reference. With reference equality
    // the canonicalized index plans would differ and every invocation
    // would add a CacheManager entry — breaking the materialized-index
    // memo (bench steady-state semantics) and leaking caches.
    def freshCents = (0 until 4).map(i =>
      i -> Seq.tabulate(8)(j => math.sin(i * 8 + j + 1.0))).toSeq
    val data = (0 until 40).map(i =>
      (i.toLong, Seq.tabulate(8)(j => math.cos(i + j * 0.7)))).toDF("vec_id", "v")
    assert(Similarity.ivfTopK(data, freshCents, 2, nprobe = 2, coarseProbe = 2).count() > 0)
    val n1 = spark.sparkContext.getPersistentRDDs.size
    assert(Similarity.ivfTopK(data, freshCents, 2, nprobe = 2, coarseProbe = 2).count() > 0)
    val n2 = spark.sparkContext.getPersistentRDDs.size
    assert(n2 == n1,
           s"second ivfTopK with equal centroids grew persistent RDDs $n1 -> $n2")
  }

  test("multi-probe LSH (Hamming-1) lifts recall@3 to >= 0.9 on clustered embeddings") {
    // same planted-cluster corpus shape as the IVF recall test: near
    // neighbors are same-cluster vectors whose sign patterns differ by
    // at most a plane or two, so probing the Hamming-1 buckets recovers
    // the pairs a single hashed bucket splits
    val rnd = new scala.util.Random(13)
    val centers = Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
    val data = (0 until 320).map { i =>
      (i.toLong, centers(i % 16).map(_ + rnd.nextGaussian() * 0.15))
    }.toDF("vec_id", "v")
    val planes = Seq.fill(6)(Seq.fill(64)(rnd.nextGaussian()))
    val truth = exactTop3(data)
    def recall(mp: Boolean): Double = {
      val got = Similarity.lshBucketTopK(data, planes, 3, multiProbe = mp).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val r1 = recall(mp = false)
    val rM = recall(mp = true)
    assert(rM >= r1, s"multi-probe lowered recall: $r1 -> $rM")
    assert(rM >= 0.9, s"multi-probe recall@3 is $rM (single-probe $r1)")
  }

  test("LSH buckets separate opposite-sign vectors, keep identical together") {
    // second plane normal to z so no test vector lies ON a hyperplane
    val planes = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0))
    val out = Similarity.lshBucketTopK(vecs, planes, 3).collect()
    val n0 = out.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Long]("neighbor_id"))
    assert(n0.contains(1L) && n0.contains(2L)) // same hemisphere
    assert(!n0.contains(3L) && !n0.contains(4L)) // different buckets
  }

  test("semanticDedup: transitive chains collapse, cross-cell strangers stay singletons") {
    // x-axis family: a chain where ends are NOT pairwise similar at tau
    // (cos(v10,v12) ≈ 0.92 < 0.95) but adjacent links are (≈ 0.98) —
    // transitivity must still fuse all three. y-axis: one lone vector.
    def rot(theta: Double) = Seq(math.cos(theta), math.sin(theta), 0.0)
    val e = Seq(
      10L -> rot(0.0), 11L -> rot(0.2), 12L -> rot(0.4),  // chain in cell 0
      20L -> Seq(0.7, 0.72, 0.0),                          // cell 0/1 border, unique
      30L -> Seq(0.0, 1.0, 0.0)                            // cell 1, unique
    ).map { case (id, v) => (id, v) }.toDF("vec_id", "v")
    val cents = Seq(0 -> Seq(1.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0))
    val out = Similarity.semanticDedup(e, cents, 0.95)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("is_keeper"), r.getAs[Long]("n_cluster")))
      .toMap
    assert(out.size == 5, "every vector gets a verdict row")
    assert(out(10L) == ((10L, 1L, 3L)), s"chain keeper: ${out(10L)}")
    assert(out(11L) == ((10L, 0L, 3L)) && out(12L) == ((10L, 0L, 3L)),
           s"transitive fuse: $out")
    assert(out(20L) == ((20L, 1L, 1L)) && out(30L) == ((30L, 1L, 1L)),
           s"dissimilar vectors stay singleton keepers: $out")
  }

  test("semanticDedupFrames nprobe=1 is verdict-identical to the literal path") {
    def rot(theta: Double) = Seq(math.cos(theta), math.sin(theta), 0.0)
    val e = Seq(
      10L -> rot(0.0), 11L -> rot(0.2), 12L -> rot(0.4),
      20L -> Seq(0.7, 0.72, 0.0),
      30L -> Seq(0.0, 1.0, 0.0)
    ).toDF("vec_id", "v")
    val cents = Seq(0 -> Seq(1.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cell", "cluster", "is_keeper", "n_cluster")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                             r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val lit0 = canon(Similarity.semanticDedup(e, cents, 0.95)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
              col("cluster"), col("is_keeper"), col("n_cluster")))
    val frm = canon(Similarity.semanticDedupFrames(
        e, Similarity.framesFlat(spark, cents), 0.95, nprobe = 1)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
              col("cluster"), col("is_keeper"), col("n_cluster")))
    assert(frm == lit0, s"frame path must replay the literal verdicts:\n$frm\nvs\n$lit0")
  }

  test("semanticDedupFrames nprobe=2 catches the straddling pair the single-cell pass misses") {
    // centroids at 0°, 45°, 90° in the xy-plane; the planted near-dup
    // pair sits at 22°/23° — EITHER side of the 22.5° cell boundary
    // (cos(v1,v2) = cos(1°) ≈ 0.999848 ≥ tau), so their home cells
    // differ and the single-probe pass never compares them, while each
    // vector's top-2 probed cells are {0, 1} and the pair meets there
    def rot(deg: Double) =
      Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)), 0.0)
    val e = Seq(1L -> rot(22.0), 2L -> rot(23.0), 9L -> rot(88.0))
      .toDF("vec_id", "v")
    val cents = Seq(0 -> rot(0.0), 1 -> rot(45.0), 2 -> rot(90.0))
    def verdicts(nprobe: Int) = Similarity.semanticDedupFrames(
        e, Similarity.framesFlat(spark, cents), 0.999, nprobe = nprobe)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cell"), r.getAs[Long]("cluster"),
         r.getAs[Long]("is_keeper"), r.getAs[Long]("n_cluster"))).toMap
    val single = verdicts(1)
    assert(single(1L)._1 == 0L && single(2L)._1 == 1L,
           s"the pair must straddle two home cells: $single")
    assert(single(1L)._4 == 1L && single(2L)._4 == 1L,
           s"single-probe provably misses the straddling pair: $single")
    val multi = verdicts(2)
    assert(multi(1L)._2 == multi(2L)._2 && multi(1L)._4 == 2L,
           s"multi-probe must fuse the straddling pair: $multi")
    assert(multi(1L)._1 == 0L && multi(2L)._1 == 1L,
           "ledger still reports each vector's HOME cell")
    assert(multi(9L)._4 == 1L, "distant vector stays a singleton keeper")
  }

  test("embedDocs: integer-exact, text-keyed, token-less docs emit no row") {
    val docs = Seq((1L, "a b a"), (2L, "a b a"), (3L, "z z q w v u t y"),
                   (4L, "   ")).toDF("doc_id", "text")
    val out = Similarity.embedDocs(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "token-less doc 4 must emit no row")
    assert(out(1L).size == 16)
    assert(out.values.flatten.forall(v => v == math.rint(v)),
           "micro-grid tf × ±1 matrix must give exact integer coordinates")
    assert(out(1L) == out(2L), "identical text embeds identically")
    assert(out(1L) != out(3L), "different text diverges")
    // and the output feeds the ANN family unchanged
    val e = Similarity.embedDocs(docs, "doc_id", "text")
      .select(col("doc_id").as("vec_id"), col("v"))
    val nn = Similarity.cosineTopK(e, col("vec_id") === 1L, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(nn == Seq((1L, 2L)), s"doc 2 is doc 1's exact nearest neighbor: $nn")
  }

  test("semanticContamination: paraphrase-near corpus docs flag, eval side excluded") {
    val e = Seq(
      (0L, Seq(10.0, 0.0)),   // eval item A
      (50L, Seq(0.0, 10.0)),  // eval item B
      (1L, Seq(10.0, 1.0)),   // near A → contaminated
      (2L, Seq(1.0, 10.0)),   // near B → contaminated
      (3L, Seq(7.0, 7.0))     // equidistant, below tau
    ).toDF("vec_id", "v")
    val out = Similarity.semanticContamination(e, col("vec_id") % 50 === 0, 0.97)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "eval rows never appear as corpus rows")
    assert(out(1L)._1 == 0L && out(1L)._3 == 1L, s"doc 1 flags against eval 0: $out")
    assert(out(2L)._1 == 50L && out(2L)._3 == 1L, s"doc 2 flags against eval 50: $out")
    assert(out(3L)._3 == 0L && out(3L)._1 == 0L,
           s"below-tau doc stays clean, cos tie → lowest eval id: $out")
  }

  test("kmeansCentroids: by-hand Lloyd replay — integer-grid means, stable fixpoint") {
    val e = Seq(
      (0L, Seq(10.0, 0.0)), (1L, Seq(0.0, 10.0)), (2L, Seq(8.0, 1.0)),
      (3L, Seq(1.0, 9.0)), (4L, Seq(9.0, 2.0))
    ).toDF("vec_id", "v")
    // init c0=(10,0), c1=(0,10); iter1 assigns {0,2,4}/{1,3} by cosine →
    // c0 = round(mean((10,0),(8,1),(9,2))) = (9,1),
    // c1 = round(mean((0,10),(1,9))) = round((0.5,9.5)) = (1,10) — the
    // half-away-from-zero grid round; iter2 re-assigns identically, so
    // the centroids are a fixpoint.
    val cents = Similarity.kmeansCentroids(e, 2, 2)
    assert(cents == Seq(0 -> Seq(9.0, 1.0), 1 -> Seq(1.0, 10.0)),
           s"hand-computed Lloyd fixpoint: $cents")
    val asg = Similarity.kmeansAssign(e, cents).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(asg.view.mapValues(_._1).toMap ==
             Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L))
    assert(asg(0L)._3 == 3L && asg(1L)._3 == 2L, "n_cell reports cell population")
    assert(asg(2L)._2 == 0.9999, s"round-4 cosine to assigned centroid: ${asg(2L)}")
  }

  test("kmeansCentroids: an emptied cell keeps its previous centroid") {
    // both centroids start colinear → every vector round-4-ties to both
    // and the tie rule sends all to cell 0; cell 1 must keep (20,0).
    val e = Seq((0L, Seq(10.0, 0.0)), (1L, Seq(20.0, 0.0))).toDF("vec_id", "v")
    val cents = Similarity.kmeansCentroids(e, 2, 1)
    assert(cents == Seq(0 -> Seq(15.0, 0.0), 1 -> Seq(20.0, 0.0)),
           s"cell0 = mean of all, cell1 = unchanged init: $cents")
  }

  test("clusterBalancedSample: per-cell cap, prototypical-first order") {
    val e = Seq(
      (0L, Seq(10.0, 0.0)), (1L, Seq(0.0, 10.0)), (2L, Seq(8.0, 1.0)),
      (3L, Seq(1.0, 9.0)), (4L, Seq(9.0, 2.0))
    ).toDF("vec_id", "v")
    val cents = Similarity.kmeansCentroids(e, 2, 2)
    val top1 = Similarity.clusterBalancedSample(e, cents, 1).collect()
      .map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(top1 == Map(0L -> 2L, 1L -> 3L),
           s"highest round-4 cosine per cell wins: $top1")
    val all = Similarity.clusterBalancedSample(e, cents, 2).collect()
    assert(all.length == 4 && all.forall(_.getLong(4) <= 2L),
           "m = 2 caps every cell at two rows")
    // the outlier twin inverts the order: farthest-from-centroid first
    val out1 = Similarity.clusterOutliers(e, cents, 1).collect()
      .map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(out1 == Map(0L -> 0L, 1L -> 1L),
           s"lowest round-4 cosine per cell leads the review queue: $out1")
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq((1L, "abc"), (2L, "a" * 200)).toDF("doc_id", "text")

  test("byte_sum expression: codegen sum equals manual sum") {
    GraftSumCheck.check(spark)
  }

  test("rolling_hash expression: known Rabin-Karp values, empty = 0") {
    graft.plans.GraftFunctions.register(spark)
    val got = Seq("hello world", "").toDF("s")
      .select(call_function("rolling_hash", encode(col("s"), "UTF-8")).as("h"))
      .collect().map(_.getLong(0))
    // fold((h*257 + byte) % 1e9+7) over UTF-8 bytes, cross-checked
    // against an independent computation of the same recurrence
    assert(got(0) == 739570078L, s"got ${got(0)}")
    assert(got(1) == 0L)
    // direct helper agrees with the codegen'd path
    assert(graft.plans.RollingHash.hash("hello world".getBytes("UTF-8")) == 739570078L)
  }

  test("media table carries byte-accurate metadata") {
    val m = Multimodal.mediaTable(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getStruct(2)).toMap
    assert(m(1L).getAs[Long]("n_bytes") == 3L)
    assert(m(1L).getAs[Long]("n_frames") == 1L)
    assert(m(2L).getAs[Long]("n_bytes") == 200L)
    assert(m(2L).getAs[Long]("n_frames") == 4L) // ceil(200/64)
  }

  test("multimodal ops run unchanged on a stream (batch parity)") {
    // mediaTable → frameSample → frameFeatures is pure projection +
    // generator (no state, no time semantics), so the SAME calls must
    // work on a readStream frame in append mode — the streaming posture
    // of the q61/q62 plumbing (ingest-time media feature extraction)
    graft.plans.GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-media").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    def features(df: org.apache.spark.sql.DataFrame) =
      Multimodal.frameFeatures(Multimodal.frameSample(
        Multimodal.mediaTable(df, "doc_id", "text")))
    val expected = features(docs).collect().map(_.toString).toSet
    val q = features(stream).writeStream.outputMode("append")
      .format("memory").queryName("media_parity").start()
    try {
      q.processAllAvailable()
      val got = spark.table("media_parity").collect().map(_.toString).toSet
      assert(got == expected, "streamed multimodal features != batch")
    } finally q.stop()
  }

  test("cdc chunking runs unchanged on a stream (batch parity)") {
    // stateless CDC is a pure projection (every cut local to its
    // window), so ingest-time chunking is the same call on a
    // readStream frame — chunk-level dedup then reduces to the
    // streaming exact-dedup problem on chunk_hash
    import graft.pipeline.TextDedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running"),
      (2L, ("chunk me please " * 30).trim),
      (3L, "tiny")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-cdc").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val expected = TextDedup.cdcChunks(docs, "doc_id", "text")
      .collect().map(_.toString).toSet
    val q = TextDedup.cdcChunks(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("cdc_parity").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdc_parity").collect().map(_.toString).toSet
      assert(got == expected, "streamed cdc chunks != batch")
    } finally q.stop()
  }

  test("streaming chunk-level dedup: CDC chunks compose with streamingDedup end-to-end") {
    // ingest-time chunk dedup = cdcChunks (pure projection, ds carried
    // through) -> streamingDedup on chunk_hash (watermark-bounded
    // first-arrival state) — the streaming form of q73's resolution.
    // Docs 1 and 2 are identical, so every chunk content arrives twice;
    // the deduped stream must emit each distinct chunk hash exactly once.
    import graft.pipeline.TextDedup
    import graft.streaming.StreamOps
    val docs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), ("shared content block " * 20).trim),
      (2L, java.sql.Timestamp.valueOf("2024-03-01 00:01:00"), ("shared content block " * 20).trim),
      (3L, java.sql.Timestamp.valueOf("2024-03-01 00:02:00"), "entirely different text that stands alone")
    ).toDF("doc_id", "ds", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-chunkdedup").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val deduped = StreamOps.streamingDedup(
      TextDedup.cdcChunks(stream, "doc_id", "text", passthrough = Seq("ds")),
      col("chunk_hash"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("chunk_dedup_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("chunk_dedup_stream").collect()
      val batchHashes = TextDedup.cdcChunks(docs, "doc_id", "text")
        .select("chunk_hash").distinct().collect().map(_.getString(0)).toSet
      assert(got.length == batchHashes.size,
        s"one emission per distinct chunk: ${got.length} vs ${batchHashes.size}")
      assert(got.map(_.getAs[String]("chunk_hash")).toSet == batchHashes)
    } finally q.stop()
  }

  test("deterministicSplit: stable under corpus growth, weights respected, zero-shuffle") {
    import graft.pipeline.TextAnalysis
    val small = (0L until 500L).toDF("doc_id")
    val grown = (0L until 1000L).toDF("doc_id")
    def splits(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.deterministicSplit(df, "doc_id").collect()
        .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val a = splits(small)
    val b = splits(grown)
    // growth stability: every original doc keeps its assignment
    assert(a.forall { case (id, s) => b(id) == s },
      "corpus growth must not reassign existing documents")
    // weights: 90/5/5 within sampling tolerance at n=1000
    val frac = b.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.05, s"train frac ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0.005 && frac.getOrElse("test", 0.0) > 0.005)
    // pure projection: no shuffle in the plan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = TextAnalysis.deterministicSplit(grown, "doc_id").queryExecution.sparkPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }

  test("real image/audio decode runs unchanged on a stream (batch parity)") {
    // gen_bmp/decode_image and gen_wav/decode_audio are pure per-row
    // native expressions (no state, no shuffle), so ingest-time media
    // decoding is just the same calls on a readStream frame
    graft.plans.GraftFunctions.register(spark)
    val ids = Seq(3L, 4L, 5L).toDF("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-decode").toString
    ids.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ids.schema).parquet(dir)
    def decoded(df: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeImage(Multimodal.imageTable(df, "doc_id"))
        .join(Multimodal.decodeAudio(Multimodal.audioTable(df, "doc_id", nSamples = 32))
                .withColumnRenamed("mime", "audio_mime"), "doc_id")
    val expected = decoded(ids).collect().map(_.toString).toSet
    val q = decoded(stream).writeStream.outputMode("append")
      .format("memory").queryName("decode_parity").start()
    try {
      q.processAllAvailable()
      val got = spark.table("decode_parity").collect().map(_.toString).toSet
      assert(got == expected, "streamed media decode != batch")
    } finally q.stop()
  }

  test("FrameLimitRule pushes frame_idx bounds into the sequence generator") {
    graft.plans.GraftFunctions.register(spark)
    val media = Multimodal.mediaTable(docs, "doc_id", "text") // doc 2 has 4 frames
    val limited = Multimodal.frameSample(media).filter(col("frame_idx") < 2)
    // the optimized plan must bound the sequence itself, not just filter
    val optimized = limited.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least("), s"sequence bound not pushed:\n$optimized")
    // and results are identical to the unrewritten semantics
    val got = limited.select("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 0L), (2L, 1L)))
  }

  test("FrameLimitRule preserves null bounds (no fabricated rows)") {
    // The rule is session-wide, so any user plan exploding a NULLABLE
    // sequence bound must keep its semantics: explode(sequence(0, null))
    // is zero rows, and least() alone would turn null into k-1.
    graft.plans.GraftFunctions.register(spark)
    val df = Seq((1L, Some(3L)), (2L, None: Option[Long]))
      .toDF("id", "stop")
      .select(col("id"), explode(sequence(lit(0L), col("stop"))).as("out"))
      .filter(col("out") < 2)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (1L, 1L)), s"null stop fabricated rows: $got")
    // and the bound IS still pushed for the non-null rows
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least("), s"sequence bound not pushed:\n$optimized")
  }

  test("empty payload emits zero frames (no descending sequence)") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(Multimodal.mediaTable(empty, "doc_id", "text"))
    assert(frames.count() == 0L)
  }

  test("frame sampling covers every byte exactly once") {
    val frames = Multimodal.frameFeatures(
      Multimodal.frameSample(Multimodal.mediaTable(docs, "doc_id", "text")))
    val agg = frames.groupBy("doc_id")
      .agg(sum("frame_bytes").as("total"), sum("frame_sum").as("bytesum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(agg(1L)._1 == 3L && agg(1L)._2 == 'a'.toLong + 'b' + 'c')
    assert(agg(2L)._1 == 200L && agg(2L)._2 == 200L * 'a'.toLong)
  }

  test("gen_bmp emits genuine codec bytes: javax.imageio decodes them directly") {
    // the synthesized payload must be a REAL image, not image-shaped
    // bytes — prove it by decoding on the driver with the JDK API alone
    val bytes = graft.plans.GenBmp.bmp(7L, 5, 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected gen_bmp output")
    assert(img.getWidth == 5 && img.getHeight == 3)
    // spot-check pixel (2, 1): BMP rows are bottom-up, decoded top-down,
    // so decoded (x=2, y=1) is stored row y'=h-1-y=1 → same formula y=1
    val rgb = img.getRGB(2, 1)
    val v = java.lang.Math.floorMod(7L * 31 + 7 * 2 + 13 * 1, 256L).toInt
    assert((rgb & 0xff) == v, "blue channel")
    assert(((rgb >>> 8) & 0xff) == (v + 85) % 256, "green channel")
    assert(((rgb >>> 16) & 0xff) == (v + 170) % 256, "red channel")
  }

  test("decode_image: exact channel means end-to-end; null for garbage bytes") {
    graft.plans.GraftFunctions.register(spark)
    val ids = Seq(0L, 1L, 12345L).toDF("doc_id")
    val got = Multimodal.decodeImage(Multimodal.imageTable(ids, "doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    for (id <- Seq(0L, 1L, 12345L)) {
      val px = for { y <- 0 until 4; x <- 0 until 4 }
        yield java.lang.Math.floorMod(id * 31 + 7 * x + 13 * y, 256L).toInt
      val (w, h, mr, mg, mb) = got(id)
      assert(w == 4 && h == 4)
      // k/16 is exactly representable: equality, not tolerance
      assert(mb == px.sum / 16.0, s"mean_b id=$id")
      assert(mg == px.map(v => (v + 85) % 256).sum / 16.0, s"mean_g id=$id")
      assert(mr == px.map(v => (v + 170) % 256).sum / 16.0, s"mean_r id=$id")
    }
    // undecodable payloads yield null stats (skip-don't-poison)
    val junk = Seq((1L, Array[Byte](1, 2, 3), "junk/bytes")).toDF("doc_id", "media", "mime")
      .select(col("doc_id"), col("media"), struct(col("mime")).as("meta"))
    val r = junk.select(call_function("decode_image", col("media")).as("img")).collect()
    assert(r.head.isNullAt(0), "garbage bytes should decode to null")
  }

  test("image_ahash: by-hand bit replay; perceptual dedup clusters identical pixels") {
    graft.plans.GraftFunctions.register(spark)
    // ids i and i+256 render IDENTICAL pixels (id·31 mod 256 wraps), so
    // they must share an ahash and cluster with keeper = the smaller id
    val ids = Seq(1L, 257L, 2L).toDF("doc_id")
    val out = Multimodal.imagePerceptualDedup(Multimodal.imageTable(ids, "doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set(1L, 257L, 2L), "every decodable image emits a row")
    assert(out(1L)._1 == out(257L)._1, "identical pixels -> identical ahash")
    assert(out(1L)._2 == 1L && out(257L)._2 == 1L, "cluster keeper = min id")
    assert(out(1L)._3 == 2L && out(1L)._4 == 1L && out(257L)._4 == 0L)
    // by-hand replay: decoded image row y holds generator storage row 3-y
    // (bottom-up BMP), luminance threshold is the integer compare
    for (id <- Seq(1L, 2L)) {
      val lums = for { y <- 0 until 4; x <- 0 until 4 } yield {
        val b = java.lang.Math.floorMod(id * 31 + 7 * x + 13 * (3 - y), 256L).toInt
        (b + ((b + 85) % 256) + ((b + 170) % 256)).toLong
      }
      val tot = lums.sum
      val want = lums.zipWithIndex
        .collect { case (l, i) if l * 16 > tot => 1L << i }.sum
      assert(out(id)._1 == want, s"ahash mismatch for id=$id")
    }
    // garbage bytes are skipped, not fabricated
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    assert(Multimodal.imagePerceptualDedup(junk).count() == 0)
  }

  test("image_resize: integer box means, orientation-exact round-trip, upscale nulls") {
    graft.plans.GraftFunctions.register(spark)
    val ids = Seq(5L, 42L).toDF("doc_id")
    val rs = Multimodal.resizeImages(Multimodal.imageTable(ids, "doc_id"), 2, 2)
    val got = Multimodal.decodeImage(rs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    for (id <- Seq(5L, 42L)) {
      // image-oriented input pixels (decoder flips the bottom-up BMP)
      def bAt(x: Int, yImg: Int): Int =
        java.lang.Math.floorMod(id * 31 + 7 * x + 13 * (3 - yImg), 256L).toInt
      val boxes = for { oy <- 0 until 2; ox <- 0 until 2 } yield {
        val ps = for { dy <- 0 until 2; dx <- 0 until 2 }
          yield bAt(ox * 2 + dx, oy * 2 + dy)
        (ps.map(v => (v + 170) % 256).sum / 4,
         ps.map(v => (v + 85) % 256).sum / 4,
         ps.sum / 4)
      }
      val (w, h, mr, mg, mb) = got(id)
      assert(w == 2 && h == 2)
      assert(mr == boxes.map(_._1).sum / 4.0, s"mean_r id=$id")
      assert(mg == boxes.map(_._2).sum / 4.0, s"mean_g id=$id")
      assert(mb == boxes.map(_._3).sum / 4.0, s"mean_b id=$id")
    }
    // downscale-only: resizing 4x4 up to 8x8 nulls out and decode skips
    val up = Multimodal.resizeImages(Multimodal.imageTable(ids, "doc_id"), 8, 8)
    assert(up.filter(col("media").isNotNull).count() == 0)
  }

  test("audio_energy_fp: by-hand delta-sign replay; dedup clusters identical contours") {
    graft.plans.GraftFunctions.register(spark)
    val ids = Seq(3L, 7L).toDF("doc_id")
    val out = Multimodal.audioPerceptualDedup(Multimodal.audioTable(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- Seq(3L, 7L)) {
      val samples = (0 until 256).map(t =>
        (java.lang.Math.floorMod(id * 31 + t * 7919L, 2048L) - 1024L))
      val energies = samples.grouped(16).map(_.map(v => v * v).sum).toSeq
      val want = energies.sliding(2).zipWithIndex
        .collect { case (Seq(a, b), k) if b > a => 1L << k }.sum
      assert(out(id) == want, s"fingerprint mismatch for id=$id")
    }
    // volume scaling preserves the contour: halving every sample (a
    // quieter copy of the same clip) keeps all delta signs
    val bytes = graft.plans.GenWav.wav(3L, 256, 8000)
    val fpFull = graft.plans.AudioEnergyFp.fp(bytes, 16)
    // synthesize the half-volume clip through the same WAV writer path
    val half = {
      val data = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes)).readAllBytes()
      val out2 = bytes.clone()
      var i = 0
      while (i < data.length / 2) {
        val v = (((data(i * 2 + 1) << 8) | (data(i * 2) & 0xff)).toShort / 2).toShort
        out2(44 + i * 2) = (v & 0xff).toByte
        out2(44 + i * 2 + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      out2
    }
    assert(graft.plans.AudioEnergyFp.fp(half, 16) == fpFull,
           "half-volume copy must keep the energy contour")
    // garbage bytes skipped
    val junk = Seq((9L, Array[Byte](0, 1, 2))).toDF("doc_id", "media")
    assert(Multimodal.audioPerceptualDedup(junk).count() == 0)
  }

  test("gen_gif/decode_video: lossless frame sequence, exact per-frame means end-to-end") {
    graft.plans.GraftFunctions.register(spark)
    // the exact-palette indexed write makes GIF LZW lossless: every
    // decoded frame mean must EQUAL the formula prediction (k/16)
    val ids = Seq(0L, 42L).toDF("doc_id")
    val got = Multimodal.decodeVideo(Multimodal.videoTable(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        ((r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.size == 8, "2 videos x 4 frames")
    for (id <- Seq(0L, 42L); f <- 0 until 4) {
      val px = for { y <- 0 until 4; x <- 0 until 4 }
        yield java.lang.Math.floorMod(id * 31 + 7 * x + 13 * y + 17 * f, 256L).toInt
      val (w, h, mr, mg, mb) = got((id, f))
      assert(w == 4 && h == 4)
      assert(mr == px.map(v => (v + 170) % 256).sum / 16.0, s"mean_r id=$id f=$f")
      assert(mg == px.map(v => (v + 85) % 256).sum / 16.0, s"mean_g id=$id f=$f")
      assert(mb == px.sum / 16.0, s"mean_b id=$id f=$f")
    }
    // the payload is a genuine GIF: the JDK sniffs and reads it back
    val bytes = graft.plans.GenGif.gif(7L, 4, 4, 3)
    assert(bytes.take(6).map(_.toChar).mkString.startsWith("GIF8"))
    val arr = graft.plans.DecodeVideo.decode(bytes)
    assert(arr != null && arr.numElements() == 3, "3 stored frames read back")
    // garbage bytes are skipped, not fabricated
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
      .select(col("doc_id"), col("media"),
              struct(lit("video/gif").as("mime")).as("meta"))
    assert(Multimodal.decodeVideo(junk).count() == 0)
  }

  test("gen_avi/decode_video: RIFF container round-trip, exact DIB means, MJPEG parity") {
    graft.plans.GraftFunctions.register(spark)
    // DIB frames are bit-exact: every decoded mean must EQUAL the
    // formula prediction (k/15 — width 5 exercises the 4-byte row pad)
    val ids = Seq(0L, 42L).toDF("doc_id")
    val got = Multimodal.decodeVideo(Multimodal.videoTableAvi(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(2)) ->
        ((r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.size == 10, "2 videos x 5 frames")
    for (id <- Seq(0L, 42L); f <- 0 until 5) {
      val px = for { y <- 0 until 3; x <- 0 until 5 }
        yield java.lang.Math.floorMod(id * 31 + 7 * x + 13 * y + 17 * f, 256L).toInt
      val (w, h, mr, mg, mb) = got((id, f))
      assert(w == 5 && h == 3)
      assert(mr == px.map(v => (v + 170) % 256).sum / 15.0, s"mean_r id=$id f=$f")
      assert(mg == px.map(v => (v + 85) % 256).sum / 15.0, s"mean_g id=$id f=$f")
      assert(mb == px.sum / 15.0, s"mean_b id=$id f=$f")
    }
    // the payload is a genuine RIFF/AVI container
    val bytes = graft.plans.GenAvi.avi(7L, 5, 3, 4)
    assert(bytes.take(4).map(_.toChar).mkString == "RIFF" &&
      bytes.slice(8, 12).map(_.toChar).mkString == "AVI ")
    val arr = graft.plans.DecodeVideo.decode(bytes)
    assert(arr != null && arr.numElements() == 4, "4 stored frames read back")
    // MJPEG flavor: JPEG frames ride ImageIO — decoding them through
    // the container must EQUAL decoding the same JPEG bytes directly
    val jpegs = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, ((x * 20 + f * 40) << 16) | ((y * 25) << 8) | 128)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", baos)
      baos.toByteArray
    }
    val mj = graft.plans.DecodeVideo.decode(
      graft.plans.GenAvi.aviMjpeg(8, 8, jpegs))
    assert(mj != null && mj.numElements() == 3, "3 MJPEG frames read back")
    val want = jpegs.map { jb =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jb))
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val p = img.getRGB(x, y)
        sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
      }
      (sr / 64.0, sg / 64.0, sb / 64.0)
    }
    for (f <- 0 until 3) {
      val row = mj.getStruct(f, 6)
      assert(row.getInt(1) == 8 && row.getInt(2) == 8)
      assert((row.getDouble(3), row.getDouble(4), row.getDouble(5)) == want(f),
        s"MJPEG-in-AVI frame $f must equal the direct JPEG decode")
    }
    // garbage bytes and truncated containers are skipped, not fabricated
    val junk = Seq((9L, "RIFF".getBytes("ISO-8859-1") ++
        Array.fill[Byte](20)(3))).toDF("doc_id", "media")
      .select(col("doc_id"), col("media"),
              struct(lit("video/avi").as("mime")).as("meta"))
    assert(Multimodal.decodeVideo(junk).count() == 0)
    assert(graft.plans.DecodeVideo.decode(bytes.take(40)) == null)
  }

  test("video perceptual dedup: luminance-contour bits match a by-hand replay") {
    graft.plans.GraftFunctions.register(spark)
    val ids = Seq(11L, 12L).toDF("doc_id")
    val out = Multimodal.videoPerceptualDedup(Multimodal.videoTable(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- Seq(11L, 12L)) {
      val lums = (0 until 4).map { f =>
        val px = for { y <- 0 until 4; x <- 0 until 4 }
          yield java.lang.Math.floorMod(id * 31 + 7 * x + 13 * y + 17 * f, 256L).toInt
        px.map(v => (v + 170) % 256).sum / 16.0 +
          px.map(v => (v + 85) % 256).sum / 16.0 + px.sum / 16.0
      }
      val want = (0 until 3).collect { case k if lums(k + 1) > lums(k) => 1L << k }.sum
      assert(out(id) == want, s"video fp mismatch for id=$id")
    }
  }

  test("video fp bit budget: > 65 frames fingerprints to null, 65 does not") {
    // shiftleft wraps shift amounts mod 64 — beyond 64 transitions the
    // contour must return null (the audio contract mirrored), never a
    // silently-aliased value that false-clusters distinct long videos
    graft.plans.GraftFunctions.register(spark)
    val fpOf = (n: Int) => {
      val ids = Seq(21L).toDF("doc_id")
      Multimodal.videoTable(ids, "doc_id", nFrames = n)
        .select(Multimodal.videoContourFpCol(col("media")).as("fp"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).head
    }
    assert(fpOf(65).isDefined, "65 frames = 64 transitions: inside the budget")
    assert(fpOf(66).isEmpty, "66 frames would need bit 64: must be null")
  }

  test("long videos: window fps replay by hand; a planted 80-frame dup pair the single-fp guard misses") {
    graft.plans.GraftFunctions.register(spark)
    // 80 frames = 79 transitions: the single-fp budget guard nulls the
    // whole video, so the pre-r13 near-dedup is PROVABLY blind here
    val ids = Seq(31L, 32L).toDF("doc_id")
    val media = Multimodal.videoTable(ids, "doc_id", nFrames = 80)
    assert(media.select(Multimodal.videoContourFpCol(col("media")).as("fp"))
      .filter(col("fp").isNotNull).count() == 0,
      "bit-budget guard must null 80-frame single fps")
    // per-window fps: 5 aligned windows of 16 frames, bits by hand
    val wf = Multimodal.videoWindowFps(media, windowFrames = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wf.size == 10, "2 videos x 5 windows")
    for (id <- Seq(31L, 32L); w <- 0 until 5) {
      val lums = (0 until 80).map { f =>
        val px = for { y <- 0 until 4; x <- 0 until 4 }
          yield java.lang.Math.floorMod(id * 31 + 7 * x + 13 * y + 17 * f, 256L).toInt
        px.map(v => (v + 170) % 256).sum / 16.0 +
          px.map(v => (v + 85) % 256).sum / 16.0 + px.sum / 16.0
      }
      val want = (w * 16 until w * 16 + 15).collect {
        case f if lums(f + 1) > lums(f) => 1L << (f % 16) }.sum
      assert(wf((id, w.toLong)) == want, s"window fp id=$id w=$w")
    }
    // planted near pair: 101 and 102 carry the SAME 80-frame payload,
    // 103 a different one — the window ledger must fuse the pair the
    // null-guard hides
    val planted = Seq((101L, 101L), (102L, 101L), (103L, 103L))
      .toDF("doc_id", "seed")
      .select(col("doc_id"),
        call_function("gen_gif", col("seed"), lit(4), lit(4), lit(80))
          .as("media"),
        struct(lit("video/gif").as("mime")).as("meta"))
    val blind = Multimodal.videoNearDedup(planted, widthBits = 64)
    assert(blind.count() == 0, "single-fp path sees nothing at 80 frames")
    val led = Multimodal.videoNearDedupWindows(planted, windowFrames = 16,
                                               maxHamming = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(led(101L) == ((5L, 101L, 2L, 1L)), s"ledger: $led")
    assert(led(102L) == ((5L, 101L, 2L, 0L)), s"ledger: $led")
    assert(led(103L)._2 == 103L && led(103L)._3 == 1L,
           s"distinct long video stays a singleton: $led")
  }

  test("long audio: window fps replay by hand; a planted 128-frame dup pair the single-fp guard misses") {
    graft.plans.GraftFunctions.register(spark)
    // 2048 samples = 128 energy frames = 127 transitions: the
    // single-fp budget guard nulls the whole clip, so the pre-r14
    // near-dedup is PROVABLY blind here (audio = the third modality
    // of the q252 class)
    val ids = Seq(41L, 42L).toDF("doc_id")
    val media = Multimodal.audioTable(ids, "doc_id", nSamples = 2048)
    assert(media.select(
        call_function("audio_energy_fp", col("media"), lit(16)).as("fp"))
      .filter(col("fp").isNotNull).count() == 0,
      "bit-budget guard must null 128-frame single fps")
    // per-window fps: 8 aligned windows of 16 frames, bits by hand
    val wf = Multimodal.audioWindowFps(media, frameSamples = 16,
                                       windowFrames = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wf.size == 16, "2 clips x 8 windows")
    for (id <- Seq(41L, 42L); w <- 0 until 8) {
      val en = (0 until 128).map { f =>
        (16 * f until 16 * f + 16).map { t =>
          val v = java.lang.Math.floorMod(id * 31 + t.toLong * 7919, 2048L) - 1024L
          v * v
        }.sum
      }
      val want = (w * 16 until w * 16 + 15).collect {
        case f if en(f + 1) > en(f) => 1L << (f % 16) }.sum
      assert(wf((id, w.toLong)) == want, s"window fp id=$id w=$w")
    }
    // planted near pair: 201 and 202 carry the SAME 2048-sample
    // payload; 203 carries seed 300, whose contour is >= 14 Hamming
    // bits away in EVERY window (close seeds are genuinely near —
    // the sample formula's phase shift 31·Δid barely moves the energy
    // contour, e.g. seed 203 shares a window with 201 exactly) — the
    // window ledger must fuse the pair the null-guard hides
    val planted = Seq((201L, 201L), (202L, 201L), (203L, 300L))
      .toDF("doc_id", "seed")
      .select(col("doc_id"),
        call_function("gen_wav", col("seed"), lit(2048), lit(8000))
          .as("media"),
        struct(lit("audio/wav").as("mime")).as("meta"))
    val blind = Multimodal.audioNearDedup(planted, widthBits = 64)
    assert(blind.count() == 0, "single-fp path sees nothing at 128 frames")
    val led = Multimodal.audioNearDedupWindows(planted, frameSamples = 16,
        windowFrames = 16, maxHamming = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(led(201L) == ((8L, 201L, 2L, 1L)), s"ledger: $led")
    assert(led(202L) == ((8L, 201L, 2L, 0L)), s"ledger: $led")
    assert(led(203L)._2 == 203L && led(203L)._3 == 1L,
           s"distinct long clip stays a singleton: $led")
  }

  test("perceptual near-dedup: transitive Hamming chains cluster, strangers stay apart") {
    // 1-2-3 form a Hamming-1 chain (1 and 3 are 2 apart — only
    // transitivity links them); 10 is far from everything
    val fps = Seq((1L, 0L), (2L, 1L), (3L, 3L), (10L, 0xF0L))
      .toDF("doc_id", "fp")
    val out = Multimodal.perceptualNearDedup(fps, widthBits = 8, maxHamming = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out(1L) == ((1L, 3L, 1L)) && out(2L) == ((1L, 3L, 0L)) &&
           out(3L) == ((1L, 3L, 0L)), s"chain must fuse transitively: $out")
    assert(out(10L) == ((10L, 1L, 1L)), s"far fp stays a singleton: $out")
  }

  test("near-dedup at maxHamming = 0 degenerates to the exact perceptual ledger") {
    graft.plans.GraftFunctions.register(spark)
    val media = Multimodal.imageTable((1L to 40L).toDF("doc_id"), "doc_id")
    val exact = Multimodal.imagePerceptualDedup(media)
      .select(col("doc_id"), col("ahash").as("fp"), col("cluster_id"),
              col("n_cluster"), col("is_keeper"))
      .collect().map(_.toString).sorted.toSeq
    val near = Multimodal.imageNearDedup(media, maxHamming = 0)
      .collect().map(_.toString).sorted.toSeq
    assert(near == exact, "h = 0 must reproduce exact-fp clustering")
  }

  test("fingerprintNearDupPairs: banded candidates have perfect recall vs brute force") {
    // 64-bit fingerprints spread across band boundaries; every pair
    // within Hamming 3 must surface through some shared band
    val fps = Seq(
      (1L, 0x0000000000000000L), (2L, 0x8000000000000001L), // H2 via top+bottom bits
      (3L, 0x0000000000000007L),                            // H3 from 1, H4 from 2
      (4L, 0x00000000000F0000L), (5L, 0x00000000000F0001L)  // H1 pair mid-word
    ).toDF("id", "fp")
    val got = TextDedup.fingerprintNearDupPairs(fps, "id", "fp", 64, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val raw = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, fa) <- raw; (b, fb) <- raw if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == want, s"banded $got vs brute $want")
  }

  test("audio VAD: segments match a by-hand gaps-and-islands replay") {
    graft.plans.GraftFunctions.register(spark)
    val ids = Seq(3L, 8L).toDF("doc_id")
    val out = Multimodal.audioActivitySegments(Multimodal.audioTable(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4), r.getLong(5)))
      .groupBy(_._1)
    for (id <- Seq(3L, 8L)) {
      val v = (0 until 256).map(t =>
        java.lang.Math.floorMod(id * 31 + t * 7919L, 2048L) - 1024L)
      val e = v.grouped(16).map(_.map(x => x * x).sum).toSeq
      val active = e.zipWithIndex.filter(_._1 > 5600000L).map(_._2)
      // islands: consecutive active frames group into segments
      val want = active.foldLeft(List.empty[List[Int]]) {
        case (acc, f) if acc.nonEmpty && acc.head.head == f - 1 =>
          (f :: acc.head) :: acc.tail
        case (acc, f) => List(f) :: acc
      }.reverse.map(_.reverse)
      val got = out(id).sortBy(_._2)
      assert(got.length == want.length, s"segment count id=$id: $got vs $want")
      got.zip(want).zipWithIndex.foreach { case (((_, idx, s0, s1, n, es), seg), i) =>
        assert(idx == i + 1 && s0 == seg.head && s1 == seg.last && n == seg.length)
        assert(es == seg.map(e(_)).sum)
      }
    }
  }

  test("gen_wav emits genuine codec bytes: javax.sound.sampled decodes them directly") {
    // the synthesized payload must be a REAL WAV, not wav-shaped bytes —
    // prove it by decoding on the driver with the JDK API alone
    val bytes = graft.plans.GenWav.wav(7L, 32, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val f = in.getFormat
    assert(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
    assert(f.getSampleRate == 8000.0f && f.getChannels == 1 && f.getSampleSizeInBits == 16)
    val data = in.readAllBytes()
    assert(data.length == 64, "32 samples x 2 bytes")
    // spot-check sample t=3 (little-endian 16-bit)
    val got = ((data(7) << 8) | (data(6) & 0xff)).toShort.toInt
    assert(got == (java.lang.Math.floorMod(7L * 31 + 3L * 7919, 2048L) - 1024L).toInt)
  }

  test("decode_audio: exact clip stats end-to-end; null for garbage bytes") {
    graft.plans.GraftFunctions.register(spark)
    val ids = Seq(0L, 1L, 12345L).toDF("doc_id")
    val got = Multimodal.decodeAudio(Multimodal.audioTable(ids, "doc_id", nSamples = 64))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
         r.getLong(7))).toMap
    for (id <- Seq(0L, 1L, 12345L)) {
      val s = (0 until 64).map(t =>
        (java.lang.Math.floorMod(id * 31 + t.toLong * 7919, 2048L) - 1024L).toInt)
      val (rate, ch, n, mean, rms, zc) = got(id)
      assert(rate == 8000 && ch == 1 && n == 64L)
      // integer sums are exact: equality, not tolerance
      assert(mean == s.map(_.toLong).sum.toDouble / 64, s"mean_amp id=$id")
      assert(rms == math.sqrt(s.map(v => v.toLong * v).sum.toDouble / 64), s"rms_amp id=$id")
      assert(zc == s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)), s"zero_cross id=$id")
    }
    // undecodable payloads yield null stats (skip-don't-poison)
    val junk = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    val r = junk.select(call_function("decode_audio", col("media")).as("au")).collect()
    assert(r.head.isNullAt(0), "garbage bytes should decode to null")
  }
}

object GraftSumCheck {
  def check(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val got = Seq("hello", "", "\u0000\u00ff").toDF("s")
      .select(call_function("byte_sum", encode(col("s"), "UTF-8")).as("bs"))
      .as[Long].collect()
    val expect = Seq("hello", "", "\u0000\u00ff").map(
      _.getBytes("UTF-8").map(b => (b & 0xff).toLong).sum)
    assert(got.toSeq == expect)
  }
}
