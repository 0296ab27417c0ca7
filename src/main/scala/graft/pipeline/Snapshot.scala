package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot bookkeeping (beyond-reference tier; no counterpart
  * in /root/reference — its pipeline reads one static frame per
  * request). A curation pipeline re-runs over a LIVING corpus: crawls
  * refresh, takedowns land, cleaning rules change. The operators here
  * answer "what changed between snapshot A and snapshot B" — the input
  * to incremental re-processing (only `added`/`changed` docs need
  * re-scoring/re-embedding; `removed` docs need tombstones in every
  * derived index) and to the audit trail a dataset release ships.
  */
object Snapshot {

  /** CONTENT-ADDRESSED SNAPSHOT DIFF — classify every doc id across
    * two snapshots as added / removed / changed / unchanged by
    * comparing md5 digests of the payload column.
    *
    * Digests are computed map-side BEFORE the join, so the full-outer
    * join shuffles (id, 32-char hex) pairs, never documents — diffing
    * two 100 TB snapshots moves O(ids), and the join keys on the
    * well-spread doc id. md5 rather than a cheaper 64-bit hash because
    * the digest doubles as the release manifest's content address
    * (collision-free for bookkeeping purposes, and both engines agree
    * on its hex form byte-for-byte).
    *
    * Output: (doc_id, status, digest) — digest is the NEW side's when
    * present (the surviving content), else the removed old one; the
    * downstream incremental pass filters `status IN ('added',
    * 'changed')`, the tombstone pass `status = 'removed'`. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, payloadCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("doc_id"),
                           md5(col(payloadCol).cast("binary")).as("old_digest"))
    val n = newSnap.select(col(idCol).as("doc_id"),
                           md5(col(payloadCol).cast("binary")).as("new_digest"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") =!= col("new_digest"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        coalesce(col("new_digest"), col("old_digest")).as("digest"))
  }

  /** INCREMENTAL DERIVED-ARTIFACT REFRESH — the consumer of
    * [[snapshotDiff]]: bring a per-document derived artifact
    * (embeddings, quality scores, fingerprints — anything keyed by
    * doc_id) up to date against a new snapshot by recomputing ONLY the
    * added/changed documents and carrying unchanged rows forward;
    * removed docs drop out (their artifact rows have no surviving id).
    *
    * `rebuild` is the same operator that produced `oldArtifact`,
    * applied here to the diff-bounded work list. The contract — and
    * what the q176 oracle pins — is refresh ≡ full rebuild: because
    * `unchanged` means digest-identical content, a DETERMINISTIC
    * per-document rebuild function yields bit-identical rows for
    * carried docs, so the incremental result equals recomputing the
    * whole new snapshot (at the cost of only the changed fraction —
    * the entire point at 100 TB, where a daily crawl delta is ~1% of
    * the corpus). Per-CORPUS artifacts (IDF tables, BPE vocabularies)
    * are out of contract: their rows depend on documents other than
    * their own, so a diff-bounded rebuild is not equality-preserving.
    *
    * Scale shape: two left-semi joins on doc id (map-side prunes) + a
    * union; the rebuild pass touches only the work list. */
  def incrementalRefresh(diff: DataFrame, oldArtifact: DataFrame,
                         newCorpus: DataFrame)
                        (rebuild: DataFrame => DataFrame): DataFrame = {
    val keep = diff.filter(col("status") === "unchanged").select(col("doc_id"))
    val work = diff.filter(col("status").isin("added", "changed"))
      .select(col("doc_id"))
    val carried = oldArtifact.join(keep, Seq("doc_id"), "left_semi")
    val fresh = rebuild(newCorpus.join(work, Seq("doc_id"), "left_semi"))
    carried.unionByName(fresh)
  }

  /** CROSS-SNAPSHOT NOVELTY — how much genuinely NEW content a crawl
    * delta brings: per arriving document, the fraction of its distinct
    * word n-grams absent from the reference corpus's gram set. The
    * continual-pretraining admission signal — a "new" feed whose docs
    * score near 0 is re-syndication of what the model already trained
    * on (pay dedup cost, gain nothing), while novelty spikes mark
    * content drift worth a mixture-weight revisit. Complements
    * [[snapshotDiff]]: the diff says WHICH docs are new bytes, this
    * says whether the bytes are new INFORMATION.
    *
    * Scale shape: the reference gram set is corpus-sized and joins
    * UNHINTED on the well-spread gram key (the lmSurprisal lesson — a
    * forced broadcast of a 100 TB corpus vocabulary is an OOM); the
    * arriving side is delta-sized. One distinct per side, one keyed
    * left join, one per-doc aggregate. Docs with < n words emit no
    * row (the shingle-table contract shared with the dedup family). */
  def noveltyVsCorpus(newDocs: DataFrame, refDocs: DataFrame,
                      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val ref = graft.pipeline.TextDedup.ngramShingles(refDocs, idCol, textCol, n)
      .select(col("bg")).distinct().withColumn("seen", lit(1L))
    graft.pipeline.TextDedup.ngramShingles(newDocs, idCol, textCol, n)
      .join(ref, Seq("bg"), "left")
      .groupBy(col("id").as("doc_id")).agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("seen"), lit(0L))).as("n_seen"))
      .select(col("doc_id"), col("n_grams"), col("n_seen"),
              round(lit(1.0) - col("n_seen") / col("n_grams"), 6).as("novelty"))
  }

  /** SERVING-PATH NOVELTY — [[noveltyVsCorpus]] as ONE per-row
    * projection against a gram BLOOM FILTER packed into a plan literal
    * ([[graft.pipeline.CorpusSketch.packBloomBits]]): each arriving
    * document's word n-grams probe the bitmask in an `aggregate` fold,
    * no explode, no groupBy, no join — the shape that streams in
    * append mode and prices a 100 TB corpus's gram set at mBits/8
    * bytes of task binary (the dsirScoreServe posture, membership
    * instead of scores).
    *
    * Two DOCUMENTED approximations vs the exact batch op: (1) bloom
    * false positives mark unseen grams as seen, so `novelty_est` is a
    * one-sided UNDER-estimate (never over — no false negatives);
    * (2) grams are counted per OCCURRENCE, not distinct (a projection
    * cannot dedup) — occurrence-weighted novelty, the admission-gate
    * reading. Both collapse at head-room mBits (spec-pinned equal to
    * the exact op on disjoint-gram corpora). */
  /** Merkle-style bucket digests: hash-partition the corpus into
    * `nBuckets` by id, digest each bucket as an order-independent
    * 60-bit XOR over h60(id | text) plus a row count. Two replicas'
    * digest frames are nBuckets rows EACH — comparing 100 TB copies
    * moves O(nBuckets), and a differing bucket narrows the re-scan
    * to n/nBuckets rows (recurse with a finer bucket count inside
    * suspects for log-depth localization). */
  def merkleBuckets(df: DataFrame, idCol: String, textCol: String,
                    nBuckets: Int, salt: String = "mk"): DataFrame = {
    require(nBuckets >= 2, "nBuckets >= 2")
    df.select(
        pmod(CorpusSketch.h60(col(idCol).cast("string"), salt + "b"),
             lit(nBuckets.toLong)).as("bucket"),
        CorpusSketch.h60(concat(col(idCol), lit("|"), col(textCol)), salt)
          .as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("digest"))
  }

  /** The audit: buckets whose (count, digest) disagree between two
    * snapshots — absent buckets read as (0, 0). Output: (bucket,
    * n_a, n_b, digest_a, digest_b), differing rows only. */
  def merkleDiff(a: DataFrame, b: DataFrame, idCol: String, textCol: String,
                 nBuckets: Int, salt: String = "mk"): DataFrame = {
    val da = merkleBuckets(a, idCol, textCol, nBuckets, salt)
      .select(col("bucket"), col("n").as("n_a"), col("digest").as("digest_a"))
    val db = merkleBuckets(b, idCol, textCol, nBuckets, salt)
      .select(col("bucket"), col("n").as("n_b"), col("digest").as("digest_b"))
    da.join(db, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("digest_a"), lit(0L)).as("digest_a"),
        coalesce(col("digest_b"), lit(0L)).as("digest_b"))
      .filter(col("n_a") =!= col("n_b") || col("digest_a") =!= col("digest_b"))
  }

  def noveltyServe(rows: DataFrame, idCol: String, textCol: String,
                   mask: Seq[Long], mBits: Int, k: Int = 3, n: Int = 3,
                   salt: String = "bloom"): DataFrame = {
    require(mask.size * 64 == mBits, s"mask must hold exactly $mBits bits")
    require(k >= 1 && n >= 2, "need k >= 1 hash probes and n >= 2 gram order")
    val maskLit = typedlit(mask)
    def seen(g: Column): Column = (0 until k).map { j =>
      val b = pmod(CorpusSketch.h32(g, s"$salt|$j|"), lit(mBits.toLong))
      // b/64 is exact in doubles (power-of-two divisor); element_at is 1-based
      call_function("shiftright",
          element_at(maskLit, (b / 64).cast("int") + 1),
          pmod(b, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L))
    }.reduce(_ * _)
    rows.select(col(idCol).as("doc_id"), split(trim(col(textCol)), " ").as("l"))
      .filter(size(col("l")) >= n)
      .withColumn("g", transform(sequence(lit(1), size(col("l")) - (n - 1)),
        i => concat_ws("_", (0 until n).map(o => element_at(col("l"), i + o)): _*)))
      .select(col("doc_id"), size(col("g")).cast("long").as("n_grams"),
        aggregate(col("g"), lit(0L), (acc, g) => acc + seen(g)).as("n_seen_est"))
      .withColumn("novelty_est",
        round(lit(1.0) - col("n_seen_est") / col("n_grams"), 6))
  }
}
