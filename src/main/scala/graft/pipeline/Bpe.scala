package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BYTE-PAIR-ENCODING tokenizer — the learn-and-apply subword story
  * the training-data export actually runs between a curated corpus and
  * its packed tensors ([[TextAnalysis.vocabulary]]/`encodeTokens` are
  * the whitespace-rank rung; every production export tokenizes with a
  * LEARNED subword vocabulary so unseen words decompose instead of
  * collapsing to UNK).
  *
  * Training ([[bpeTrain]]) is fully distributed and engine-portable:
  * the working set is the DISTINCT-word frequency table (vocabulary-
  * bounded — the method's standard scale trick: merge statistics are
  * identical whether counted over occurrences or over distinct words
  * weighted by frequency), symbols start as code points
  * (`regexp_extract_all(w, '.')` — the same unit in Java and RE2
  * regexes), and each iteration is one pair-count groupBy + one
  * argmax + one POSITION-BASED merge pass of windows and keyed joins —
  * no driver-side string surgery, and the exact same relational steps
  * replay in DuckDB (q118 unrolls them), so the learned table is
  * hash-checkable.
  *
  * The merge pass implements left-to-right non-overlapping pair
  * merging relationally: candidate positions (sym, next) = (L, R) form
  * gaps-and-islands runs (adjacent candidates only arise when L = R),
  * and greedy left-to-right keeps every OTHER candidate from each
  * run's start — `(pos - run_start) % 2 = 0` — then merged symbols
  * absorb their right neighbor and positions renumber. One lead + two
  * window functions + two keyed self-joins per iteration, all
  * partitioned by word.
  *
  * Applying ([[bpeSegment]]) uses the native `bpe_encode` expression
  * ([[graft.plans.BpeOps]]) — canonical lowest-rank-repeat per word
  * with a memo, merge table as a config-sized literal. Training state
  * equals segmentation for the training corpus (the classic BPE
  * identity), which is what pins the native apply to the relational
  * train (test + q119 oracle).
  *
  * Scale account: train touches the corpus once (the word count);
  * every iteration after that runs over the distinct-word symbol
  * table. Apply is a pure codegen'd projection — zero shuffle,
  * streaming-safe. Downstream ([[bpeVocabulary]], [[bpeEncodeIds]],
  * [[materializePacksBpe]]) reuse the whitespace family's documented
  * shapes with subword rows in place of whitespace tokens. */
object Bpe {

  /** Trained artifacts: the merge table (rank, left_sym, right_sym,
    * merged, cnt) and the final per-distinct-word segmentation
    * (w, freq, pos, sym) — training state IS the segmentation of every
    * corpus word, so apply-side consumers can join it directly. */
  case class BpeTrained(merges: DataFrame, wordSegs: DataFrame)

  /** One left-to-right non-overlapping merge pass of pair (l, r) over
    * the (w, freq, pos, sym) symbol table — the relational form whose
    * SQL unrolling is the q118/q119 oracle. */
  private[pipeline] def mergePass(syms: DataFrame, l: String, r: String): DataFrame = {
    val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
    val d = syms.withColumn("nxt", lead(col("sym"), 1).over(wWin))
    val cand = d.filter(col("sym") === l && col("nxt") === r).select(col("w"), col("pos"))
    // gaps-and-islands: runs of consecutive candidate positions; greedy
    // left-to-right keeps candidates at even offsets from the run start
    val sel = cand
      .withColumn("grp", col("pos") - row_number().over(wWin))
      .withColumn("rs", min(col("pos")).over(Window.partitionBy(col("w"), col("grp"))))
      .filter(pmod(col("pos") - col("rs"), lit(2)) === 0)
      .select(col("w"), col("pos"))
    d.join(sel.withColumn("is_sel", lit(true)), Seq("w", "pos"), "left")
      .join(sel.select(col("w"), (col("pos") + 1).as("pos"), lit(true).as("is_abs")),
            Seq("w", "pos"), "left")
      .filter(col("is_abs").isNull)
      .select(col("w"), col("freq"), col("pos"),
              when(col("is_sel").isNotNull, lit(l + r)).otherwise(col("sym")).as("sym"))
      .withColumn("pos2", row_number().over(wWin) - 1)
      .select(col("w"), col("freq"), col("pos2").as("pos"), col("sym"))
  }

  /** Learn up to `nMerges` merge rules. Each iteration: pair counts
    * (frequency-weighted, over distinct words), deterministic argmax
    * (count DESC, left ASC, right ASC), merge applied relationally.
    * Stops early when no pair reaches `minPairFreq` (merging a
    * singleton pair buys nothing). Only the 1-row argmax ever reaches
    * the driver per iteration; the symbol table is re-persisted each
    * round so lineage stays O(1). */
  def bpeTrainState(df: DataFrame, idCol: String, textCol: String,
                    nMerges: Int, minPairFreq: Long = 2L): BpeTrained = {
    require(nMerges >= 1 && nMerges <= 100000, s"nMerges out of range: $nMerges")
    require(minPairFreq >= 1, s"minPairFreq must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(split(trim(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // localCheckpoint (not persist): each merge pass references its
    // input from THREE subtrees, so the logical plan would grow ~5×
    // per iteration — exponential by nMerges — unless the lineage is
    // truncated every round (the dupClusters loop's established fix)
    var syms = words.select(col("w"), col("freq"),
        posexplode(regexp_extract_all(col("w"), lit("."), lit(0)))
          .as(Seq("pos", "sym")))
      .localCheckpoint()
    val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
    val rules = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var stop = false
    var k = 1
    while (k <= nMerges && !stop) {
      val best = syms.withColumn("nxt", lead(col("sym"), 1).over(wWin))
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym"), col("nxt")).limit(1)
        .collect()
      if (best.isEmpty || best.head.getAs[Long]("cnt") < minPairFreq) stop = true
      else {
        val l = best.head.getString(0)
        val r = best.head.getString(1)
        rules += ((k.toLong, l, r, l + r, best.head.getAs[Long]("cnt")))
        val next = mergePass(syms, l, r).localCheckpoint()
        syms.unpersist()
        syms = next
      }
      k += 1
    }
    BpeTrained(
      rules.toSeq.toDF("rank", "left_sym", "right_sym", "merged", "cnt"),
      syms)
  }

  /** The merge table alone — (rank, left_sym, right_sym, merged, cnt),
    * rank 1 = first-learned. Releases the training-state frame the
    * caller is discarding (it is checkpoint-persisted). */
  def bpeTrain(df: DataFrame, idCol: String, textCol: String,
               nMerges: Int, minPairFreq: Long = 2L): DataFrame = {
    val trained = bpeTrainState(df, idCol, textCol, nMerges, minPairFreq)
    trained.wordSegs.unpersist()
    trained.merges
  }

  /** Collect a merge frame to the rank-ordered rule list the native
    * apply expression embeds (nMerges rows — config-sized, the
    * tokenizer's vocab budget). */
  def rulesOf(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"))).toSeq

  /** Segment each document into learned subwords: (id, syms) with
    * `syms` the flattened symbol array in document order — the native
    * `bpe_encode` projection (zero shuffle, streaming-safe). */
  def bpeSegment(df: DataFrame, idCol: String, textCol: String,
                 rules: Seq[(String, String)]): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
      call_function("bpe_encode", col(textCol),
        typedLit(rules.map(_._1)), typedLit(rules.map(_._2))).as("syms"))
  }

  /** Row-ized segmentation: (id, pos, sym), pos 0-based in document
    * order — the frame the vocabulary/encoding passes aggregate. */
  def bpeSegmentRows(df: DataFrame, idCol: String, textCol: String,
                     rules: Seq[(String, String)]): DataFrame =
    bpeSegment(df, idCol, textCol, rules)
      .select(col(idCol), posexplode(col("syms")).as(Seq("pos", "sym")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("sym"))

  /** Subword vocabulary: top-K symbols by occurrence (count DESC, sym
    * ASC rank — [[TextAnalysis.vocabulary]]'s contract over subword
    * rows). */
  def bpeVocabulary(df: DataFrame, idCol: String, textCol: String,
                    rules: Seq[(String, String)], topK: Int = 100): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val rows = bpeSegmentRows(df, idCol, textCol, rules)
    val w = Window.orderBy(col("n_occ").desc, col("sym"))
    rows.groupBy(col("sym"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col(idCol)).as("n_docs"))
      .orderBy(col("n_occ").desc, col("sym")).limit(topK)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Subword token-id encoding: (id, ids, n_tokens, n_oov) — the exact
    * [[TextAnalysis.encodeTokens]] contract with REAL subword ids
    * (vocabulary rank, OOV → `oovId`). Position-pinned array order;
    * broadcast vocab join (top-K-bounded). */
  def bpeEncodeIds(df: DataFrame, idCol: String, textCol: String,
                   rules: Seq[(String, String)], vocab: DataFrame,
                   oovId: Long = 0L): DataFrame =
    bpeSegmentRows(df, idCol, textCol, rules)
      .join(broadcast(vocab.select(col("sym"), col("rank"))), Seq("sym"), "left")
      .select(col(idCol), col("pos"), coalesce(col("rank"), lit(oovId)).as("tid"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
           sum((col("tid") === oovId).cast("long")).as("n_oov"),
           expr("transform(array_sort(collect_list(struct(pos, tid))), s -> s.tid)")
             .as("ids"))
      .select(col(idCol), col("ids"), col("n_tokens"), col("n_oov"))

  /** The export chain on SUBWORD ids — [[TextAnalysis.materializePacks]]
    * with the learned tokenizer in place of whitespace ranks: segment →
    * encode → pack (buckets keyed by SUBWORD counts, via the shared
    * [[TextAnalysis.packAssign]] core) → flatten, truncating each
    * document's ids to its bucket exactly as the whitespace chain does.
    * Output: (pack_id, pos, tid, doc_id). */
  def materializePacksBpe(df: DataFrame, idCol: String, textCol: String,
                          rules: Seq[(String, String)], vocab: DataFrame,
                          contextLen: Int = 2048, minBucket: Int = 16,
                          maxBucket: Int = 512, nShards: Int = 32,
                          salt: String = "pack", oovId: Long = 0L): DataFrame = {
    val enc = graft.queries.cacheOnce(
      bpeEncodeIds(df, idCol, textCol, rules, vocab, oovId))
    val packs = TextAnalysis.packAssign(
      enc.select(col(idCol), col("n_tokens")),
      idCol, contextLen, minBucket, maxBucket, nShards, salt)
      .select(col(idCol), col("bucket"), col("pack_id"), col("slot"))
    enc.select(col(idCol), col("ids")).join(packs, Seq(idCol))
      .select(col(idCol).as("doc_id"), col("pack_id"),
              (col("slot") * col("bucket")).as("base"),
              posexplode(slice(col("ids"), lit(1), col("bucket").cast("int")))
                .as(Seq("tok_pos", "tid")))
      .select(col("pack_id"), (col("base") + col("tok_pos")).as("pos"),
              col("tid"), col("doc_id"))
  }
}
