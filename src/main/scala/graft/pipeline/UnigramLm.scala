package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UNIGRAM-LM tokenizer training (SentencePiece's other half) — the
  * probabilistic alternative to [[Bpe]]'s greedy merges: pieces carry
  * unigram log-probabilities and each word segments into its
  * MAXIMUM-LIKELIHOOD piece sequence (Viterbi); training alternates
  * Viterbi segmentation (E) with count re-estimation (M). This is the
  * Viterbi-EM ("hard EM") variant — deterministic and integer-exact,
  * so a SQL oracle replays every iteration bit-for-bit, where
  * full-EM's forward-backward posteriors would put engine-private
  * float sums inside the loop. Differences from production
  * SentencePiece are documented, not hidden: hard EM instead of
  * expected counts, and pruning EMERGES (multi-char pieces that win
  * no segmentation drop out) instead of the explicit
  * likelihood-loss-ranked vocabulary shrink.
  *
  * Integer discipline: piece costs live on the e3 milli-nat grid
  * (`round(ln(total/cnt)·1e3)` — the q112 surprisal convention,
  * one rounding per piece per iteration); Viterbi sums and argmins
  * are exact long arithmetic with the (cost ASC, split ASC) tie rule.
  *
  * Scale shape: the working set is the DISTINCT-WORD table (the
  * [[Bpe]] trick) and the piece table is bounded by
  * Σ_w len(w)·maxPieceLen; per EM iteration ONE join prices the
  * occurrence table against the piece costs, then each word's whole
  * Viterbi DP + backtrace folds INSIDE a single codegen'd `aggregate`
  * expression over the word's own ≤ len·maxPieceLen (i, k, cost)
  * tuples (the [[graft.ts.Dtw]] / [[graft.ts.SeqAlign]] in-row DP
  * pattern — no per-level joins, no checkpoint barriers). Words
  * longer than `maxWordLen` are excluded up front (the SentencePiece
  * max-piece-length contract applied at the word level), so the DP
  * depth is a CONFIG bound, not data-dependent. */
object UnigramLm {

  private val INF = 4000000000000000L

  /** Trained artifacts: final piece table (piece, cnt, cost_e3) and
    * the final Viterbi segmentation of every retained corpus word
    * (w, pos, piece) with pos the 0-based character offset. */
  case class UnigramTrained(pieces: DataFrame, wordPieces: DataFrame)

  private def wordTable(df: DataFrame, textCol: String,
                        maxWordLen: Int): DataFrame =
    df.select(explode(split(trim(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Static occurrence table: one row per (w, i, k) substring with
    * 1 ≤ k − i ≤ maxPieceLen (i 0-based start, k exclusive end). */
  private def pieceOccurrences(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("w"), col("freq"),
              explode(sequence(lit(0), length(col("w")) - 1)).as("i"))
      .select(col("w"), col("freq"), col("i"),
              explode(sequence(col("i") + 1,
                least(length(col("w")), col("i") + maxPieceLen))).as("k"))
      .withColumn("piece",
        expr("substring(w, i + 1, k - i)"))

  /** @param iters     EM iterations (Viterbi E + recount M)
    * @param maxPieceLen longest piece considered
    * @param maxWordLen  words longer than this are excluded (bounds
    *                    the DP depth — config, not data) */
  def trainViterbiEm(df: DataFrame, idCol: String, textCol: String,
                     maxPieceLen: Int = 6, maxWordLen: Int = 12,
                     iters: Int = 2): UnigramTrained = {
    require(iters >= 1 && iters <= 16, "iters in [1, 16]")
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
            "1 <= maxPieceLen <= maxWordLen")
    val spark = df.sparkSession
    val words = wordTable(df, textCol, maxWordLen).localCheckpoint()
    val pw = pieceOccurrences(words, maxPieceLen).localCheckpoint()
    // init counts: freq-weighted occurrence counts of every candidate
    var counts = pw.groupBy(col("piece"))
      .agg(sum(col("freq")).as("cnt")).localCheckpoint()
    var lastSeg: DataFrame = null
    for (_ <- 1 to iters) {
      val total = counts.agg(sum(col("cnt")).as("tt"))
      val costs = counts.crossJoin(broadcast(total))
        .select(col("piece"),
          round(log(col("tt").cast("double") / col("cnt")) * 1e3)
            .cast("long").as("cost_e3"))
      // one pricing join, then the word's WHOLE DP state rides one
      // row: (w, len, [(i, k, cost)]) — the Dtw/SeqAlign in-row fold
      // (the former per-level joined unroll needed a localCheckpoint
      // per DP level to keep Catalyst from walking an exponential
      // shared-subtree plan: ~24 materialization barriers per
      // training run, all gone here)
      val packed = pw.join(costs, Seq("piece"))
        .groupBy(col("w"))
        .agg(collect_list(
          struct(col("i"), col("k"), col("cost_e3").as("c"))).as("arr"))
        .withColumn("len", length(col("w")))
      // forward: dp(k) = min over pieces (i, k]: dp(i) + cost, tie on
      // smallest split i (array_min's lexicographic struct order =
      // the old min(struct(cost, j)) rule); dp(0) = 0, unreachable =
      // INF sentinel (every single char is always priced, so dp(len)
      // is reachable — the guard keeps INF prefixes out of the min)
      val dpExpr = s"""
        |aggregate(
        |  sequence(1, len),
        |  array(named_struct('cost', CAST(0 AS BIGINT), 'back', -1)),
        |  (st, kk) -> array_append(st,
        |    coalesce(
        |      array_min(transform(
        |        filter(arr, x -> x.k = kk
        |                     AND element_at(st, x.i + 1).cost < ${INF}L),
        |        x -> named_struct(
        |          'cost', element_at(st, x.i + 1).cost + x.c,
        |          'back', x.i))),
        |      named_struct('cost', CAST(${INF}L AS BIGINT), 'back', -1))),
        |  st -> st)""".stripMargin
      // backtrace: follow back pointers from k = len; each hop
      // consumes >= 1 char so len steps always finish
      val btExpr = s"""
        |aggregate(
        |  sequence(1, len),
        |  named_struct('cur', len,
        |    'segs', slice(array(named_struct('i', 0, 'k', 0)), 1, 0)),
        |  (st, z) -> IF(st.cur <= 0, st,
        |    named_struct(
        |      'cur', element_at(dparr, st.cur + 1).back,
        |      'segs', array_append(st.segs, named_struct(
        |        'i', element_at(dparr, st.cur + 1).back,
        |        'k', st.cur)))),
        |  st -> st.segs)""".stripMargin
      val segCk = packed
        .select(col("w"), col("len"), expr(dpExpr).as("dparr"))
        .select(col("w"), explode(expr(btExpr)).as("s"))
        .select(col("w"), col("s.i").as("i"), col("s.k").as("k"))
        .localCheckpoint()
      lastSeg = segCk
      // M: recount from winning segmentations; single-char pieces are
      // floored at 1 so every word stays segmentable, multi-char
      // pieces that won nothing drop out (emergent pruning)
      val segCounts = segCk
        .join(pw.select(col("w"), col("i"), col("k"), col("piece"),
                        col("freq")), Seq("w", "i", "k"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      val singles = pw.filter(col("k") - col("i") === 1)
        .select(col("piece")).distinct()
        .join(segCounts, Seq("piece"), "left")
        .select(col("piece"),
                greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt"))
      val nextCounts = segCounts
        .join(singles.select(col("piece")), Seq("piece"), "left_anti")
        .unionByName(singles)
        .localCheckpoint()
      counts.unpersist()
      counts = nextCounts
    }
    val total = counts.agg(sum(col("cnt")).as("tt"))
    val pieces = counts.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        round(log(col("tt").cast("double") / col("cnt")) * 1e3)
          .cast("long").as("cost_e3"))
    val wordPieces = lastSeg
      .select(col("w"), col("i").cast("long").as("pos"),
              expr("substring(w, i + 1, k - i)").as("piece"))
    UnigramTrained(pieces, wordPieces)
  }

  /** Final piece table alone. */
  def unigramPieces(df: DataFrame, idCol: String, textCol: String,
                    maxPieceLen: Int = 6, maxWordLen: Int = 12,
                    iters: Int = 2): DataFrame =
    trainViterbiEm(df, idCol, textCol, maxPieceLen, maxWordLen, iters).pieces
}
