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
  * Σ_w len(w)·maxPieceLen; the Viterbi DP unrolls by CHARACTER
  * POSITION — `maxWordLen` keyed joins per EM iteration, each
  * word-keyed and piece-cost-joined (shuffles keyed by word/piece
  * only); the backtrace is the same loop run backward. Words longer
  * than `maxWordLen` are excluded up front (the SentencePiece
  * max-piece-length contract applied at the word level), so the DP
  * depth is a CONFIG bound, not data-dependent. */
object UnigramLm {

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
      val pwc = pw.join(costs, Seq("piece"))
        .select(col("w"), col("i"), col("k"), col("piece"), col("cost_e3"))
        .localCheckpoint()
      // Viterbi forward: dp(w, k) = min cost of segmenting w[0, k)
      var dp = words.select(col("w"), lit(0).as("k"),
                            lit(0L).as("cost"), lit(-1).as("back"))
      for (k <- 1 to maxWordLen) {
        val cand = dp
          .select(col("w"), col("k").as("j"), col("cost").as("cj"))
          .join(pwc.filter(col("k") === k)
                  .select(col("w"), col("i").as("j"), col("cost_e3")),
                Seq("w", "j"))
          .select(col("w"), (col("cj") + col("cost_e3")).as("cost"),
                  col("j"))
        // checkpoint EACH level: dpk reads the cumulative dp, so a lazy
        // union would make every level's plan contain the whole
        // previous tree — 2^maxWordLen subtrees by the top, and
        // Catalyst walks shared subtrees as a TREE (the driver burned
        // 20+ min in TreeNode.exists at sf0.1 before this cut). With
        // per-level cuts dp is a flat union of ≤ maxWordLen+1
        // checkpointed leaves — linear planning, bounded rows.
        val dpk = cand.groupBy(col("w"))
          .agg(min(struct(col("cost"), col("j"))).as("m"))
          .select(col("w"), lit(k).as("k"),
                  col("m.cost").as("cost"), col("m.j").as("back"))
          .localCheckpoint()
        dp = dp.unionByName(dpk)
      }
      val dpCk = dp
      // backtrace from k = len(w): emit (w, i, k) of the winning pieces
      var frontier = words.select(col("w"), length(col("w")).as("k"))
      var seg: DataFrame = null
      for (_ <- 1 to maxWordLen) {
        val step = frontier.join(dpCk, Seq("w", "k"))
          .select(col("w"), col("back").as("i"), col("k"))
        seg = if (seg == null) step else seg.unionByName(step)
        frontier = step.filter(col("i") > 0)
          .select(col("w"), col("i").as("k"))
      }
      val segCk = seg.localCheckpoint()
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
