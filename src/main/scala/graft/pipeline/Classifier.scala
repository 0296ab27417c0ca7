package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DISTILLED TEXT CLASSIFIER — the fastText-shaped quality/domain
  * filter every modern curation pipeline trains (FineWeb-Edu, DCLM:
  * label a seed set, distill into a cheap linear model, score the
  * whole corpus): logistic regression over hashed bag-of-words
  * features, trained by full-batch gradient descent INSIDE Spark.
  *
  * Features (the fastText recipe): `dim` hashed buckets holding
  * TERM FREQUENCY (count/doc-length — content signal, length-
  * invariant) plus one structural slot holding the capped token count
  * (length signal — the axis quality gates actually key on). All
  * features live in micro-units ≤ 1e6, so every direction has
  * comparable curvature and one global learning rate (η = 4)
  * converges.
  *
  * Determinism contract (the q112/q118 oracle discipline, applied to
  * training): weights and features live on an integer micro-grid
  * (millionths, BIGINT), so each iteration's feature sums are EXACT
  * integer arithmetic; the floating steps — per-(doc, iter) one
  * margin descale + one sigmoid, per-(bucket, iter) one η·G/N — are
  * each a single fixed-shape IEEE expression over exact integers,
  * immediately re-rounded to the grid. Both engines therefore walk
  * the same integer state, and the DuckDB oracle replays training
  * bit-for-bit by unrolling the iterations as CTEs
  * (TextQueries.clfCtes).
  *
  * Update rule (mean logistic loss, learning rate η = 4):
  *   S_d  = Σ_h w_h·f_{d,h}               (exact, 1e12-scale integer)
  *   m_d  = round(S_d/1e6) + b;  p_d = σ(m_d/1e6)
  *   r_d  = round((p_d − y_d)·1e6)
  *   G_h  = Σ_d r_d·f_{d,h};  w_h ← w_h − round(η·G_h/(N·1e6))
  *   G_b  = Σ_d r_d;          b   ← b   − round(η·G_b/N)
  *
  * Scale shape: the feature frame is one map-side explode + two keyed
  * groupBys; each iteration is ONE broadcast join of the (dim+1)-row
  * weight table (bounded by a HYPERPARAMETER, not the corpus — the
  * legitimate broadcast the lmSurprisal lesson forbids for
  * vocabulary-sized tables) + one groupBy(doc) + one groupBy(h) whose
  * map-side partial aggregation ships ≤ dim+1 rows per partition. The
  * driver holds only the (dim+1)-entry weight vector between
  * iterations (the k-means-centroid precedent, Similarity.scala).
  * Scoring has two forms: the batch ledger (feature frame + bounded
  * broadcast + one keyed shuffle) and the inline serving path
  * ([[Classifier.scoreHashedLogisticInline]]) — the same margins as
  * ONE pure per-row expression, zero shuffles, append-mode
  * streaming-safe. */
object Classifier {

  /** Learned model: micro-unit weights for the `dim` tf buckets plus
    * the length slot at index `dim`, and the bias. Bounded by a
    * hyperparameter, never corpus-sized. */
  final case class HashedLogistic(weightsE6: Array[Long], biasE6: Long,
                                  dim: Int) {
    require(weightsE6.length == dim + 1,
            s"need $dim tf weights + 1 length weight, got ${weightsE6.length}")
  }

  /** Cap for the length feature: token counts saturate here, keeping
    * the feature ≤ 1e6 micro-units like every tf bucket. */
  val lenCap = 256

  /** The split family's md5 hash-point (TextAnalysis q75/q99
    * arithmetic, salt-decorrelated): first 8 hex chars of
    * md5(salt || token) as a long, mod `dim`. */
  private def hashPoint(key: Column, salt: String, mod: Long): Column =
    pmod(conv(substring(md5(concat(lit(salt), key)), 1, 8), 16, 10)
           .cast("long"), lit(mod))

  /** Micro-unit feature rows: (doc_id, h, f) — tf buckets
    * round(c·1e6/n) for h < dim, the capped-length slot
    * round(min(n,cap)·1e6/cap) at h = dim. Token-less docs emit no
    * rows and score at the bare bias. */
  def tfFeatures(df: DataFrame, idCol: String, textCol: String,
                 dim: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
                         explode(split(trim(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks
      .select(col("doc_id"), hashPoint(col("tok"), "clf", dim).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
    val nTok = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    counts.join(nTok, Seq("doc_id"))
      .select(col("doc_id"), col("h"),
              round(col("c") * 1e6 / col("n")).cast("long").as("f"))
      .unionAll(nTok.select(col("doc_id"), lit(dim.toLong).as("h"),
        round(least(col("n"), lit(lenCap.toLong)) * 1e6 / lenCap)
          .cast("long").as("f")))
  }

  private def sigmoid(mE6: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-(mE6 / 1e6)))

  /** Half-away-from-zero rounding — the convention BOTH SQL engines
    * use (`round(-2.5) = -3` in Spark SQL and DuckDB), unlike Scala's
    * `math.round` which rounds negative .5 ties toward +∞. The
    * driver-side weight update must match the oracle's replayed
    * `round()` exactly or a negative gradient hitting an exact tie
    * trains diverging weights. */
  private[pipeline] def roundHalfAway(x: Double): Long =
    math.signum(x).toLong * math.round(math.abs(x))

  /** (doc_id, y?, m_e6) margins for a weight frame + bias over the
    * full doc universe (feature-less docs keep the bare bias). */
  private def margins(universe: DataFrame, feat: DataFrame, wDf: DataFrame,
                      bE6: Long): DataFrame =
    universe
      .join(feat.join(wDf, Seq("h"))
              .groupBy(col("doc_id"))
              .agg(sum(col("w_e6") * col("f")).as("s")),
            Seq("doc_id"), "left")
      .withColumn("m_e6",
        round(coalesce(col("s"), lit(0L)) / 1e6).cast("long") + bE6)
      .drop("s")

  private def weightFrame(df: DataFrame, w: Array[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    broadcast(w.toSeq.zipWithIndex.map { case (we6, h) => (h.toLong, we6) }
      .toDF("h", "w_e6"))
  }

  /** Train by `iters` full-batch GD steps from w = 0. `label` must
    * evaluate to 0/1 over `df`'s rows. η is fixed at 4 (a power of
    * two — exact double scaling); with micro-grid features the
    * schedule-free rate is stable in every direction. */
  def trainHashedLogistic(df: DataFrame, idCol: String, textCol: String,
                          label: Column, dim: Int = 64,
                          iters: Int = 16): HashedLogistic = {
    require(dim >= 2 && iters >= 1, s"need dim >= 2, iters >= 1")
    val lab = graft.queries.cacheOnce(
      df.select(col(idCol).as("doc_id"), label.cast("long").as("y")))
    val n = lab.count()
    require(n > 0, "classifier needs a non-empty corpus")
    // r17 (guide §2.3/§2.4): each GD iteration used to run TWO driver
    // actions (bucket-gradient collect + bias-sum head), each
    // re-computing the residual frame through a broadcast join + a
    // per-doc groupBy + a doc-keyed join — ~3 shuffles and 2
    // driver-synchronized jobs per iteration, ×16 iterations. The
    // features are instead packed ONCE into a per-doc array (one
    // groupBy, cached); a single iteration is then a pure map over the
    // packed frame (margin = fold of the (dim+1)-entry weight LITERAL
    // over the doc's own features — bounded by a hyperparameter, the
    // inline-scorer precedent) + ONE groupBy(h) whose map-side partial
    // aggregation ships ≤ dim+2 rows per partition, with the bias
    // gradient riding the same aggregation as a sentinel slot h = −1.
    // One job, one shuffle per iteration; every sum is an exact
    // integer fold, so the weight walk is bit-identical to the joined
    // form (same micro-grid, order-independent long sums).
    val packed = graft.queries.cacheOnce(
      lab.join(tfFeatures(df, idCol, textCol, dim)
                 .groupBy(col("doc_id"))
                 .agg(collect_list(struct(col("h"), col("f"))).as("fs")),
               Seq("doc_id"), "left"))
    var w = Array.fill[Long](dim + 1)(0L)
    var b = 0L
    val emptyFs = array().cast("array<struct<h:bigint,f:bigint>>")
    for (_ <- 1 to iters) {
      val wArr = array(w.map(lit(_)): _*)
      val s = aggregate(coalesce(col("fs"), emptyFs), lit(0L),
        (acc, x) => acc +
          element_at(wArr, (x.getField("h") + 1).cast("int")) * x.getField("f"))
      val mE6 = round(s / 1e6).cast("long") + b
      val rE6 = round((sigmoid(mE6) - col("y")) * 1e6).cast("long")
      val grads = packed
        .select(rE6.as("r_e6"),
                concat(coalesce(col("fs"), emptyFs),
                       array(struct(lit(-1L).as("h"), lit(1L).as("f")))).as("fs"))
        .select(col("r_e6"), explode(col("fs")).as("x"))
        .groupBy(col("x.h").as("h"))
        .agg(sum(col("r_e6") * col("x.f")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (we6, h) =>
        we6 - roundHalfAway(4.0 * grads.getOrElse(h.toLong, 0L) / (n * 1e6)) }
      b = b - roundHalfAway(4.0 * grads.getOrElse(-1L, 0L) / n)
    }
    HashedLogistic(w, b, dim)
  }

  /** Score every document under a trained model: the per-doc ledger
    * (doc_id, label, margin_e6, p, pred). The batch form — feature
    * frame + bounded broadcast join + per-doc aggregation (one keyed
    * shuffle). For streams, use [[scoreHashedLogisticInline]]. */
  def scoreHashedLogistic(df: DataFrame, idCol: String, textCol: String,
                          label: Column, model: HashedLogistic): DataFrame =
    margins(df.select(col(idCol).as("doc_id"), label.cast("long").as("label")),
            tfFeatures(df, idCol, textCol, model.dim),
            weightFrame(df, model.weightsE6), model.biasE6)
      .select(col("doc_id"), col("label"),
              col("m_e6").as("margin_e6"),
              round(sigmoid(col("m_e6")), 6).as("p"),
              (col("m_e6") > 0).cast("long").as("pred"))

  /** SERVING-PATH scoring: the identical ledger computed as ONE pure
    * per-row expression — the whole margin (bucket counts, per-bucket
    * tf rounding, weight dot-product, length slot) folds into
    * higher-order array functions over the document's own tokens, with
    * the (dim+1)-entry weight vector as an expression literal (bounded
    * by a hyperparameter — the legitimate literal, unlike the
    * deprecated corpus-sized centroid literals). ZERO shuffles, no
    * join, no aggregation: scoring 100 TB is a map over the corpus,
    * and the same call runs unchanged under Structured Streaming in
    * append mode (the batch form's per-doc groupBy would demand
    * complete/update mode — this is the streaming-safe twin, parity
    * test-pinned). Cost is O(distinct-tokens × tokens) per document
    * from the count-by-filter inner loop — the per-doc bound every
    * array op here already carries. */
  def scoreHashedLogisticInline(df: DataFrame, idCol: String, textCol: String,
                                label: Column,
                                model: HashedLogistic): DataFrame = {
    val wArr = array(model.weightsE6.map(lit(_)): _*)
    val hs = transform(
      filter(split(trim(col(textCol)), " "), t => t =!= ""),
      t => pmod(conv(substring(md5(concat(lit("clf"), t)), 1, 8), 16, 10)
                  .cast("long"), lit(model.dim.toLong)))
    val scored = df
      .withColumn("__hs", hs)
      .withColumn("__n", size(col("__hs")))
      .withColumn("__s",
        aggregate(array_distinct(col("__hs")), lit(0L),
          (acc, h) => acc +
            element_at(wArr, (h + 1).cast("int")) *
            round(size(filter(col("__hs"), x => x === h)) * 1e6 / col("__n"))
              .cast("long")) +
        when(col("__n") > 0,
          lit(model.weightsE6(model.dim)) *
          round(least(col("__n").cast("long"), lit(lenCap.toLong)) * 1e6 / lenCap)
            .cast("long")).otherwise(lit(0L)))
      .withColumn("m_e6",
        round(col("__s") / 1e6).cast("long") + model.biasE6)
    scored.select(col(idCol).as("doc_id"), label.cast("long").as("label"),
                  col("m_e6").as("margin_e6"),
                  round(sigmoid(col("m_e6")), 6).as("p"),
                  (col("m_e6") > 0).cast("long").as("pred"))
  }

  /** Train-then-score porcelain: the corpus scored by the classifier
    * distilled from its own labels. */
  def distillClassifier(df: DataFrame, idCol: String, textCol: String,
                        label: Column, dim: Int = 64,
                        iters: Int = 16): DataFrame =
    scoreHashedLogistic(df, idCol, textCol, label,
      trainHashedLogistic(df, idCol, textCol, label, dim, iters))
}
