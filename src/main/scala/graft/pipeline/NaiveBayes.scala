package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes — the counts-only classifier that needs no
  * gradient loop: class priors and Laplace-smoothed token likelihoods
  * are ALL relational aggregates, so training is two groupBys and
  * scoring is a join — the cheapest possible labeled-corpus router
  * (language ID from a labeled seed, source attribution, spam
  * gating) and a natural complement to the gradient-trained
  * [[Classifier]].
  *
  * Determinism contract: log-probabilities live on the integer
  * micro-nat grid (round(ln(·)·1e6) longs — the BM25/DSIR oracle
  * idiom), so per-document scores are exact long sums (order-free)
  * and the argmax is replayable: ties break by label ascending via a
  * keyed rank, never by engine-dependent arg_max.
  *
  * Scale shape: training = one token explode + two keyed groupBys
  * (pair counts are vocabulary×labels-bounded); scoring joins test
  * tokens × labels (a LABEL-COUNT multiplier, not a corpus join),
  * left-joins the likelihood table UNHINTED (vocabulary-sized — the
  * lmSurprisal lesson), and ranks per doc. */
object NaiveBayes {

  /** Train on `isTrain` rows, score the rest.
    * @return one row per test doc: (id, true label, pred label,
    *         best score_e6, correct flag). Test docs with no
    *         whitespace tokens are skipped (no evidence). */
  def classify(df: DataFrame, idCol: String, textCol: String,
               labelCol: String, isTrain: Column): DataFrame = {
    val docs = df.select(col(idCol).as("id"), col(textCol).as("txt"),
                         col(labelCol).as("lbl"), isTrain.as("tr"))
    val toks = docs
      .select(col("id"), col("lbl"), col("tr"),
              explode(split(trim(col("txt")), " ")).as("t"))
      .filter(col("t") =!= "")
    val trainToks = toks.filter(col("tr"))
    val cnt = trainToks.groupBy(col("lbl"), col("t"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("lbl")).agg(sum(col("c")).as("tot"))
    val vocab = trainToks.select(col("t")).distinct()
      .agg(count(lit(1)).as("v"))
    val nDocs = docs.filter(col("tr")).groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_l"))
    val nTot = docs.filter(col("tr")).agg(count(lit(1)).as("n_all"))
    val priors = nDocs.crossJoin(nTot)
      .select(col("lbl").as("cl"),
        round(log(col("n_l").cast("double") / col("n_all")) * 1e6)
          .cast("long").as("prior_e6"))
    val llr = cnt.join(tot, Seq("lbl")).crossJoin(vocab)
      .select(col("lbl").as("cl"), col("t"),
        round(log((col("c") + 1L).cast("double") / (col("tot") + col("v")))
          * 1e6).cast("long").as("llr_e6"))
    val defaults = tot.crossJoin(vocab)
      .select(col("lbl").as("cl"),
        round(log(lit(1.0) / (col("tot") + col("v"))) * 1e6)
          .cast("long").as("def_e6"))
    val testToks = toks.filter(!col("tr"))
      .groupBy(col("id"), col("lbl").as("true_lbl"), col("t"))
      .agg(count(lit(1)).as("tc"))
    val scores = testToks
      .crossJoin(priors.select(col("cl")))
      .join(llr, Seq("cl", "t"), "left")
      .join(defaults, Seq("cl"))
      .withColumn("term", col("tc") * coalesce(col("llr_e6"), col("def_e6")))
      .groupBy(col("id"), col("true_lbl"), col("cl"))
      .agg(sum(col("term")).as("tok_e6"))
      .join(priors, Seq("cl"))
      .withColumn("score_e6", col("prior_e6") + col("tok_e6"))
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("score_e6").desc, col("cl"))
    scores
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") === 1)
      .select(col("id").as(idCol), col("true_lbl").as(labelCol),
        col("cl").as("pred_label"), col("score_e6").as("best_e6"),
        (col("true_lbl") === col("cl")).cast("long").as("correct"))
  }
}
