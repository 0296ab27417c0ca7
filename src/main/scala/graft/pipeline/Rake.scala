package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyphrase extraction (Rose et al. 2010) — the stopword-
  * delimited keyphrase baseline: candidate phrases are maximal
  * stopword-free token runs; each word scores deg/freq (degree =
  * Σ over its occurrences of the hosting phrase's length — words
  * that live in long phrases score high); a phrase scores the sum of
  * its words' scores. Cheap (no training), and a natural label
  * source next to the TF-IDF cluster keywords.
  *
  * Integer discipline: word score = (deg·1e6) div freq exact longs;
  * phrase score = exact long sum — fully SQL-replayable, ties broken
  * by phrase text ascending.
  *
  * Scale shape: tokenization is a map-side posexplode; phrase ids
  * come from a running stopword count — a window KEYED BY DOCUMENT
  * (bounded by doc length, the standard per-doc contract); word
  * stats are one vocabulary-keyed aggregate joined back UNHINTED;
  * the final top-k is a TakeOrdered. */
object Rake {

  /** @return top-k phrases corpus-wide: (phrase, n_occ, n_words,
    *         score_e6) */
  def rakePhrases(df: DataFrame, idCol: String, textCol: String,
                  stopwords: Seq[String] = TextAnalysis.stopwordsEn,
                  k: Int = 20, maxPhraseLen: Int = 4): DataFrame = {
    require(k >= 1 && maxPhraseLen >= 1, "k and maxPhraseLen >= 1")
    val toks = df
      .select(col(idCol).as("id"),
              posexplode(split(trim(col(textCol)), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("is_stop", col("tok").isin(stopwords: _*).cast("long"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phrased = toks
      .withColumn("pid", sum(col("is_stop")).over(wDoc))
      .filter(col("is_stop") === 0L)
    val phraseLen = phrased.groupBy(col("id"), col("pid"))
      .agg(count(lit(1)).as("plen"),
           concat_ws(" ", sort_array(collect_list(
             struct(col("pos"), col("tok")))).getField("tok")).as("phrase"))
      .filter(col("plen") <= maxPhraseLen)
    val wordOcc = phrased
      .join(phraseLen.select(col("id"), col("pid"), col("plen")),
            Seq("id", "pid"))
    val wordScore = wordOcc.groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("tok"), expr("(deg * 1000000) div freq").as("ws_e6"))
    val phraseScore = wordOcc.join(wordScore, Seq("tok"))
      .groupBy(col("id"), col("pid"))
      .agg(sum(col("ws_e6")).as("score_e6"))
      .join(phraseLen, Seq("id", "pid"))
    phraseScore.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("plen")).as("n_words"),
           max(col("score_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("phrase"))
      .limit(k)
  }
}
