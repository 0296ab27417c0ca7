package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a positional token index — the retrieval
  * primitive BM25's bag-of-words scoring cannot express ("big query"
  * the product vs "big" + "query" anywhere), and the generalization
  * of the contamination check from shared n-grams to ARBITRARY quoted
  * strings. The index is the classic (doc, pos, term) table; an
  * m-word phrase is m−1 positional equi-joins (term i must sit at
  * first_pos + i), never a substring scan over raw text.
  *
  * Scale shape: the token explode is map-side; every join is keyed on
  * (doc, pos) with the PHRASE-TERM filter pushed into each branch's
  * scan, so join inputs are term-frequency-sized, not corpus-sized —
  * starting from the phrase's rarest term would shrink them further
  * (left as the standard optimization; join order here follows phrase
  * order so the oracle replays it verbatim). Occurrences may overlap
  * ("a a a" contains "a a" twice) — counted as such, the standard
  * positional-index semantics. */
object PhraseSearch {

  /** @return one row per matching doc: (doc_id, n_occurrences,
    *         first_pos) with pos 0-based in whitespace tokens. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val first = toks.filter(col("w") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matches = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (term, i)) =>
        acc.join(toks.filter(col("w") === term)
                   .select(col("doc_id"), (col("pos") - i).as("pos")),
                 Seq("doc_id", "pos"))
    }
    matches.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"),
           min(col("pos")).cast("long").as("first_pos"))
  }

  /** PROXIMITY search (Lucene's "sloppy phrase" family): documents
    * where ALL query terms co-occur inside a token window ≤ `slop`,
    * in ANY order — the retrieval middle ground between exact phrases
    * ([[phraseSearch]]) and the order-free bag-of-words BM25. Reports
    * the tightest window per doc (the span a highlighter would show)
    * and the number of qualifying term-position combinations.
    *
    * Scale shape: per term, position lists are term-frequency-sized
    * (filters push to the token scan); the m-way doc-keyed join is
    * Π tf_i per doc — the standard positional-index cost, bounded by
    * the query terms' in-doc frequencies, never doc length. */
  def proximitySearch(docs: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String], slop: Int): DataFrame = {
    require(terms.size >= 2, "proximity needs at least two terms")
    require(terms.distinct.size == terms.size, "terms must be distinct")
    require(slop >= terms.size - 1, "slop cannot be below terms-1")
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val first = toks.filter(col("w") === terms.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val joined = terms.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (term, i)) =>
        acc.join(toks.filter(col("w") === term)
                   .select(col("doc_id"), col("pos").as(s"p$i")),
                 Seq("doc_id"))
    }
    val ps = terms.indices.map(i => col(s"p$i"))
    val span = greatest(ps: _*) - least(ps: _*)
    joined
      .withColumn("span", span.cast("long"))
      .filter(col("span") <= slop.toLong)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
           min(col("span")).as("min_span"),
           min(least(ps: _*)).cast("long").as("first_pos"))
  }
}
