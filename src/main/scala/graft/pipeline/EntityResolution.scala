package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage — find near-duplicate entity NAMES (typo'd
  * vendors, re-keyed SKUs, mis-spelled merchants) without the n²
  * corpus join: dedupe to the distinct-name grid, block on EVERY
  * shared token up to a document-frequency cap, and confirm
  * candidates with exact Levenshtein.
  *
  * Why all-token (not rarest-token) blocking: a typo usually lands IN
  * the discriminative token, so rarest-token blocking puts the typo'd
  * name in a singleton block and misses exactly the pairs the
  * operator exists for. Blocking on every token keeps recall: a pair
  * is found iff it shares ANY token with df ≤ `maxDf`. The cap is the
  * standard stop-token cut (df-capped inverted index — the
  * containment-dedup idiom): ultra-common tokens ("inc", "the")
  * would otherwise quadratically dominate Σ df² for no precision.
  *
  * Scale shape: everything runs on the DISTINCT-name grid (row
  * counts ride along as weights); candidate volume is Σ_{df≤cap} df²
  * — bounded by the cap, never n²; pairs found via several tokens
  * collapse through one keyed distinct before the Levenshtein
  * confirm. */
object EntityResolution {

  /** @return (name_a, name_b, n_a, n_b, lev) for distinct-name pairs
    *         sharing a blocked token, with edit distance ≤ `maxLev`
    *         (name_a < name_b) */
  def fuzzyNamePairs(df: DataFrame, nameCol: String, maxLev: Int,
                     maxDf: Long = 1000L): DataFrame = {
    require(maxLev >= 0, "maxLev must be >= 0")
    require(maxDf >= 2, "maxDf must be >= 2 (df-1 tokens cannot pair)")
    val names = df.select(col(nameCol).as("nm"))
      .groupBy(col("nm")).agg(count(lit(1)).as("cnt"))
    val toks = names
      .select(col("nm"), col("cnt"),
              explode(split(trim(col("nm")), " ")).as("t"))
      .filter(col("t") =!= "")
      .distinct()
    val dfreq = toks.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2L)
    val blocks = toks.join(dfreq, Seq("t"))
      .select(col("t").as("bk"), col("nm"), col("cnt"))
    val a = blocks.select(col("bk"), col("nm").as("name_a"),
                          col("cnt").as("n_a"))
    val b = blocks.select(col("bk"), col("nm").as("name_b"),
                          col("cnt").as("n_b"))
    a.join(b, Seq("bk"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"))
      .distinct()
      .withColumn("lev", levenshtein(col("name_a"), col("name_b"))
        .cast("long"))
      .filter(col("lev") <= maxLev)
  }
}
