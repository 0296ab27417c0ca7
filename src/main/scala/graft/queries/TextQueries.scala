package graft.queries

import graft.QueryDef
import graft.pipeline.{TextAnalysis, TextDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text pipeline: token stats, quality scoring, language
  * ID, fingerprinting, exact + MinHash/LSH + SimHash dedup (the
  * north-star LLM-pipeline ops). All oracles are exact: md5 + integer
  * arithmetic only.
  */
object TextQueries {

  /** Near-dup pipeline knobs, shared by the Spark defs and the oracle
    * SQL below: 16 minhashes (2 salted sha256 digests × 8 slices),
    * bands of 2 (8 bands → candidate threshold (1/8)^(1/2) ≈ 0.35,
    * recall ≈ 0.90 at the 0.5 Jaccard cut vs 0.44 for the old 2-band
    * config), and a 10% document-frequency shingle prune feeding
    * SIGNATURES only (the skew guard — exact Jaccard still uses full
    * shingle sets).
    *
    * Measured cost note (sf0.1): this corpus draws 500 docs from a tiny
    * shared vocabulary, so BACKGROUND pairs run J ≈ 0.1 (measured: 1.6M
    * of 10.3M pairs at J≈0.1, zero pairs in (0.25, 0.75), true dups all
    * ≥ 0.75) — the 0.35 threshold admits ~95k candidates (0.9% of all
    * pairs; the 2-band config admitted 22k at half the recall). On a
    * real web corpus background J ≈ 0 and r=2 leaks ~nothing
    * (p(J=0.01) ≈ 8e-4). Recall-first banding is the honest choice for
    * the stated J ≥ 0.5 contract; the candidate volume is the price of
    * the recall, not a plan defect. */
  private val nHashes = 16
  private val bandSize = 2
  private val maxDocFrac = 0.1
  /** estimate-then-verify: candidates must agree on ≥ this many of the
    * 16 minhashes before the exact-Jaccard join sees them. */
  private val minAgree = 4

  /** Shared oracle CTE: word arrays + distinct bigram shingles. */
  private val shinglesCte =
    """toks AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
      |big AS (SELECT DISTINCT doc_id, bg FROM (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(l)-1),
      |                        i -> l[i] || '_' || l[i+1])) AS bg
      |  FROM toks WHERE len(l) >= 2) x)""".stripMargin

  /** Oracle mirror of [[TextDedup.pruneFrequentShingles]]. */
  private val pruneCtes =
    s"""nd AS (SELECT count(DISTINCT doc_id) AS n FROM big),
      |freq AS (SELECT bg FROM big CROSS JOIN nd
      |         GROUP BY bg, n HAVING count(*) > n * $maxDocFrac),
      |bigp AS (SELECT doc_id, bg FROM big
      |         WHERE bg NOT IN (SELECT bg FROM freq))""".stripMargin

  /** Oracle mirror of [[TextDedup.minhashSignature]]'s salted digests:
    * group 0 is sha256(bg), group g > 0 is sha256(g || bg); hash i
    * slices digest i/8 at offset (i%8)*8. */
  private def digestSql(g: Int): String =
    if (g == 0) "sha256(bg)" else s"sha256('$g' || bg)"
  private val mhCols = (0 until nHashes).map(i =>
    s"min(substr(${digestSql(i / 8)}, ${(i % 8) * 8 + 1}, 8)) AS h$i")
    .mkString(",\n         ")
  private val bandSelects = (0 until nHashes by bandSize).map { st =>
    val hs = (st until math.min(st + bandSize, nHashes)).map(i => s"h$i").mkString(" || ")
    s"SELECT doc_id, md5($hs) AS band FROM mh"
  }.mkString("\n          UNION ALL ")

  /** Oracle mirror of [[TextDedup.filterBySignatureAgreement]]. */
  private val agreeSql = (0 until nHashes)
    .map(i => s"CASE WHEN ma.h$i = mb.h$i THEN 1 ELSE 0 END")
    .mkString(" + ")

  /** q50 — token counting via pure length arithmetic (identical scan in
    * both engines; no regex dialects involved). Delegates to the public
    * [[TextAnalysis.tokenStats]] surface. */
  private def q50(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenStats(t(s, dir, "documents"), "doc_id", "text",
                            passthrough = Seq("n_chars"))

  private val q50Sql =
    """SELECT doc_id,
      |  length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS n_tokens,
      |  length(text) AS text_len, n_chars
      |FROM documents""".stripMargin

  private val stopwordsEn = TextAnalysis.stopwordsEn

  /** q51 — quality scoring: token count, average token length, stopword
    * ratio, composite score ([[TextAnalysis.qualityScore]]). */
  private def q51(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")

  private def occSql(word: String): String = {
    val pad = s"(' ' || trim(text) || ' ')"
    s"(length($pad) - length(replace($pad, ' $word ', ''))) / ${word.length + 2}"
  }

  private val q51Sql = {
    val stops = stopwordsEn.map(occSql).mkString("(", " + ", ")")
    s"""SELECT doc_id,
      |  length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS n_tokens,
      |  round(length(replace(trim(text), ' ', '')) * 1.0 /
      |        (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1), 6) AS avg_token_len,
      |  round($stops * 1.0 /
      |        (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1), 6) AS stop_ratio,
      |  round(($stops * 1.0 /
      |        (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1)) * 0.5 +
      |        (length(replace(trim(text), ' ', '')) * 1.0 /
      |        (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1)) / 10.0 * 0.5, 6)
      |        AS quality_score
      |FROM documents""".stripMargin
  }

  /** q161 — per-source quota cap ([[TextAnalysis.sourceQuotaCap]]):
    * C4-style hard bound on any one domain's corpus share — keep the
    * best 10 docs per source by quality score. The distributed form is
    * the two-phase sharded top-q (no mega-domain single-task sort);
    * the oracle computes the equivalent single-window rank, so the
    * phase decomposition's exactness is hash-checked, not assumed. */
  private def q161(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceQuotaCap(t(s, dir, "documents"), "doc_id", "text",
                                "source", maxPerGroup = 10)

  private val q161Sql =
    s"""WITH s AS ($q51Sql),
      |r AS (SELECT d.doc_id, d.source, s.quality_score,
      |        CAST(row_number() OVER (PARTITION BY d.source
      |               ORDER BY s.quality_score DESC, d.doc_id) AS BIGINT) AS q_rank
      |      FROM documents d JOIN s ON s.doc_id = d.doc_id)
      |SELECT doc_id, source, quality_score, q_rank FROM r WHERE q_rank <= 10""".stripMargin

  private val langWords: Seq[(String, Seq[String])] = TextAnalysis.defaultLangWords

  /** q52 — n-gram/stopword language ID heuristic: per-language evidence
    * scores, argmax with a fixed preference order
    * ([[TextAnalysis.languageId]]). */
  private def q52(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")

  private val q52Sql = {
    // occurrence terms divide to DOUBLE; cast back to BIGINT to match the
    // Spark side's .cast("long")
    val sels = langWords.map { case (lang, ws) =>
      ws.map(occSql).mkString("CAST((", " + ", s") AS BIGINT) AS s_$lang")
    }.mkString(",\n  ")
    val maxExpr = langWords.map(p => s"s_${p._1}").mkString("greatest(", ", ", ")")
    val caseExpr = langWords.map { case (lang, _) =>
      s"WHEN s_$lang >= $maxExpr AND s_$lang > 0 THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH sc AS (SELECT doc_id,
      |  $sels
      |FROM documents)
      |SELECT doc_id, s_en, s_es, s_de, s_fr, $caseExpr AS lang_pred FROM sc""".stripMargin
  }

  /** q53 — document fingerprint: md5 of normalized text (bit-identical
    * hex in every engine; [[TextAnalysis.fingerprint]]). */
  private def q53(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")

  private val q53Sql =
    """SELECT doc_id, md5(trim(text)) AS fingerprint,
      |  substr(md5(trim(text)), 1, 8) AS fp_prefix
      |FROM documents""".stripMargin

  /** q54 — exact dedup: hash-groupBy on content hash, keep min doc_id
    * (single shuffle on the hash key — the 100 TB pattern). */
  private def q54(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(trim(col("text"))).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  private val q54Sql =
    """SELECT md5(trim(text)) AS content_hash, min(doc_id) AS keeper,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** q55 — MinHash signatures (16 salted hashes over document-frequency-
    * pruned bigram shingles). Since round 6 this runs the ZERO-SHUFFLE
    * per-row plan: one tiny corpus aggregation collects the frequent-
    * shingle exclude list (broadcast-sized by construction), then the
    * native `minhash_sig` expression computes each document's signature
    * where the text already is — nothing wide is ever shuffled, vs the
    * batch form's ~200 digest rows per document crossing the groupBy
    * (measured 3.3 s → the shuffle was the cost). Values are
    * bit-identical (row-vs-batch parity is test-pinned), so the oracle
    * is unchanged; docs the batch form never emits (<2 tokens, or every
    * shingle pruned) surface here as null signatures and are filtered. */
  /** The frequent-shingle exclude list is a corpus INDEX artifact
    * (broadcast-sized by construction — df-threshold bounded), so it
    * follows the same once-per-(session, dir) memo contract as the
    * near-dup pair frame below: computed on first use, reused by later
    * passes over the same dir; previous dirs' entries are evicted on
    * replacement. Without this every q55 pass re-ran the full shingle
    * aggregation + collect just to rebuild an identical tiny list. */
  private val exclMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[String]]
  private def frequentShingleList(s: SparkSession, dir: String): Seq[String] =
    exclMemo.getOrElseUpdate((s, dir), {
      exclMemo.keys.filter(_._1 eq s).filter(_._2 != dir)
        .foreach(exclMemo.remove)
      TextDedup.frequentShingles(
        TextDedup.bigramShingles(t(s, dir, "documents"), "doc_id", "text"), maxDocFrac)
    })

  private def q55(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val excl = frequentShingleList(s, dir)
    TextDedup.withRowMinhashSignature(
        docs.select(col("doc_id"), col("text")), "text", nHashes, excl)
      .filter(col("h0").isNotNull)
      .drop("text")
  }

  private val q55Sql =
    s"""WITH $shinglesCte,
      |$pruneCtes
      |SELECT doc_id,
      |       $mhCols
      |FROM bigp GROUP BY 1""".stripMargin

  /** q56/q57/q66 share the near-dup pair frame. It is pair-sized (tiny)
    * but expensive to produce, so it is built and cached ONCE per
    * (session, data dir) via this memo — not a `.cache()` side effect on
    * every registry call, which spammed "already cached" warnings and
    * made q57/q66 timings depend on execution order. At production scale
    * the same role is played by materializing the pair table once. */
  private val nearDupMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def nearDupFrame(s: SparkSession, dir: String): DataFrame =
    nearDupMemo.getOrElseUpdate((s, dir), {
      // eviction: at most ONE cached pair frame per session. A session
      // that walks many data dirs (bench warmup at sf0.001 then timing
      // at sf0.1, or a long-lived service) would otherwise accumulate a
      // CacheManager entry per dir forever; the memo's purpose is reuse
      // across q56/q57/q66 on the CURRENT dir, so the previous dir's
      // frame is released on replacement.
      nearDupMemo.keys.filter(_._1 eq s).foreach { k =>
        nearDupMemo.remove(k).foreach(_.unpersist())
      }
      val docs = t(s, dir, "documents")
      val sh = TextDedup.bigramShingles(docs, "doc_id", "text")
      val sig = TextDedup.minhashSignature(
        TextDedup.pruneFrequentShingles(sh, maxDocFrac), nHashes)
      val pairs = TextDedup.filterBySignatureAgreement(
        TextDedup.candidatePairs(TextDedup.lshBands(sig, nHashes, bandSize)),
        sig, nHashes, minAgree)
      TextDedup.jaccard(sh, pairs).filter(col("jaccard") >= 0.5).cache()
    })

  /** q56 — MinHash+LSH near-dup detection: band buckets → candidate
    * pairs → exact Jaccard ≥ 0.5. Candidates come from the band
    * hash-join, never an all-pairs cross join. */
  private def q56(s: SparkSession, dir: String): DataFrame = nearDupFrame(s, dir)

  /** Near-dup CTE chain shared by q56/q57/q66 (`dup` = confirmed
    * pairs). Kept WITH-less so q66 can prepend WITH RECURSIVE. */
  private val nearDupCtes =
    s"""$shinglesCte,
      |$pruneCtes,
      |mh AS (SELECT doc_id,
      |         $mhCols
      |       FROM bigp GROUP BY 1),
      |bands AS ($bandSelects),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
      |candf AS (SELECT c.da, c.db FROM cand c
      |          JOIN mh ma ON ma.doc_id = c.da
      |          JOIN mh mb ON mb.doc_id = c.db
      |          WHERE ($agreeSql) >= $minAgree),
      |n AS (SELECT doc_id, count(*) AS n FROM big GROUP BY 1),
      |inter AS (SELECT c.da, c.db, count(*) AS i
      |          FROM candf c JOIN big x ON x.doc_id = c.da
      |                       JOIN big y ON y.doc_id = c.db AND y.bg = x.bg
      |          GROUP BY 1, 2),
      |dup AS (SELECT inter.da AS da, inter.db AS db,
      |               round(i * 1.0 / (na.n + nb.n - i), 6) AS jaccard
      |        FROM inter JOIN n na ON na.doc_id = inter.da
      |                   JOIN n nb ON nb.doc_id = inter.db
      |        WHERE i * 1.0 / (na.n + nb.n - i) >= 0.5)""".stripMargin

  private val q56Sql = s"WITH $nearDupCtes\nSELECT da, db, jaccard FROM dup"

  /** q57 — top-20 near-dup pairs by bigram Jaccard (deterministic
    * tiebreak), over LSH candidates. */
  private def q57(s: SparkSession, dir: String): DataFrame =
    nearDupFrame(s, dir).orderBy(col("jaccard").desc, col("da"), col("db")).limit(20)

  private val q57Sql = q56Sql + "\nORDER BY jaccard DESC, da, db LIMIT 20"

  /** q66 — duplicate-cluster resolution: connected components over the
    * q56 near-dup pairs (min-label propagation; cluster id = min doc id
    * in the component; keeper = the canonical survivor). The oracle is
    * a recursive transitive closure producing the same min-reachable
    * labels. */
  private def q66(s: SparkSession, dir: String): DataFrame =
    TextDedup.dupClusters(
      t(s, dir, "documents").select(col("doc_id")),
      nearDupFrame(s, dir).select(col("da"), col("db")),
      broadcastEdgeMax = 0) // oracle-parity form of the DISTRIBUTED plain loop

  private val q66Sql =
    s"""WITH RECURSIVE $nearDupCtes,
      |edges AS (SELECT da AS src, db AS dst FROM dup
      |          UNION SELECT db AS src, da AS dst FROM dup),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM documents
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r)
      |SELECT id AS doc_id, min(r) AS cluster,
      |       CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      |FROM reach GROUP BY id""".stripMargin

  /** q78 — duplicate-cluster resolution through the POINTER-JUMP path
    * (the r7 deep-component escalation: label(v) ← label(label(v)) per
    * round, O(log diameter) rounds) under q66's EXACT oracle: the
    * escalation must change round count, never labels, so the same
    * recursive-transitive-closure SQL hash-checks it end-to-end. */
  private def q78(s: SparkSession, dir: String): DataFrame =
    TextDedup.dupClusters(
      t(s, dir, "documents").select(col("doc_id")),
      nearDupFrame(s, dir).select(col("da"), col("db")),
      pointerJump = true,
      broadcastEdgeMax = 0) // oracle-parity form of the POINTER-JUMP loop

  /** q80 — the one-call corpus dedup verdict
    * ([[TextDedup.dedupCorpus]]): exact-md5 edges ∪ confirmed near-dup
    * edges → connected components → (cluster, keeper, cluster size)
    * per document. The oracle extends q66's recursive closure with the
    * star-shaped exact edges and a cluster-size join — the whole
    * porcelain surface hash-checked as one query. */
  private def q80(s: SparkSession, dir: String): DataFrame =
    TextDedup.dedupCorpus(t(s, dir, "documents"), "doc_id", "text")

  private[queries] val q80Sql =
    s"""WITH RECURSIVE $nearDupCtes,
      |ex AS (SELECT md5(text) AS h, doc_id FROM documents),
      |exk AS (SELECT h, min(doc_id) AS da, count(*) AS nh FROM ex GROUP BY 1),
      |exedges AS (
      |  SELECT k.da AS src, e.doc_id AS dst FROM exk k JOIN ex e USING (h)
      |  WHERE k.nh > 1 AND k.da < e.doc_id),
      |edges AS (SELECT da AS src, db AS dst FROM dup
      |          UNION SELECT db AS src, da AS dst FROM dup
      |          UNION SELECT src, dst FROM exedges
      |          UNION SELECT dst AS src, src AS dst FROM exedges),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM documents
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |cl AS (
      |  SELECT id AS doc_id, min(r) AS cluster,
      |         CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      |  FROM reach GROUP BY id),
      |sz AS (SELECT cluster, count(*) AS n_cluster FROM cl GROUP BY 1)
      |SELECT cl.doc_id, cl.cluster, cl.is_keeper, sz.n_cluster
      |FROM cl JOIN sz USING (cluster)""".stripMargin

  /** q147 — quality-aware keeper selection ([[graft.pipeline.TextDedup
    * .keeperByScore]]): q80's duplicate clusters with each cluster's
    * keepership re-picked as the HIGHEST-quality member (q51's
    * composite score, ties → lowest doc_id) — "keep the best copy, not
    * the first copy". The oracle composes q80's full closure with
    * q51's score and one per-cluster window. */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val verdict = graft.pipeline.TextDedup.dedupCorpus(docs, "doc_id", "text")
    val scores = graft.pipeline.TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality_score").as("score"))
    graft.pipeline.TextDedup.keeperByScore(verdict, scores)
  }

  private val q147Sql =
    s"""WITH RECURSIVE $nearDupCtes,
      |ex AS (SELECT md5(text) AS h, doc_id FROM documents),
      |exk AS (SELECT h, min(doc_id) AS da, count(*) AS nh FROM ex GROUP BY 1),
      |exedges AS (
      |  SELECT k.da AS src, e.doc_id AS dst FROM exk k JOIN ex e USING (h)
      |  WHERE k.nh > 1 AND k.da < e.doc_id),
      |edges AS (SELECT da AS src, db AS dst FROM dup
      |          UNION SELECT db AS src, da AS dst FROM dup
      |          UNION SELECT src, dst FROM exedges
      |          UNION SELECT dst AS src, src AS dst FROM exedges),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM documents
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
      |sz AS (SELECT cluster, count(*) AS n_cluster FROM cl GROUP BY 1),
      |qs AS (SELECT doc_id, quality_score FROM ($q51Sql) q51)
      |SELECT cl.doc_id, cl.cluster,
      |       CAST(CASE WHEN row_number() OVER (
      |              PARTITION BY cl.cluster
      |              ORDER BY qs.quality_score DESC NULLS LAST, cl.doc_id) = 1
      |            THEN 1 ELSE 0 END AS BIGINT) AS is_keeper,
      |       sz.n_cluster, qs.quality_score AS score
      |FROM cl JOIN sz USING (cluster) LEFT JOIN qs USING (doc_id)""".stripMargin

  /** q157 — duplicated-LINE removal ([[TextDedup.removeDuplicateLines]]):
    * the CCNet/RefinedWeb boilerplate pass. The driver corpus carries
    * no newlines, so the query derives a deterministic line structure
    * first (6 words per line — the same derived-input pattern the
    * multimodal queries use for generated media), then removes every
    * line shared by ≥ 3 distinct documents. The oracle replays the
    * lineification AND the removal; at sf0.01 the corpus drops 28
    * boilerplate lines across its planted duplicate families while
    * 4.4k content lines survive — both branches live. */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val ws = split(trim(col("text")), " ")
    val lined = docs.select(
      col("doc_id"),
      array_join(
        transform(sequence(lit(0L), floor((size(ws) - 1) / lit(6))),
          i => array_join(slice(ws, (i * 6 + 1).cast("int"), lit(6)), " ")),
        "\n").as("text"))
    TextDedup.removeDuplicateLines(lined, "doc_id", "text", minDocFrequency = 3)
  }

  private val q157Sql =
    """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
      |ix AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w),
      |lines0 AS (
      |  SELECT doc_id, (i - 1) // 6 AS pos, string_agg(ws[i], ' ' ORDER BY i) AS line
      |  FROM ix GROUP BY doc_id, (i - 1) // 6),
      |dfq AS (SELECT line, count(DISTINCT doc_id) AS line_df FROM lines0 GROUP BY line),
      |j AS (
      |  SELECT l.doc_id, l.pos, l.line,
      |         (d.line_df >= 3 AND trim(l.line) <> '') AS is_dup
      |  FROM lines0 l JOIN dfq d USING (line))
      |SELECT doc_id,
      |       coalesce(string_agg(CASE WHEN NOT is_dup THEN line END,
      |                           chr(10) ORDER BY pos), '') AS clean_text,
      |       count(*) AS n_lines,
      |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |       (sum(CASE WHEN is_dup THEN 1 ELSE 0 END) > 0) AS changed
      |FROM j GROUP BY doc_id""".stripMargin

  /** q158 — containment dedup ([[TextDedup.containmentPairs]]): the
    * asymmetric axis resemblance dedup is blind to — a document quoted
    * INSIDE a longer one. Directed pairs at shingle containment ≥ 0.8
    * over word trigrams, candidates from the df-capped (≤ 64)
    * inverted-index join, containment confirmed on FULL shingle sets.
    * The oracle replays cap, candidates, and confirm exactly; at
    * sf0.01 the corpus yields 50 directed pairs of 23k candidates, 25
    * of them PARTIAL (containment < 1.0) — the regime Jaccard misses. */
  private def q158(s: SparkSession, dir: String): DataFrame =
    TextDedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
                               tau = 0.8, n = 3, maxDf = 64)

  private val q158Sql =
    """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS bg
      |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |  WHERE len(ws) >= 3),
      |dfq AS (SELECT bg, count(DISTINCT doc_id) AS d FROM g GROUP BY bg),
      |rare AS (SELECT g.doc_id, g.bg FROM g JOIN dfq USING (bg) WHERE dfq.d <= 64),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM rare a JOIN rare b USING (bg) WHERE a.doc_id <> b.doc_id),
      |cnt AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
      |i AS (
      |  SELECT c.da, c.db, count(*) AS i
      |  FROM cand c
      |  JOIN g ga ON ga.doc_id = c.da
      |  JOIN g gb ON gb.doc_id = c.db AND gb.bg = ga.bg
      |  GROUP BY c.da, c.db)
      |SELECT i.da AS contained, i.db AS container,
      |       round(i.i * 1.0 / ca.n_sh, 6) AS containment,
      |       ca.n_sh AS n_contained, cb.n_sh AS n_container
      |FROM i JOIN cnt ca ON ca.doc_id = i.da JOIN cnt cb ON cb.doc_id = i.db
      |WHERE round(i.i * 1.0 / ca.n_sh, 6) >= 0.8""".stripMargin

  /** q159 — LSH band-plan auto-tuner ([[TextDedup.lshBandPlan]]): the
    * (bands, rows) decision the whole near-dup tier hangs on, made
    * searchable. Every divisor split of a 64-hash signature is scored
    * by its S-curve error mass around the J = 0.5 contract
    * (recall-first: fnWeight = 3), in EXACT millionths integer
    * arithmetic — powers by repeated (x·Jµ) div 10⁶, masses as integer
    * grid sums — so the oracle replays the full optimization with two
    * recursive CTEs and the argmin flag hash-matches. The winner on
    * this config is (16, 4), whose S-curve midpoint (1/16)^(1/4) IS
    * 0.5 — the tuner rediscovers the textbook plan instead of having
    * it hand-picked. Config-sized end to end (7 plans × 99 grid
    * points); no corpus input. */
  private def q159(s: SparkSession, dir: String): DataFrame =
    TextDedup.lshBandPlan(s, nPerms = 64, thresholdMicro = 500000L,
                          fnWeight = 3L, gridSteps = 100)

  private val q159Sql =
    """WITH RECURSIVE
      |cand AS (SELECT b AS bands, 64 // b AS rows_per_band
      |         FROM generate_series(1, 64) t(b) WHERE 64 % b = 0),
      |grid AS (SELECT bands, rows_per_band, CAST(j * 10000 AS BIGINT) AS j_micro
      |         FROM cand CROSS JOIN generate_series(1, 99) g(j)),
      |px AS (
      |  SELECT bands, rows_per_band, j_micro, 0 AS i, CAST(1000000 AS BIGINT) AS x
      |  FROM grid
      |  UNION ALL
      |  SELECT bands, rows_per_band, j_micro, i + 1, (x * j_micro) // 1000000
      |  FROM px WHERE i < rows_per_band),
      |xf AS (SELECT bands, rows_per_band, j_micro, 1000000 - x AS y
      |       FROM px WHERE i = rows_per_band),
      |pz AS (
      |  SELECT bands, rows_per_band, j_micro, y, 0 AS i, CAST(1000000 AS BIGINT) AS z
      |  FROM xf
      |  UNION ALL
      |  SELECT bands, rows_per_band, j_micro, y, i + 1, (z * y) // 1000000
      |  FROM pz WHERE i < bands),
      |zf AS (SELECT bands, rows_per_band, j_micro, 1000000 - z AS p_micro
      |       FROM pz WHERE i = bands),
      |areas AS (SELECT bands, rows_per_band,
      |    CAST(sum(CASE WHEN j_micro < 500000 THEN p_micro ELSE 0 END) AS BIGINT) AS fp_mass,
      |    CAST(sum(CASE WHEN j_micro >= 500000 THEN 1000000 - p_micro ELSE 0 END) AS BIGINT) AS fn_mass
      |  FROM zf GROUP BY 1, 2),
      |obj AS (SELECT bands, rows_per_band, fp_mass, fn_mass,
      |               fp_mass + 3 * fn_mass AS objective FROM areas),
      |best AS (SELECT objective AS best_obj, bands AS best_bands
      |         FROM obj ORDER BY objective, bands LIMIT 1)
      |SELECT o.bands, o.rows_per_band, o.fp_mass, o.fn_mass, o.objective,
      |       CAST(CASE WHEN o.objective = b.best_obj AND o.bands = b.best_bands
      |            THEN 1 ELSE 0 END AS BIGINT) AS is_chosen
      |FROM obj o CROSS JOIN best b""".stripMargin

  /** q99 — leakage-safe split ([[TextAnalysis.leakageSafeSplit]]): the
    * train/val/test bucket assigned by duplicate CLUSTER so near-dup
    * renditions can never straddle splits. The oracle is q80's full
    * closure (near-dup chain + exact star edges + components) composed
    * with q75's split arithmetic keyed on the CLUSTER id — the
    * straddle-impossibility is checkable in the result itself (every
    * cluster maps to exactly one split). */
  private def q99(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TextAnalysis.leakageSafeSplit(t(s, dir, "documents"), "doc_id", "text")

  private val q99Sql =
    s"""WITH RECURSIVE $nearDupCtes,
      |ex AS (SELECT md5(text) AS h, doc_id FROM documents),
      |exk AS (SELECT h, min(doc_id) AS da, count(*) AS nh FROM ex GROUP BY 1),
      |exedges AS (
      |  SELECT k.da AS src, e.doc_id AS dst FROM exk k JOIN ex e USING (h)
      |  WHERE k.nh > 1 AND k.da < e.doc_id),
      |edges AS (SELECT da AS src, db AS dst FROM dup
      |          UNION SELECT db AS src, da AS dst FROM dup
      |          UNION SELECT src, dst FROM exedges
      |          UNION SELECT dst AS src, src AS dst FROM exedges),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM documents
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
      |sph AS (SELECT DISTINCT cluster, md5('split' || cluster) AS m FROM cl),
      |spp AS (
      |  SELECT cluster,
      |         CAST(list_sum(list_transform(generate_series(1, 8),
      |           j -> CAST(instr('0123456789abcdef', substr(m, j, 1)) - 1 AS BIGINT)
      |                * CAST(pow(16, 8 - j) AS BIGINT))) AS BIGINT) % 100 AS split_point
      |  FROM sph),
      |sp AS (SELECT cluster,
      |         CASE WHEN split_point < 90 THEN 'train'
      |              WHEN split_point < 95 THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM spp)
      |SELECT cl.doc_id, cl.cluster, sp.split
      |FROM cl JOIN sp USING (cluster)""".stripMargin

  /** q81 — BM25 lexical top-20 for a fixed query ("hash join filter" —
    * three mid-frequency corpus terms): the retrieval scorer over the
    * documents table. Per-(doc, term) contributions are integer-micro
    * scaled before the per-doc sum (order-independent — the repo's
    * exact-integer discipline), so score AND rank hash-match. The SQL
    * interpolates the SAME Scala doubles for k1+1 / 1−b (Double.toString
    * is shortest-round-trip, so both engines parse the identical
    * value). */
  private def q81(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
                          Seq("hash", "join", "filter"), 20)

  private val q81Sql = {
    val k1 = 1.2; val b = 0.75
    s"""WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
      |       WHERE t IN ('hash', 'join', 'filter') GROUP BY 1, 2),
      |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
      |c AS (
      |  SELECT tf.doc_id,
      |         CAST(round(ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
      |           * (tf.tf * ${k1 + 1}) / (tf.tf + $k1 * (${1.0 - b} + $b * dl.dl / st.avgdl))
      |           * 1000000.0) AS BIGINT) AS c_e6
      |  FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN st),
      |sc AS (SELECT doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6 FROM c GROUP BY 1)
      |SELECT doc_id, score_e6,
      |       CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rank
      |FROM sc ORDER BY score_e6 DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q82 — the FULL curation verdict ([[TextAnalysis.curateCorpus]]):
    * quality gate → dedup over survivors → split for keepers, every
    * document with its keep/drop decision and reason. The oracle
    * composes q51's quality SQL, the near-dup chain REBASED onto the
    * quality-passing subset (one mechanical `FROM documents` →
    * `FROM docs_q` rename of the shared CTE string — the chain's only
    * base-table reference), q80's closure with exact edges, and q75's
    * split fold. Thresholds (15 tokens, 0.24 score) sit inside the
    * corpus's measured quality range (0.195-0.306) so BOTH gate
    * branches are exercised. */
  private def q82(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.curateCorpus(t(s, dir, "documents"), "doc_id", "text",
                              minTokens = 15, minQuality = 0.24)

  private val q82Sql = {
    val minTokens = 15; val minQuality = 0.24
    val nearDupQ = nearDupCtes.replace("FROM documents", "FROM docs_q")
    s"""WITH RECURSIVE qual AS (
      |  SELECT doc_id, n_tokens, quality_score,
      |         (n_tokens >= $minTokens AND quality_score >= $minQuality) AS q_ok
      |  FROM ($q51Sql) q51),
      |docs_q AS (
      |  SELECT d.doc_id, d.text FROM documents d JOIN qual USING (doc_id)
      |  WHERE qual.q_ok),
      |$nearDupQ,
      |ex AS (SELECT md5(text) AS h, doc_id FROM docs_q),
      |exk AS (SELECT h, min(doc_id) AS da, count(*) AS nh FROM ex GROUP BY 1),
      |exedges AS (
      |  SELECT k.da AS src, e.doc_id AS dst FROM exk k JOIN ex e USING (h)
      |  WHERE k.nh > 1 AND k.da < e.doc_id),
      |edges AS (SELECT da AS src, db AS dst FROM dup
      |          UNION SELECT db AS src, da AS dst FROM dup
      |          UNION SELECT src, dst FROM exedges
      |          UNION SELECT dst AS src, src AS dst FROM exedges),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM docs_q
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |cl AS (
      |  SELECT id AS doc_id, min(r) AS cluster,
      |         CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      |  FROM reach GROUP BY id),
      |sph AS (SELECT doc_id, md5('split' || CAST(doc_id AS VARCHAR)) AS m
      |        FROM cl WHERE is_keeper = 1),
      |spp AS (
      |  SELECT doc_id,
      |         CAST(list_sum(list_transform(generate_series(1, 8),
      |           j -> CAST(instr('0123456789abcdef', substr(m, j, 1)) - 1 AS BIGINT)
      |                * CAST(pow(16, 8 - j) AS BIGINT))) AS BIGINT) % 100 AS split_point
      |  FROM sph),
      |sp AS (SELECT doc_id,
      |         CASE WHEN split_point < 90 THEN 'train'
      |              WHEN split_point < 95 THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM spp)
      |SELECT q.doc_id, q.n_tokens, q.quality_score,
      |       cl.cluster, cl.is_keeper, sp.split,
      |       CASE WHEN NOT q.q_ok THEN 'quality'
      |            WHEN cl.is_keeper = 0 THEN 'duplicate' END AS drop_reason,
      |       CAST(CASE WHEN q.q_ok AND cl.is_keeper = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM qual q LEFT JOIN cl USING (doc_id) LEFT JOIN sp USING (doc_id)""".stripMargin
  }

  /** q155 — the FULL-STACK curation verdict ([[graft.pipeline
    * .TextAnalysis.curateCorpusSemantic]]): q82's quality → dedup →
    * split chain with the SEMANTIC stage integrated between dedup and
    * split — embeddings built ONLY for near-dup keepers, frame-backed
    * multi-probe SemDeDup at round-6 cosine ≥ 0.98 (the measured q142
    * threshold), and the split re-keyed to the semantic survivors.
    * Four drop reasons, every document in the ledger. The oracle
    * composes q82's closure, the embedding CTEs REBASED onto the kept
    * docs (one mechanical FROM rename), the q142 SemDeDup closure,
    * and the split fold — the whole four-stage build in ONE
    * statement. */
  private def q155(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TextAnalysis.curateCorpusSemantic(
      t(s, dir, "documents"), "doc_id", "text",
      minTokens = 15, minQuality = 0.24, semTau = 0.98)

  private val q155Sql = {
    val minTokens = 15; val minQuality = 0.24; val semTau = 0.98
    val nearDupQ = nearDupCtes.replace("FROM documents", "FROM docs_q")
    val embQ = EmbeddingQueries.embCtes
      .replace("FROM documents", "FROM kept")
      .replace("etoks", "ketoks").replace("ecnt", "kecnt")
      .replace("eraw", "keraw").replace("efeat", "kefeat")
      .replace("er AS MATERIALIZED", "ker AS MATERIALIZED")
      .replace("JOIN er r", "JOIN ker r")
      .replace("epj", "kepj").replace("epl", "kepl")
    s"""WITH RECURSIVE qual AS (
      |  SELECT doc_id, n_tokens, quality_score,
      |         (n_tokens >= $minTokens AND quality_score >= $minQuality) AS q_ok
      |  FROM ($q51Sql) q51),
      |docs_q AS (
      |  SELECT d.doc_id, d.text FROM documents d JOIN qual USING (doc_id)
      |  WHERE qual.q_ok),
      |$nearDupQ,
      |ex AS (SELECT md5(text) AS h, doc_id FROM docs_q),
      |exk AS (SELECT h, min(doc_id) AS da, count(*) AS nh FROM ex GROUP BY 1),
      |exedges AS (
      |  SELECT k.da AS src, e.doc_id AS dst FROM exk k JOIN ex e USING (h)
      |  WHERE k.nh > 1 AND k.da < e.doc_id),
      |edges AS (SELECT da AS src, db AS dst FROM dup
      |          UNION SELECT db AS src, da AS dst FROM dup
      |          UNION SELECT src, dst FROM exedges
      |          UNION SELECT dst AS src, src AS dst FROM exedges),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM docs_q
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |cl AS (
      |  SELECT id AS doc_id, min(r) AS cluster,
      |         CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      |  FROM reach GROUP BY id),
      |kept AS (SELECT d.doc_id, d.text FROM docs_q d JOIN cl USING (doc_id)
      |         WHERE cl.is_keeper = 1),
      |$embQ,
      |kep AS (SELECT doc_id AS pid, v AS pv FROM kepl ORDER BY pid LIMIT 16),
      |kscored AS (
      |  SELECT kepl.doc_id, kepl.v, kep.pid,
      |         ${EmbeddingQueries.cosNSql("kepl.v", "kep.pv", 16, 4)} AS cs
      |  FROM kepl CROSS JOIN kep),
      |kranked AS (
      |  SELECT doc_id, v, pid,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY cs DESC, pid) AS arn
      |  FROM kscored),
      |kprobed AS (SELECT doc_id, v, pid AS pc FROM kranked WHERE arn <= 2),
      |kdup AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM kprobed a JOIN kprobed b ON a.pc = b.pc AND a.doc_id < b.doc_id
      |  WHERE ${EmbeddingQueries.cosNSql("a.v", "b.v", 16, 6)} >= $semTau),
      |kedges AS (SELECT da AS src, db AS dst FROM kdup
      |           UNION SELECT db AS src, da AS dst FROM kdup),
      |kreach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM kepl
      |  UNION
      |  SELECT kreach.id, kedges.dst FROM kreach JOIN kedges ON kedges.src = kreach.r),
      |scl AS (
      |  SELECT id AS doc_id, min(r) AS sem_cluster,
      |         CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS BIGINT) AS sem_keeper
      |  FROM kreach GROUP BY id),
      |sph AS (SELECT doc_id, md5('split' || CAST(doc_id AS VARCHAR)) AS m
      |        FROM scl WHERE sem_keeper = 1),
      |spp AS (
      |  SELECT doc_id,
      |         CAST(list_sum(list_transform(generate_series(1, 8),
      |           j -> CAST(instr('0123456789abcdef', substr(m, j, 1)) - 1 AS BIGINT)
      |                * CAST(pow(16, 8 - j) AS BIGINT))) AS BIGINT) % 100 AS split_point
      |  FROM sph),
      |sp AS (SELECT doc_id,
      |         CASE WHEN split_point < 90 THEN 'train'
      |              WHEN split_point < 95 THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM spp)
      |SELECT q.doc_id, q.n_tokens, q.quality_score,
      |       cl.cluster, cl.is_keeper, scl.sem_cluster, scl.sem_keeper, sp.split,
      |       CASE WHEN NOT q.q_ok THEN 'quality'
      |            WHEN cl.is_keeper = 0 THEN 'duplicate'
      |            WHEN scl.sem_keeper = 0 THEN 'semantic_dup' END AS drop_reason,
      |       CAST(CASE WHEN q.q_ok AND cl.is_keeper = 1
      |                      AND coalesce(scl.sem_keeper, 1) = 1
      |            THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM qual q LEFT JOIN cl USING (doc_id) LEFT JOIN scl USING (doc_id)
      |LEFT JOIN sp USING (doc_id)""".stripMargin
  }

  /** q83 — decontamination ([[TextDedup.contaminatedDocs]]): corpus
    * docs sharing ≥ 1 distinct 8-gram with a benchmark set (docs 0-4
    * standing in as the benchmark — every returned pair is a verbatim
    * 8-consecutive-word inclusion). The oracle reuses the corpus gram
    * table for the benchmark side (benchmark ⊂ corpus here), which is
    * exactly what the Spark side computes from the filtered frame. */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextDedup.contaminatedDocs(docs, "doc_id", "text",
                               docs.filter(col("doc_id") < 5), "doc_id", "text")
  }

  private val q83Sql = {
    val gram8 = (0 until 8).map(k => s"l[i + $k]").mkString(" || '_' || ")
    s"""WITH lw AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
      |cg AS (SELECT DISTINCT doc_id, bg FROM (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 7),
      |                        i -> $gram8)) AS bg
      |  FROM lw WHERE len(l) >= 8) x),
      |bg8 AS (SELECT doc_id AS bench_id, bg FROM cg WHERE doc_id < 5)
      |SELECT c.doc_id, b.bench_id, count(*) AS n_shared
      |FROM cg c JOIN bg8 b USING (bg)
      |GROUP BY 1, 2 HAVING count(*) >= 1""".stripMargin
  }

  /** q84 — repetition statistics ([[TextAnalysis.repetitionStats]]):
    * the quality family's repetition axis — per-doc bigram occurrence
    * counts, the top bigram's occurrence share, and the
    * duplicated-occurrence share. Integer counts + two rounded
    * divisions → exact hash compare. */
  private def q84(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text")

  private val q84Sql =
    """WITH lw AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 1),
      |                            i -> l[i] || '_' || l[i + 1])) AS bg
      |      FROM lw WHERE len(l) >= 2),
      |pg AS (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  count(*) AS n_distinct,
      |  round(max(c) / sum(c), 6) AS top_bigram_frac,
      |  round(1.0 - count(*) / sum(c), 6) AS dup_bigram_frac
      |FROM pg GROUP BY doc_id""".stripMargin

  /** q67 — BPE-style pre-tokenization counts: the GPT-2-ish regex
    * split into letter runs / digit runs / single punctuation marks
    * (the subword pre-pass every BPE tokenizer applies before merges).
    * Same regex class syntax evaluates identically in Java and RE2
    * dialects, so counts are engine-exact. */
  private def q67(s: SparkSession, dir: String): DataFrame = {
    def n(pat: String) =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    t(s, dir, "documents").select(
      col("doc_id"),
      n("[A-Za-z]+").as("n_word_toks"),
      n("[0-9]+").as("n_num_toks"),
      n("[^A-Za-z0-9 ]").as("n_punct_toks"),
      (n("[A-Za-z]+") + n("[0-9]+") + n("[^A-Za-z0-9 ]")).as("n_pre_toks"))
  }

  private val q67Sql =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[A-Za-z]+')) AS n_word_toks,
      |  len(regexp_extract_all(text, '[0-9]+')) AS n_num_toks,
      |  len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct_toks,
      |  len(regexp_extract_all(text, '[A-Za-z]+')) +
      |  len(regexp_extract_all(text, '[0-9]+')) +
      |  len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_pre_toks
      |FROM documents""".stripMargin

  /** q69 — Rabin-Karp rolling-hash fingerprints: the incremental
    * content fingerprint (native codegen'd expression) over the full
    * text and over the first-64-byte chunk — the per-chunk form a
    * content-defined-chunking dedup builds on. Integer-exact in any
    * engine; the DuckDB oracle folds ord() code points, identical on
    * this ASCII corpus (char length == octet length for every doc). */
  private def q69(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    def rh(c: org.apache.spark.sql.Column) =
      call_function("rolling_hash", encode(c, "UTF-8"))
    t(s, dir, "documents").select(
      col("doc_id"),
      rh(trim(col("text"))).as("rh_doc"),
      rh(substring(trim(col("text")), 1, 64)).as("rh_chunk0"))
  }

  private def rhSql(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(generate_series(1, length($expr)),
       |                 i -> CAST(ord(substr($expr, i, 1)) AS BIGINT))),
       |  (acc, x) -> (acc * 257 + x) % 1000000007)""".stripMargin

  private val q69Sql =
    s"""SELECT doc_id,
      |  ${rhSql("trim(text)")} AS rh_doc,
      |  ${rhSql("substr(trim(text), 1, 64)")} AS rh_chunk0
      |FROM documents""".stripMargin

  /** q58 — 16-bit SimHash signatures (integer-exact votes). Since
    * round 6 this runs the zero-shuffle per-row plan (native
    * `simhash16` expression; values bit-identical to the batch vote
    * groupBy, parity-pinned, oracle unchanged). The trim filter
    * replicates the batch row set exactly: a doc has zero tokens iff
    * its trimmed text is empty. */
  private def q58(s: SparkSession, dir: String): DataFrame =
    TextDedup.withRowSimhash16(
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .filter(trim(col("text")) =!= ""), "text")
      .select(col("doc_id"), col("simhash").cast("long").as("simhash"))

  /** Shared simhash CTEs → `sh(doc_id, simhash)` (q58, q92 over
    * the multibyte union via `src`). */
  private def simhashCtesFrom(src: String): String = {
    val votes = (0 until 16).map { j =>
      s"sum((instr('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1) % 2 * 2 - 1) AS v$j"
    }.mkString(",\n  ")
    val bits = (0 until 16).map(j => s"CASE WHEN v$j > 0 THEN ${1 << j} ELSE 0 END")
      .mkString(" + ")
    s"""tok AS (
      |  SELECT doc_id, md5(t) AS h FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM $src) x
      |  WHERE t <> ''),
      |v AS (SELECT doc_id,
      |  $votes
      |FROM tok GROUP BY 1),
      |sh AS (SELECT doc_id, $bits AS simhash FROM v)""".stripMargin
  }
  private val simhashCtes = simhashCtesFrom("documents")

  private val q58Sql =
    s"""WITH $simhashCtes
      |SELECT doc_id, simhash FROM sh""".stripMargin

  /** q72 — content-defined chunking (w=16, maskBits=6 → ~64-char
    * expected chunks): the full chunk table, hash-checked. The oracle
    * recomputes every position's 16-byte window hash POSITIONALLY
    * (list_sum of ascii·257^k mod 1e9+7 — exact BIGINT arithmetic, the
    * same polynomial as the native expression's O(1) rolling update),
    * applies the identical mask rule, and reassembles spans from the
    * per-doc cut list. */
  private def q72(s: SparkSession, dir: String): DataFrame =
    TextDedup.cdcChunks(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
              col("chunk_start"), col("chunk_len"), col("chunk_hash"))

  /** The q72 oracle parameterized over its source relation (q90 reuses
    * it over the multibyte union; `extraCte` prepends that union). */
  private def cdcSqlFrom(src: String, extraCte: String = ""): String = {
    val M = graft.plans.RollingHash.Mod
    // 257^(15-j) mod M for window position j = 0..15 (oldest byte first)
    val pows = (0 until 16).map(j =>
      (0 until (15 - j)).foldLeft(1L)((h, _) => h * graft.plans.RollingHash.Base % M))
    val powList = pows.mkString("[", ", ", "]")
    val st = "CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END"
    val ln = "ends[k] - CASE WHEN k = 1 THEN 0 ELSE ends[k-1] END"
    val pre = if (extraCte.isEmpty) "" else extraCte + ",\n"
    s"""WITH ${pre}d AS (SELECT doc_id, text AS s FROM $src WHERE length(text) > 0),
      |pos AS (SELECT doc_id, s, unnest(generate_series(16, length(s))) AS i FROM d),
      |h AS (
      |  SELECT doc_id, i,
      |         list_sum(list_transform(generate_series(0, 15),
      |           j -> CAST(ascii(substr(s, CAST(i - 15 + j AS BIGINT), 1)) AS BIGINT)
      |                * $powList[j + 1]))
      |           % $M AS hw
      |  FROM pos),
      |cuts AS (SELECT doc_id, list(i ORDER BY i) AS cs FROM h
      |         WHERE hw % 64 = 63 GROUP BY doc_id),
      |ce AS (
      |  SELECT d.doc_id, d.s,
      |         CASE WHEN c.cs IS NULL THEN [CAST(length(d.s) AS BIGINT)]
      |              WHEN c.cs[-1] = length(d.s) THEN c.cs
      |              ELSE list_append(c.cs, CAST(length(d.s) AS BIGINT)) END AS ends
      |  FROM d LEFT JOIN cuts c USING (doc_id)),
      |ch AS (SELECT doc_id, s, unnest(generate_series(1, len(ends))) AS k, ends FROM ce)
      |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
      |  CAST($st AS INTEGER) AS chunk_start,
      |  CAST($ln AS INTEGER) AS chunk_len,
      |  md5(substr(s, $st, $ln)) AS chunk_hash
      |FROM ch""".stripMargin
  }

  private val q72Sql = cdcSqlFrom("documents")

  /** q73 — chunk-level dedup resolution over the q72 table: one
    * hash-groupBy on chunk content (q54's single-shuffle shape at
    * chunk granularity — finds the bytes edit-shifted documents still
    * share). */
  private def q73(s: SparkSession, dir: String): DataFrame =
    TextDedup.chunkDedup(TextDedup.cdcChunks(t(s, dir, "documents"), "doc_id", "text"))

  private val q73Sql =
    s"""WITH chunks AS ($q72Sql)
      |SELECT chunk_hash, min(doc_id) AS keeper_doc, count(*) AS n_copies,
      |  count(DISTINCT doc_id) AS n_docs, min(chunk_len) AS chunk_len
      |FROM chunks GROUP BY 1""".stripMargin

  // q76 (16-bit SimHash near-dup pairs) RETIRED r14: its 16-bucket
  // band join was O(n²/16) at any corpus size — the last scale-unsafe
  // plan, demoted from bench since r11 while q77/q85 band the same
  // decision at production widths (65,536 / 4.3B buckets per band).
  // The 16-bit FINGERPRINT stays oracle-checked via q58; the banded
  // machinery's brute-force-recall proof at width 16 lives on in
  // PipelineSpec via fingerprintNearDupPairs.

  /** Shared 64-bit simhash CTEs → `sh64(doc_id, simhash)` (q77). Same
    * vote rule as `simhashCtes` extended to 64 lanes: lanes 0-31 vote
    * from md5(token), lanes 32-63 from md5('1' || token) (the salted
    * second digest — [[graft.plans.Simhash64]]). Disjoint bit literals
    * sum without carries; bit 63's literal is built with an explicit
    * BIGINT shift so DuckDB never promotes to HUGEINT. */
  private val simhash64Ctes = {
    val votes = (0 until 64).map { j =>
      val h = if (j < 32) "h0" else "h1"
      s"sum((instr('0123456789abcdef', substr($h, ${j % 32 + 1}, 1)) - 1) % 2 * 2 - 1) AS v$j"
    }.mkString(",\n  ")
    // DuckDB overflow-checks 1::BIGINT << 63, so bit 63's literal is
    // built as INT64_MIN arithmetic (the sum over disjoint bits never
    // overflows: bits 0-62 max to INT64_MAX, then + MIN is in range)
    val bits = (0 until 64).map { j =>
      val bitLit = if (j == 63) "(-9223372036854775807 - 1)"
                   else s"(CAST(1 AS BIGINT) << $j)"
      s"CASE WHEN v$j > 0 THEN $bitLit ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    s"""tok64 AS (
      |  SELECT doc_id, md5(t) AS h0, md5('1' || t) AS h1 FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |v64 AS (SELECT doc_id,
      |  $votes
      |FROM tok64 GROUP BY 1),
      |sh64 AS (SELECT doc_id, $bits AS simhash FROM v64)""".stripMargin
  }

  /** q77 — PRODUCTION-width (64-bit) SimHash near-dup pairs: Hamming
    * ≤ 3 via 4 bands of 16-BIT keys (65,536 buckets per band — the
    * band self-join that saturates at 16 buckets under q76's toy width
    * gets 4096× the key space here; see
    * [[TextDedup.simhashNearDupPairs64]]). The oracle replays all 64
    * nibble-parity votes from the two md5s, the band split, and the
    * popcount confirm — the full production operator hash-checked end
    * to end, not just its fingerprint. */
  private def q77(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhashNearDupPairs64(t(s, dir, "documents"), "doc_id", "text")

  private val q77Sql =
    s"""WITH $simhash64Ctes,
      |banded AS (
      |  SELECT doc_id, simhash, b.band, (simhash >> (b.band * 16)) & 65535 AS bv
      |  FROM sh64 CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db,
      |         a.simhash AS sa, b2.simhash AS sb
      |  FROM banded a JOIN banded b2
      |    ON a.band = b2.band AND a.bv = b2.bv AND a.doc_id < b2.doc_id)
      |SELECT da, db, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
      |FROM pairs WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin

  /** Shared 128-bit simhash CTEs → `sh128(doc_id, hi, lo)` (q85): four
    * salted digests (md5(t), md5('1'..'3' || t)), 32 nibble-parity
    * votes each; lanes 0-63 → lo (identical to sh64 by construction),
    * 64-127 → hi. */
  private val simhash128Ctes = {
    val votes = (0 until 128).map { j =>
      s"sum((instr('0123456789abcdef', substr(h${j / 32}, ${j % 32 + 1}, 1)) - 1) % 2 * 2 - 1) AS v$j"
    }.mkString(",\n  ")
    def bits(offset: Int) = (0 until 64).map { k =>
      val bitLit = if (k == 63) "(-9223372036854775807 - 1)"
                   else s"(CAST(1 AS BIGINT) << $k)"
      s"CASE WHEN v${offset + k} > 0 THEN $bitLit ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    s"""tok128 AS (
      |  SELECT doc_id, md5(t) AS h0, md5('1' || t) AS h1,
      |         md5('2' || t) AS h2, md5('3' || t) AS h3 FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |v128 AS (SELECT doc_id,
      |  $votes
      |FROM tok128 GROUP BY 1),
      |sh128 AS (SELECT doc_id, ${bits(64)} AS hi, ${bits(0)} AS lo FROM v128)""".stripMargin
  }

  /** q85 — 128-bit SimHash near-dup pairs: Hamming ≤ 3 via 4 bands of
    * 32-BIT keys — the band-key rung for 10¹⁰-document corpora
    * ([[TextDedup.simhashNearDupPairs128]]: 4.3B buckets per band
    * where the 64-bit form's 65,536 saturate). The oracle replays all
    * 128 votes from the four md5s, the two-long band split, and the
    * summed popcount confirm. */
  private def q85(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhashNearDupPairs128(t(s, dir, "documents"), "doc_id", "text")

  private val q85Sql =
    s"""WITH $simhash128Ctes,
      |banded AS (
      |  SELECT doc_id, hi, lo, b.band,
      |         CASE WHEN b.band < 2 THEN (lo >> (b.band * 32)) & 4294967295
      |              ELSE (hi >> ((b.band - 2) * 32)) & 4294967295 END AS bv
      |  FROM sh128 CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS da, b2.doc_id AS db,
      |         a.hi AS ha, a.lo AS la, b2.hi AS hb, b2.lo AS lb
      |  FROM banded a JOIN banded b2
      |    ON a.band = b2.band AND a.bv = b2.bv AND a.doc_id < b2.doc_id)
      |SELECT da, db,
      |       CAST(bit_count(xor(ha, hb)) AS BIGINT) +
      |       CAST(bit_count(xor(la, lb)) AS BIGINT) AS hamming
      |FROM pairs
      |WHERE CAST(bit_count(xor(ha, hb)) AS BIGINT) +
      |      CAST(bit_count(xor(la, lb)) AS BIGINT) <= 3""".stripMargin

  /** q75 — deterministic train/val/test split (90/5/5): content-derived
    * hash point (md5, engine-portable), not rand() — assignments are
    * reproducible across runs/engines/partitionings and stable under
    * corpus growth. The oracle folds the same 8 hex chars positionally
    * (exact BIGINT arithmetic). */
  private def q75(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.deterministicSplit(
      t(s, dir, "documents").select(col("doc_id")), "doc_id")

  private val q75Sql =
    """WITH h AS (
      |  SELECT doc_id, md5('split' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
      |p AS (
      |  SELECT doc_id,
      |         CAST(list_sum(list_transform(generate_series(1, 8),
      |           j -> CAST(instr('0123456789abcdef', substr(m, j, 1)) - 1 AS BIGINT)
      |                * CAST(pow(16, 8 - j) AS BIGINT))) AS BIGINT) % 100 AS split_point
      |  FROM h)
      |SELECT doc_id, split_point,
      |  CASE WHEN split_point < 90 THEN 'train'
      |       WHEN split_point < 95 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM p""".stripMargin

  /** MULTIBYTE parity corpus: the driver's documents table UNIONED
    * with four crafted non-ASCII rows — CJK, combining accents,
    * astral-plane emoji/math letters (surrogate pairs in the JVM), and
    * a mixed row with English stopwords — injected identically on both
    * sides (Spark union / SQL `UNION ALL VALUES`), so the q90-q92
    * oracles check the text operators on data where code points ≠
    * bytes ≠ UTF-16 units. This is the data-level pin for the r7 CDC
    * code-point fix: the ASCII driver corpus exercises that code only
    * by construction; these rows make a byte/char confusion a HASH
    * MISMATCH. Texts are long enough (≥ ~150 code points) that CDC
    * cuts land INSIDE multibyte runs. Escapes keep the source ASCII;
    * the strings interpolate into the oracle SQL as UTF-8. */
  private val mbRows: Seq[(Long, String)] = {
    // per-repeat counters break the rolling hash's periodicity so CDC
    // cuts land INSIDE the multibyte runs (a purely repeated text can
    // miss the boundary mask for its whole length); accents stay in
    // DECOMPOSED form (e + U+0301) so combining marks are their own
    // code points
    val cjk = (1 to 14).map(i => s"\u6c49\u5b57\u6587\u672c\u6d4b\u8bd5\u6570\u636e\u8d28\u91cf\u5f88\u91cd\u8981\u7b2c${i}\u6b21").mkString(" ")
    val accents = (1 to 8).map(i => s"cafe\u0301 de\u0301ja\u0300 vu nai\u0308ve fac\u0327ade entre\u0301e ${i * 37}!").mkString(" ")
    val astral = (1 to 7).map(i => s"emoji \ud83c\udf84 rocket \ud83d\ude80\ud83d\ude80 math \ud835\udc9c\ud835\udc9e no$i").mkString(" ")
    val mixed = ("the \u6c49\u5b57 and the cafe\u0301 of \ud83c\udf84 is a test " * 6).trim
    Seq((900001L, cjk), (900002L, accents), (900003L, astral), (900004L, mixed))
  }

  private def mbDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(mbRows.toDF("doc_id", "text"))
  }

  private val mbSrcCte = {
    val values = mbRows.map { case (id, txt) =>
      s"(CAST($id AS BIGINT), '$txt')"
    }.mkString(", ")
    s"""mbdocs AS (SELECT doc_id, text FROM documents
       |           UNION ALL SELECT * FROM (VALUES $values) v(doc_id, text))""".stripMargin
  }

  /** q162 — CCNet-normalized exact dedup
    * ([[TextDedup.normalizedExactDedup]]): exact dedup on the published
    * pre-hash fold (lowercase + accent fold + digits→0 + whitespace
    * collapse). The corpus is ASCII and variant-free, so every 9th doc
    * gets a planted twin — one `translate` injecting accents, case
    * flips, and shifted digits (the SAME expression on both sides, the
    * q102 pattern) — whose RAW md5 differs but whose normalized key
    * must fuse. The ledger's `raw_dup = 0 ∧ n_variants > 1` rows are
    * exactly the recall this op adds over q54's raw exact dedup. */
  private def q162(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val variants = docs.filter(pmod(col("doc_id"), lit(9)) === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
              translate(col("text"), "aebcd0123456789",
                        "áéBCD5678901234").as("text"))
    TextDedup.normalizedExactDedup(docs.unionByName(variants), "doc_id", "text")
  }

  private val q162Sql =
    s"""WITH u AS (SELECT doc_id, text FROM documents
      |           UNION ALL
      |           SELECT doc_id + 200000,
      |                  translate(text, 'aebcd0123456789', 'áéBCD5678901234')
      |           FROM documents WHERE doc_id % 9 = 0),
      |k AS (SELECT doc_id,
      |        md5(regexp_replace(regexp_replace(
      |              translate(lower(trim(text)),
      |                        '${TextDedup.accentFoldSrc}',
      |                        '${TextDedup.accentFoldDst}'),
      |              '[0-9]', '0', 'g'), ' +', ' ', 'g')) AS nkey,
      |        md5(text) AS rawkey
      |      FROM u),
      |ng AS (SELECT nkey, min(doc_id) AS canonical_id, count(*) AS n_variants
      |       FROM k GROUP BY 1),
      |rg AS (SELECT rawkey, count(*) AS n_raw FROM k GROUP BY 1)
      |SELECT k.doc_id, k.nkey, ng.canonical_id, ng.n_variants,
      |       CAST(CASE WHEN k.doc_id = ng.canonical_id THEN 1 ELSE 0 END AS BIGINT)
      |         AS is_keeper,
      |       CAST(CASE WHEN rg.n_raw >= 2 THEN 1 ELSE 0 END AS BIGINT) AS raw_dup
      |FROM k JOIN ng USING (nkey) JOIN rg USING (rawkey)""".stripMargin

  /** q90 — CDC chunking over the multibyte union: rolling hash over
    * CODE-POINT values, spans sliced by `substring` in the same unit
    * (the exact surface the r7 fix repaired). */
  private def q90(s: SparkSession, dir: String): DataFrame =
    TextDedup.cdcChunks(mbDocs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
              col("chunk_start"), col("chunk_len"), col("chunk_hash"))

  private val q90Sql = cdcSqlFrom("mbdocs", mbSrcCte)

  /** q91 — token stats + fingerprint + language ID over the multibyte
    * union: code-point `length`, space arithmetic, md5 over UTF-8
    * bytes, and stopword occurrence scoring must all agree on
    * non-ASCII text (all pure projections; one row per doc). */
  private def q91(s: SparkSession, dir: String): DataFrame = {
    val mb = mbDocs(s, dir)
    TextAnalysis.tokenStats(mb, "doc_id", "text")
      .join(TextAnalysis.fingerprint(mb, "doc_id", "text"), Seq("doc_id"))
      .join(TextAnalysis.languageId(mb, "doc_id", "text"), Seq("doc_id"))
  }

  private val q91Sql = {
    val sels = langWords.map { case (lang, ws) =>
      ws.map(occSql).mkString("CAST((", " + ", s") AS BIGINT) AS s_$lang")
    }.mkString(",\n  ")
    val maxExpr = langWords.map(p => s"s_${p._1}").mkString("greatest(", ", ", ")")
    val caseExpr = langWords.map { case (lang, _) =>
      s"WHEN s_$lang >= $maxExpr AND s_$lang > 0 THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH $mbSrcCte,
      |sc AS (SELECT doc_id,
      |  length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS n_tokens,
      |  length(text) AS text_len,
      |  md5(trim(text)) AS fingerprint,
      |  substr(md5(trim(text)), 1, 8) AS fp_prefix,
      |  $sels
      |FROM mbdocs)
      |SELECT doc_id, n_tokens, text_len, fingerprint, fp_prefix,
      |       s_en, s_es, s_de, s_fr, $caseExpr AS lang_pred FROM sc""".stripMargin
  }

  /** q92 — BPE-style pre-token counts + 16-bit SimHash over the
    * multibyte union: ASCII regex classes must count each non-ASCII
    * CODE POINT (not byte, not UTF-16 unit) once in the punct class in
    * both engines, and the tokenize→md5→vote sketch must agree on CJK/
    * emoji tokens (md5 runs over UTF-8 bytes either way). */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    def n(pat: String) =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    val mb = mbDocs(s, dir)
    val counts = mb.select(
      col("doc_id"),
      n("[A-Za-z]+").as("n_word_toks"),
      n("[0-9]+").as("n_num_toks"),
      n("[^A-Za-z0-9 ]").as("n_punct_toks"))
    val sh = TextDedup.withRowSimhash16(
        mb.filter(trim(col("text")) =!= ""), "text")
      .select(col("doc_id"), col("simhash").cast("long").as("simhash"))
    counts.join(sh, Seq("doc_id"))
  }

  private val q92Sql =
    s"""WITH $mbSrcCte,
      |${simhashCtesFrom("mbdocs")},
      |counts AS (SELECT doc_id,
      |  len(regexp_extract_all(text, '[A-Za-z]+')) AS n_word_toks,
      |  len(regexp_extract_all(text, '[0-9]+')) AS n_num_toks,
      |  len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct_toks
      |FROM mbdocs)
      |SELECT c.doc_id, c.n_word_toks, c.n_num_toks, c.n_punct_toks, sh.simhash
      |FROM counts c JOIN sh USING (doc_id)""".stripMargin

  /** Oracle mirror of [[TextAnalysis.hashPoint]]'s md5 arithmetic: the
    * first 8 hex chars of md5(salt || key) as a BIGINT, mod `mod` —
    * the q75/q99 split arithmetic generalized to any salt/modulus. */
  private[queries] def hashPointSql(keyExpr: String, salt: String, mod: Long): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 8),
      |           j -> CAST(instr('0123456789abcdef',
      |                           substr(md5('$salt' || $keyExpr), j, 1)) - 1 AS BIGINT)
      |                * CAST(pow(16, 8 - j) AS BIGINT))) AS BIGINT) % $mod""".stripMargin

  /** q102 — PII redaction ([[TextAnalysis.redactPii]]): emails, IPv4
    * addresses and international phone numbers counted and replaced
    * SEQUENTIALLY (each pattern sees the previous redactions' output).
    * The driver corpus carries no PII, so every third document gets a
    * deterministic doc_id-derived email + phone + IP appended — the
    * SAME expression on both sides — exercising both the match and
    * no-match branches. The oracle SQL is GENERATED from the same
    * pattern list the Spark side applies (RE2-safe patterns, so the
    * regex dialects agree), including the redacted text itself — a
    * replacement-semantics divergence is a hash mismatch. */
  private def q102(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val withPii = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
               lit("@example.com or +1555"),
               lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
               lit(" at 10."), pmod(col("doc_id"), lit(256)).cast("string"),
               lit("."), pmod(col("doc_id"), lit(100)).cast("string"), lit(".7")))
        .otherwise(col("text")).as("text"))
    TextAnalysis.redactPii(withPii, "doc_id", "text")
  }

  private val q102Sql = {
    val piiText =
      """CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' ||
        | CAST(doc_id AS VARCHAR) || '@example.com or +1555' ||
        | lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' at 10.' ||
        | CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ||
        | '.7' ELSE text END""".stripMargin.replace("\n", "")
    val pats = TextAnalysis.defaultPiiPatterns
    val stages = pats.zipWithIndex.map { case ((name, pat, repl), i) =>
      s"""s${i + 1} AS (SELECT doc_id,
        |  len(regexp_extract_all(t$i, '$pat')) AS n_$name,
        |  regexp_replace(t$i, '$pat', '$repl', 'g') AS t${i + 1}""".stripMargin +
        (if (i == 0) "" else s",\n  ${pats.take(i).map(p => s"n_${p._1}").mkString(", ")}") +
        s"\nFROM s$i)"
    }.mkString(",\n")
    val names = pats.map(p => s"n_${p._1}")
    s"""WITH s0 AS (SELECT doc_id, $piiText AS t0 FROM documents),
      |$stages
      |SELECT doc_id, ${names.mkString(", ")},
      |       ${names.mkString(" + ")} AS n_pii, t${pats.size} AS redacted
      |FROM s${pats.size}""".stripMargin
  }

  /** q103 — domain-mixture resampling
    * ([[TextAnalysis.temperatureResample]]): sample each `source` at a
    * rate ∝ n^0.5 toward a 200-doc target — temperature-flattened
    * domain mixing with exact-integer rate arithmetic (weights in
    * millionths from one sqrt each; no order-dependent float sums) and
    * the md5 hash-point keep decision, so the ledger hash-matches. */
  private def q103(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.temperatureResample(t(s, dir, "documents"), "doc_id", "source",
                                     targetTotal = 200, alpha = 0.5)

  private val q103Sql =
    s"""WITH cnt AS (SELECT source, count(*) AS n_group FROM documents GROUP BY 1),
      |w AS (SELECT source, n_group,
      |        CAST(round(sqrt(CAST(n_group AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_e6
      |      FROM cnt),
      |sw AS (SELECT sum(w_e6) AS sum_w FROM w),
      |r AS (SELECT source, n_group,
      |        CAST(round(200 * w_e6 * 1.0 / sum_w) AS BIGINT) AS target_n
      |      FROM w CROSS JOIN sw),
      |r2 AS (SELECT source, n_group, target_n,
      |        least(1000000, CAST(round(target_n * 1000000.0 / n_group) AS BIGINT))
      |          AS rate_e6 FROM r),
      |p AS (SELECT doc_id, source,
      |        ${hashPointSql("CAST(doc_id AS VARCHAR)", "mix", 1000000L)} AS point
      |      FROM documents)
      |SELECT p.doc_id, p.source, r2.n_group, r2.target_n, r2.rate_e6,
      |       CAST(CASE WHEN p.point < r2.rate_e6 THEN 1 ELSE 0 END AS BIGINT) AS sampled
      |FROM p JOIN r2 USING (source)""".stripMargin

  /** q104 — length-bucketed sequence packing
    * ([[TextAnalysis.packSequences]]): power-of-two token buckets
    * [16..512], 2048-token context windows, 32 md5-derived shards per
    * bucket (the skew guard), pack/slot assignment by per-(bucket,
    * shard) row_number. Pure window arithmetic — the oracle replays
    * it exactly. */
  private def q104(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packSequences(t(s, dir, "documents"), "doc_id", "text")

  private val q104Sql =
    s"""WITH nt AS (SELECT doc_id,
      |    length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS n_tokens
      |  FROM documents),
      |b AS (SELECT doc_id, n_tokens,
      |    CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
      |         WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
      |         WHEN n_tokens <= 256 THEN 256 ELSE 512 END AS bucket
      |  FROM nt),
      |sh AS (SELECT doc_id,
      |    ${hashPointSql("CAST(doc_id AS VARCHAR)", "pack", 32L)} AS shard
      |  FROM documents),
      |w AS (SELECT b.doc_id, n_tokens, bucket, shard,
      |    row_number() OVER (PARTITION BY bucket, shard ORDER BY b.doc_id) AS rn
      |  FROM b JOIN sh ON sh.doc_id = b.doc_id)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(bucket AS BIGINT) AS bucket,
      |  CAST(bucket AS BIGINT) * 1000000000 + CAST(shard AS BIGINT) * 1000000
      |       + CAST((rn - 1) // (2048 // bucket) AS BIGINT) AS pack_id,
      |  CAST((rn - 1) % (2048 // bucket) AS BIGINT) AS slot
      |FROM w""".stripMargin

  /** q105 — duplicated-span statistics
    * ([[TextDedup.duplicatedSpanStats]]): per document, the share of
    * its distinct 8-grams that occur in another document — the
    * span-level duplication signal whole-doc Jaccard misses. Integer
    * counts + one rounded division; flag at the rounded value. */
  private def q105(s: SparkSession, dir: String): DataFrame =
    TextDedup.duplicatedSpanStats(t(s, dir, "documents"), "doc_id", "text")

  private val q105Sql = {
    val gram8 = (0 until 8).map(k => s"l[i + $k]").mkString(" || '_' || ")
    s"""WITH lw AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
      |cg AS (SELECT DISTINCT doc_id, bg FROM (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 7),
      |                        i -> $gram8)) AS bg
      |  FROM lw WHERE len(l) >= 8) x),
      |dfq AS (SELECT bg, count(*) AS df FROM cg GROUP BY 1)
      |SELECT doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
      |  round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
      |    AS dup_span_frac,
      |  CAST(CASE WHEN round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 1.0
      |                        / count(*), 6) >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
      |    AS span_flagged
      |FROM cg JOIN dfq USING (bg) GROUP BY doc_id""".stripMargin
  }

  /** q106 — incremental dedup ([[TextDedup.incrementalDedup]]): docs
    * with doc_id % 5 = 0 play the NEW batch, the rest the existing
    * corpus; each new doc gets exact/near/unique + the smallest
    * matching existing doc. The frequent-shingle prune threshold
    * counts EXISTING docs only (stored-index semantics — the batch
    * must not shift the signature space); the oracle recomputes the
    * whole asymmetric chain. */
  /** The existing-corpus incremental index is the STORED artifact of
    * production ingest (parquet next to the corpus), so the registry
    * materializes it once per (session, dir) — same contract as the
    * near-dup pair memo: each q106 evaluation then costs only the NEW
    * batch's probe (batch-sized joins into the cached index frames). */
  private val incIdxMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), TextDedup.IncrementalIndex]
  private def incrementalIndex(s: SparkSession, dir: String): TextDedup.IncrementalIndex =
    incIdxMemo.getOrElseUpdate((s, dir), {
      incIdxMemo.keys.filter(_._1 eq s).filter(_._2 != dir).foreach { k =>
        incIdxMemo.remove(k).foreach { old =>
          Seq(old.freq, old.shingles, old.counts, old.sig, old.bands, old.exactHashes)
            .foreach(_.unpersist())
        }
      }
      val idx = TextDedup.buildIncrementalIndex(
        t(s, dir, "documents").filter(pmod(col("doc_id"), lit(5)) =!= 0),
        "doc_id", "text")
      Seq(idx.freq, idx.shingles, idx.counts, idx.sig, idx.bands, idx.exactHashes)
        .foreach(graft.queries.cacheOnce)
      idx
    })

  /** q109 — quality-rule ledger ([[TextAnalysis.qualityRules]]): the
    * Gopher/C4 rulebook as per-rule 0/1 verdicts (word-count window,
    * mean-word-length window, stopword floor, top-token dominance
    * ceiling) with the evidence columns each rule judged. Thresholds
    * sit inside the corpus's measured ranges (n_tokens 10-99 /
    * 10th-90th pct ≈ 21-88; avg len 3.7-5.3; stop hits 0-14 median 3;
    * top share 0.07-0.5 median 0.21), so every rule fires BOTH ways.
    * Integer evidence + round-6 ratios compared at the rounded value —
    * the oracle replays the ledger exactly. */
  private def q109(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityRules(t(s, dir, "documents"), "doc_id", "text")

  private val q109Sql = {
    val stop = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |pt AS (SELECT doc_id, t, count(*) AS c FROM toks GROUP BY 1, 2),
      |per AS (SELECT doc_id, sum(c) AS n_tokens, sum(length(t) * c) AS n_tok_chars,
      |               max(c) AS top_tok,
      |               sum(CASE WHEN t IN ($stop) THEN c ELSE 0 END) AS stop_hits
      |        FROM pt GROUP BY 1),
      |ev AS (SELECT doc_id, n_tokens,
      |              round(n_tok_chars * 1.0 / n_tokens, 6) AS avg_token_len,
      |              stop_hits,
      |              round(top_tok * 1.0 / n_tokens, 6) AS top_tok_frac
      |       FROM per),
      |r AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, avg_token_len,
      |             CAST(stop_hits AS BIGINT) AS stop_hits, top_tok_frac,
      |             CAST(CASE WHEN n_tokens >= 25 AND n_tokens <= 90
      |                  THEN 1 ELSE 0 END AS BIGINT) AS r_words,
      |             CAST(CASE WHEN avg_token_len >= 3.9 AND avg_token_len <= 5.1
      |                  THEN 1 ELSE 0 END AS BIGINT) AS r_avg_len,
      |             CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
      |             CAST(CASE WHEN top_tok_frac <= 0.25 THEN 1 ELSE 0 END AS BIGINT)
      |               AS r_top_frac
      |      FROM ev)
      |SELECT doc_id, n_tokens, avg_token_len, stop_hits, top_tok_frac,
      |       r_words, r_avg_len, r_stop, r_top_frac,
      |       r_words * r_avg_len * r_stop * r_top_frac AS q_keep
      |FROM r""".stripMargin
  }

  /** q110 — TF-IDF retrieval ([[TextAnalysis.tfidfTopK]]): cosine over
    * smooth-idf term vectors, the vector-space sibling of q81's BM25.
    * Query mixes one RARE term ('dup', df ≈ 5% of docs — the idf
    * discriminator) with two near-ubiquitous ones; idf is integer
    * millis, weights/norms/dots exact integer sums, one round-6
    * division at the end — hash-exact like q81. */
  private def q110(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(t(s, dir, "documents"), "doc_id", "text",
                           Seq("dup", "merge", "vector"), 20)

  private val q110Sql =
    s"""WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
      |st AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
      |w AS (SELECT tf.doc_id, tf.t,
      |             tf.tf * CAST(round((ln((st.n_docs + 1.0) / (dfq.df + 1.0)) + 1.0)
      |                                * 1000.0) AS BIGINT) AS w
      |      FROM tf JOIN dfq USING (t) CROSS JOIN st),
      |nrm AS (SELECT doc_id, sum(w * w) AS norm2_d FROM w GROUP BY 1),
      |qt AS (SELECT q.t,
      |              CAST(round((ln((st.n_docs + 1.0) / (COALESCE(dfq.df, 0) + 1.0)) + 1.0)
      |                         * 1000.0) AS BIGINT) AS wq
      |       FROM (VALUES ('dup'), ('merge'), ('vector')) AS q(t)
      |       LEFT JOIN dfq USING (t) CROSS JOIN st),
      |qn AS (SELECT sum(wq * wq) AS norm2_q FROM qt),
      |d AS (SELECT w.doc_id, sum(w.w * qt.wq) AS dot
      |      FROM w JOIN qt USING (t) GROUP BY 1),
      |sc AS (SELECT d.doc_id,
      |              round(d.dot / (sqrt(nrm.norm2_d) * sqrt(qn.norm2_q)), 6) AS score
      |       FROM d JOIN nrm USING (doc_id) CROSS JOIN qn)
      |SELECT doc_id, score,
      |       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
      |FROM sc ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** q111 — deterministic shuffle-and-shard
    * ([[TextAnalysis.shuffleShards]]): the reproducible global
    * training-order permutation (md5 sort key), balanced shard
    * assignment, per-shard rank and the round-robin interleaved global
    * position. Pure hash arithmetic + one per-shard window — the
    * oracle replays every column. */
  private def q111(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.shuffleShards(t(s, dir, "documents"), "doc_id")

  private val q111Sql =
    s"""WITH h AS (
      |  SELECT doc_id, md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS sort_key,
      |         ${hashPointSql("CAST(doc_id AS VARCHAR)", "shuffle|", 8L)} AS shard
      |  FROM documents),
      |p AS (SELECT doc_id, sort_key, shard,
      |             CAST(row_number() OVER (PARTITION BY shard
      |                                     ORDER BY sort_key, doc_id) AS BIGINT) - 1
      |               AS pos
      |      FROM h)
      |SELECT doc_id, sort_key, shard, pos, pos * 8 + shard AS global_pos
      |FROM p""".stripMargin

  /** q112 — LM-surprisal quality filter ([[TextAnalysis.lmSurprisal]]):
    * the perplexity axis, self-trained unigram LM. The 3.41-nat flag
    * threshold sits between the corpus median (≈ 3.401) and max
    * (≈ 3.699) mean surprisal, so both branches fire. Milli-nat
    * integer surprisals, integer sums, round-6 mean — the oracle
    * replays training AND scoring. */
  private def q112(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmSurprisal(t(s, dir, "documents"), "doc_id", "text")

  private val q112Sql =
    s"""WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |ct AS (SELECT t, count(*) AS c FROM toks GROUP BY 1),
      |tot AS (SELECT sum(c) AS tt FROM ct),
      |s AS (SELECT t, CAST(round(ln(tt * 1.0 / c) * 1000.0) AS BIGINT) AS s_e3
      |      FROM ct CROSS JOIN tot),
      |per AS (SELECT doc_id, count(*) AS n_tokens, sum(s_e3) AS s_sum
      |        FROM toks JOIN s USING (t) GROUP BY 1)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |       CAST(s_sum AS BIGINT) AS surprisal_e3,
      |       round(s_sum * 1.0 / n_tokens, 6) AS avg_surprisal_e3,
      |       round(exp(round(s_sum * 1.0 / n_tokens, 6) / 1000.0), 6) AS perplexity,
      |       CAST(CASE WHEN round(s_sum * 1.0 / n_tokens, 6) > 3410.0
      |            THEN 1 ELSE 0 END AS BIGINT) AS ppl_flagged
      |FROM per""".stripMargin

  /** q113 — token-id encoding ([[TextAnalysis.encodeTokens]]): the
    * tokenizer APPLY step — each document as its frequency-ranked
    * id array, trained by q107's vocabulary at top-30 so the corpus's
    * 31st token ('dup') exercises the OOV slot (26 occurrences encode
    * as 0). Position-pinned array order; the oracle replays the
    * vocabulary AND the encoding. */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // the id ARRAY is the operator's contract (unit-pinned); the driver
    // compare needs scalar columns, so the query row-izes it exactly
    // like q100 row-izes the JL projection
    TextAnalysis.encodeTokens(docs, "doc_id", "text",
                              TextAnalysis.vocabulary(docs, "doc_id", "text", topK = 30))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
              posexplode(col("ids")).as(Seq("pos", "tid")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tid"),
              col("n_tokens"), col("n_oov"))
  }

  private val q113Sql =
    """WITH lw AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
      |pt AS (SELECT doc_id, u.i AS pos, l[u.i] AS tok
      |       FROM lw, LATERAL unnest(generate_series(1, len(l))) AS u(i)
      |       WHERE l[u.i] <> ''),
      |tf AS (SELECT tok, count(*) AS n_occ FROM pt GROUP BY 1),
      |vocab AS (SELECT tok,
      |            CAST(row_number() OVER (ORDER BY n_occ DESC, tok) AS BIGINT) AS rank
      |          FROM tf ORDER BY n_occ DESC, tok LIMIT 30),
      |enc AS (SELECT pt.doc_id, pt.pos, COALESCE(v.rank, 0) AS tid
      |        FROM pt LEFT JOIN vocab v USING (tok)),
      |dense AS (SELECT doc_id,
      |            CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) - 1
      |              AS pos, tid
      |          FROM enc),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |               CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |        FROM dense GROUP BY 1)
      |SELECT d.doc_id, d.pos, d.tid, a.n_tokens, a.n_oov
      |FROM dense d JOIN agg a USING (doc_id)""".stripMargin

  /** q114 — corpus report ([[TextAnalysis.corpusReport]]): the
    * dataset-card single row — document/token/vocabulary counts, the
    * exact-duplicate footprint, and the quality/perplexity kill
    * counts, every column an integer composed from its family's full
    * computation. */
  private def q114(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.corpusReport(t(s, dir, "documents"), "doc_id", "text")

  private val q114Sql = {
    val qualityDrop =
      s"""(SELECT count(*) FROM documents d
         | LEFT JOIN (${q109Sql.replace("\n", " ")}) q ON q.doc_id = d.doc_id
         | WHERE COALESCE(q.q_keep, 0) = 0)""".stripMargin.replace("\n", " ")
    val pplFlag =
      s"(SELECT count(*) FROM (${q112Sql.replace("\n", " ")}) p WHERE p.ppl_flagged = 1)"
    s"""WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |dup AS (SELECT COALESCE(sum(CASE WHEN nh > 1 THEN nh ELSE 0 END), 0) AS n
      |        FROM (SELECT md5(text) AS h, count(*) AS nh FROM documents GROUP BY 1) g)
      |SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
      |       CAST((SELECT count(*) FROM toks) AS BIGINT) AS n_tokens,
      |       CAST((SELECT count(DISTINCT t) FROM toks) AS BIGINT) AS vocab_size,
      |       CAST((SELECT n FROM dup) AS BIGINT) AS n_exact_dup_docs,
      |       CAST($qualityDrop AS BIGINT) AS n_quality_drop,
      |       CAST($pplFlag AS BIGINT) AS n_ppl_flagged""".stripMargin
  }

  /** q115 — DSIR importance weights ([[TextAnalysis.dsirWeights]]):
    * hashed-bigram importance resampling with the English documents as
    * the target domain. On this corpus the weights discriminate hard —
    * ~82% of target-language docs score log w > 0 vs ~14% of the rest
    * (measured) — so both selection branches fire on both sides. The
    * oracle replays hashing, both smoothed LMs, and the integer
    * ledger. */
  private def q115(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
                             col("lang") === "en")

  /** Shared CTE chain replaying [[graft.pipeline.TextAnalysis.dsirWeights]]
    * (the q115 body, factored so q160's resample can compose on top). */
  private val dsirCtes = {
    val b = 1024
    s"""lw AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS l
      |            FROM documents),
      |gr AS (SELECT doc_id, lang, unnest(list_transform(generate_series(1, len(l) - 1),
      |                i -> l[i] || '_' || l[i+1])) AS g
      |       FROM lw WHERE len(l) >= 2),
      |fb AS (SELECT doc_id, CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
      |              AS is_target,
      |              ${hashPointSql("g", "dsir", 1024L)} AS b
      |       FROM gr),
      |tc AS (SELECT b, count(*) AS ct FROM fb WHERE is_target = 1 GROUP BY 1),
      |rc AS (SELECT b, count(*) AS cr FROM fb WHERE is_target = 0 GROUP BY 1),
      |tt AS (SELECT sum(ct) AS st FROM tc),
      |rt AS (SELECT sum(cr) AS sr FROM rc),
      |sc AS (SELECT bs.b,
      |         CAST(round(ln((COALESCE(tc.ct, 0) + 1.0) / (tt.st + $b)) * 1000.0)
      |              AS BIGINT)
      |       - CAST(round(ln((COALESCE(rc.cr, 0) + 1.0) / (rt.sr + $b)) * 1000.0)
      |              AS BIGINT) AS d_e3
      |       FROM (SELECT DISTINCT b FROM fb) bs
      |       LEFT JOIN tc ON tc.b = bs.b LEFT JOIN rc ON rc.b = bs.b
      |       CROSS JOIN tt CROSS JOIN rt),
      |wdoc AS (SELECT fb.doc_id, max(fb.is_target) AS is_target,
      |       CAST(count(*) AS BIGINT) AS n_feats,
      |       CAST(sum(sc.d_e3) AS BIGINT) AS logw_e3,
      |       CAST(CASE WHEN sum(sc.d_e3) > 0 THEN 1 ELSE 0 END AS BIGINT)
      |         AS dsir_selected
      |FROM fb JOIN sc USING (b) GROUP BY fb.doc_id)""".stripMargin
  }

  private val q115Sql =
    s"""WITH $dsirCtes
      |SELECT doc_id, is_target, n_feats, logw_e3, dsir_selected FROM wdoc""".stripMargin

  /** q160 — DSIR resampling ([[TextAnalysis.dsirResample]]): the
    * sampling step the published recipe trains on — Gumbel-top-k over
    * the q115 importance weights (key = logw + content-derived Gumbel
    * noise, keep the 150 largest keys; ∝-weight sampling WITHOUT
    * replacement). Closes the weights→subset chain. The oracle
    * composes the full q115 replay with the same md5-point Gumbel
    * draw and the deterministic (key, doc_id) top-k; global top-k
    * plans as TakeOrderedAndProject, not a single-partition sort. */
  private def q160(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirResample(t(s, dir, "documents"), "doc_id", "text",
                              col("lang") === "en", k = 150)

  private val q160Sql =
    s"""WITH $dsirCtes,
      |gk AS (SELECT doc_id, is_target, logw_e3,
      |         CAST(round(-ln(-ln((${hashPointSql("doc_id", "dsir-gum", 1000000L)}
      |                              + 0.5) / 1000000.0)) * 1000.0) AS BIGINT) AS g_e3
      |       FROM wdoc)
      |SELECT doc_id, is_target, logw_e3, g_e3, logw_e3 + g_e3 AS key_e3
      |FROM gk ORDER BY key_e3 DESC, doc_id LIMIT 150""".stripMargin

  /** q117 — pack materialization ([[TextAnalysis.materializePacks]]):
    * the flattened training rows — q113's token ids placed at q104's
    * pack coordinates (pos = slot·bucket + in-doc position, padding
    * implicit). The oracle composes both replays and the position
    * arithmetic; a mismatch anywhere in tokenize→encode→pack→flatten
    * is a hash mismatch here. */
  private def q117(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.materializePacks(docs, "doc_id", "text",
                                  TextAnalysis.vocabulary(docs, "doc_id", "text", topK = 30))
  }

  private val q117Sql =
    s"""WITH lw AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
      |pt AS (SELECT doc_id, u.i AS pos, l[u.i] AS tok
      |       FROM lw, LATERAL unnest(generate_series(1, len(l))) AS u(i)
      |       WHERE l[u.i] <> ''),
      |tf AS (SELECT tok, count(*) AS n_occ FROM pt GROUP BY 1),
      |vocab AS (SELECT tok,
      |            CAST(row_number() OVER (ORDER BY n_occ DESC, tok) AS BIGINT) AS rank
      |          FROM tf ORDER BY n_occ DESC, tok LIMIT 30),
      |dense AS (SELECT doc_id,
      |            CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) - 1
      |              AS tok_pos,
      |            COALESCE(v.rank, 0) AS tid
      |          FROM pt LEFT JOIN vocab v USING (tok)),
      |nt AS (SELECT doc_id,
      |    length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS n_tokens
      |  FROM documents),
      |b AS (SELECT doc_id, n_tokens,
      |    CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
      |         WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
      |         WHEN n_tokens <= 256 THEN 256 ELSE 512 END AS bucket
      |  FROM nt),
      |sh AS (SELECT doc_id,
      |    ${hashPointSql("CAST(doc_id AS VARCHAR)", "pack", 32L)} AS shard
      |  FROM documents),
      |w AS (SELECT b.doc_id, bucket, shard,
      |    row_number() OVER (PARTITION BY bucket, shard ORDER BY b.doc_id) AS rn
      |  FROM b JOIN sh ON sh.doc_id = b.doc_id),
      |pk AS (SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
      |    CAST(bucket AS BIGINT) * 1000000000 + CAST(shard AS BIGINT) * 1000000
      |         + CAST((rn - 1) // (2048 // bucket) AS BIGINT) AS pack_id,
      |    CAST((rn - 1) % (2048 // bucket) AS BIGINT) AS slot
      |  FROM w)
      |SELECT pk.pack_id, pk.slot * pk.bucket + d.tok_pos AS pos, d.tid, d.doc_id
      |FROM dense d JOIN pk USING (doc_id)
      |WHERE d.tok_pos < pk.bucket""".stripMargin

  private def q106(s: SparkSession, dir: String): DataFrame =
    TextDedup.incrementalDedupAgainst(
      t(s, dir, "documents").filter(pmod(col("doc_id"), lit(5)) === 0),
      "doc_id", "text", incrementalIndex(s, dir))

  private val q106Sql =
    s"""WITH $shinglesCte,
      |nd AS (SELECT count(*) AS n FROM documents WHERE doc_id % 5 <> 0),
      |freq AS (SELECT bg FROM big CROSS JOIN nd
      |         WHERE doc_id % 5 <> 0
      |         GROUP BY bg, n HAVING count(*) > n * $maxDocFrac),
      |bigp AS (SELECT doc_id, bg FROM big
      |         WHERE bg NOT IN (SELECT bg FROM freq)),
      |mh AS (SELECT doc_id,
      |         $mhCols
      |       FROM bigp GROUP BY 1),
      |bands AS ($bandSelects),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM bands a JOIN bands b ON a.band = b.band
      |         WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
      |candf AS (SELECT c.da, c.db FROM cand c
      |          JOIN mh ma ON ma.doc_id = c.da
      |          JOIN mh mb ON mb.doc_id = c.db
      |          WHERE ($agreeSql) >= $minAgree),
      |n AS (SELECT doc_id, count(*) AS n FROM big GROUP BY 1),
      |inter AS (SELECT c.da, c.db, count(*) AS i
      |          FROM candf c JOIN big x ON x.doc_id = c.da
      |                       JOIN big y ON y.doc_id = c.db AND y.bg = x.bg
      |          GROUP BY 1, 2),
      |near AS (SELECT inter.da AS doc_id, min(inter.db) AS near_match
      |         FROM inter JOIN n na ON na.doc_id = inter.da
      |                    JOIN n nb ON nb.doc_id = inter.db
      |         WHERE i * 1.0 / (na.n + nb.n - i) >= 0.5 GROUP BY 1),
      |ex AS (SELECT doc_id, md5(text) AS h FROM documents),
      |exm AS (SELECT e.doc_id, min(x.doc_id) AS exact_match
      |        FROM ex e JOIN ex x ON x.h = e.h AND x.doc_id % 5 <> 0
      |        WHERE e.doc_id % 5 = 0 GROUP BY 1)
      |SELECT d.doc_id,
      |  CASE WHEN exm.exact_match IS NOT NULL THEN 'exact'
      |       WHEN near.near_match IS NOT NULL THEN 'near'
      |       ELSE 'unique' END AS verdict,
      |  coalesce(exm.exact_match, near.near_match) AS match_id
      |FROM documents d LEFT JOIN exm USING (doc_id) LEFT JOIN near USING (doc_id)
      |WHERE d.doc_id % 5 = 0""".stripMargin

  /** q107 — corpus vocabulary ([[TextAnalysis.vocabulary]]): top-100
    * whitespace tokens by occurrence count with document frequency —
    * the tokenizer-training / vocab-pruning starting table.
    * Deterministic (count DESC, token ASC) rank. */
  private def q107(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(t(s, dir, "documents"), "doc_id", "text")

  private val q107Sql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
      |tf AS (SELECT tok, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
      |       FROM toks WHERE tok <> '' GROUP BY 1)
      |SELECT tok, n_occ, n_docs,
      |       CAST(row_number() OVER (ORDER BY n_occ DESC, tok) AS BIGINT) AS rank
      |FROM tf ORDER BY n_occ DESC, tok LIMIT 100""".stripMargin

  // ------------------------------------------------------------ BPE
  // q118-q120 — the learned-subword tokenizer chain
  // ([[graft.pipeline.Bpe]]): merge-rule training, corpus
  // segmentation, and the pack chain on REAL subword ids. The oracles
  // UNROLL the training loop — each iteration is the same relational
  // steps (pair-count groupBy, argmax, gaps-and-islands merge pass)
  // the Scala runs, so the whole learn→apply→pack story hash-checks.

  private val bpeN = 8

  /** The trained merge table is a per-(session, dir) corpus artifact —
    * the same memo contract as the incremental-dedup index, so
    * q118/q119/q120 (and repeated bench runs) pay the 8-iteration
    * training loop ONCE. The memo stores the collected 8-row table
    * (config-sized), re-framed locally per use. */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Long, String, String, String, Long)]]
  private def bpeMergeRows(s: SparkSession, dir: String): Seq[(Long, String, String, String, Long)] =
    bpeMemo.getOrElseUpdate((s, dir), {
      bpeMemo.keys.filter(_._1 eq s).filter(_._2 != dir).foreach(bpeMemo.remove)
      graft.pipeline.Bpe.bpeTrain(t(s, dir, "documents"), "doc_id", "text", bpeN)
        .orderBy(col("rank")).collect()
        .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left_sym"),
                   r.getAs[String]("right_sym"), r.getAs[String]("merged"),
                   r.getAs[Long]("cnt"))).toSeq
    })
  private def bpeRules(s: SparkSession, dir: String): Seq[(String, String)] =
    bpeMergeRows(s, dir).map(r => (r._2, r._3))

  /** The batched/byte-level trainers' merge tables under the SAME
    * per-(session, dir) memo contract as [[bpeMergeRows]]: the trained
    * table is a config-sized corpus artifact (nPasses × batchSize rows
    * max), so q136/q137 (and repeated bench reps) pay the multi-pass
    * training once and re-frame the collected rows per use. */
  private val bpeVariantMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), Seq[(Long, String, String, String, Long)]]
  private def trainedMergeRows(s: SparkSession, dir: String, variant: String)
                              (build: => DataFrame): Seq[(Long, String, String, String, Long)] =
    bpeVariantMemo.getOrElseUpdate((s, dir, variant), {
      bpeVariantMemo.keys.filter(k => (k._1 eq s) && k._2 != dir)
        .foreach(bpeVariantMemo.remove)
      build.orderBy(col("rank")).collect()
        .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left_sym"),
                   r.getAs[String]("right_sym"), r.getAs[String]("merged"),
                   r.getAs[Long]("cnt"))).toSeq
    })
  private def memoTrainedMerges(s: SparkSession, dir: String, variant: String)
                               (build: => DataFrame): DataFrame = {
    val rows = trainedMergeRows(s, dir, variant)(build)
    import s.implicits._
    rows.toDF("rank", "left_sym", "right_sym", "merged", "cnt")
  }

  /** q137's trained byte rules as the (left, right) list the native
    * byte apply embeds — same memo, so segment and train agree. */
  private def byteRules(s: SparkSession, dir: String): Seq[(String, String)] =
    trainedMergeRows(s, dir, "bytes")(
      graft.pipeline.Bpe.bpeTrainBytes(t(s, dir, "documents"), "doc_id", "text",
                                       nPasses = bpeBatchPasses,
                                       batchSize = bpeBatchSize))
      .map(r => (r._2, r._3))

  /** Unrolled training CTEs: bw (word freqs), s0 (code-point symbols),
    * then per iteration k: d{k} (lead pairs), m{k} (argmax), c{k}
    * (candidate positions), sel{k} (greedy left-to-right islands),
    * s{k} (merged + renumbered). Mirrors [[graft.pipeline.Bpe]]'s
    * mergePass exactly. */
  private def bpeTrainCtes(n: Int): String = {
    val head =
      s"""bw AS MATERIALIZED (SELECT w, count(*) AS freq FROM (
        |    SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents) x
        |  WHERE w <> '' GROUP BY 1),
        |s0 AS MATERIALIZED (SELECT w, freq, u.i - 1 AS pos,
        |         list_extract(regexp_extract_all(w, '.'), u.i) AS sym
        |       FROM bw, LATERAL unnest(
        |         generate_series(1, len(regexp_extract_all(w, '.')))) AS u(i))""".stripMargin
    val iters = (1 to n).map { k =>
      s"""d$k AS MATERIALIZED (SELECT w, freq, pos, sym,
        |           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
        |         FROM s${k - 1}),
        |m$k AS MATERIALIZED (SELECT sym AS l, nxt AS r, CAST(sum(freq) AS BIGINT) AS cnt
        |         FROM d$k WHERE nxt IS NOT NULL
        |         GROUP BY 1, 2 ORDER BY cnt DESC, l, r LIMIT 1),
        |c$k AS MATERIALIZED (SELECT d.w, d.pos FROM d$k d, m$k m
        |         WHERE d.sym = m.l AND d.nxt = m.r),
        |sel$k AS MATERIALIZED (SELECT w, pos FROM (
        |    SELECT w, pos, min(pos) OVER (PARTITION BY w, grp) AS rs
        |    FROM (SELECT w, pos,
        |            pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
        |          FROM c$k) g) h
        |  WHERE (pos - rs) % 2 = 0),
        |s$k AS MATERIALIZED (SELECT w, freq,
        |           row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos, sym
        |         FROM (
        |           SELECT d.w, d.freq, d.pos,
        |                  CASE WHEN sel.pos IS NOT NULL THEN m.l || m.r
        |                       ELSE d.sym END AS sym
        |           FROM d$k d CROSS JOIN m$k m
        |           LEFT JOIN sel$k sel ON sel.w = d.w AND sel.pos = d.pos
        |           LEFT JOIN sel$k ab ON ab.w = d.w AND ab.pos + 1 = d.pos
        |           WHERE ab.pos IS NULL) z)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  /** Per-document subword stream CTEs on top of the trained state:
    * occ (word occurrences in order), flat (joined to the trained
    * segmentation — training state IS the segmentation), enc (globally
    * renumbered per-doc subword positions). */
  private def bpeStreamCtes(n: Int): String =
    s"""occ AS MATERIALIZED (SELECT doc_id, u.i AS wpos, l[u.i] AS w
      |        FROM (SELECT doc_id, string_split(trim(text), ' ') AS l
      |              FROM documents) t,
      |        LATERAL unnest(generate_series(1, len(l))) AS u(i)
      |        WHERE l[u.i] <> ''),
      |flat AS MATERIALIZED (SELECT o.doc_id, o.wpos, s.pos AS spos, s.sym
      |         FROM occ o JOIN s$n s ON s.w = o.w),
      |enc AS MATERIALIZED (SELECT doc_id, wpos, spos, sym,
      |          CAST(row_number() OVER (PARTITION BY doc_id
      |                                  ORDER BY wpos, spos) AS BIGINT) - 1 AS pos
      |        FROM flat)""".stripMargin

  /** q118 — BPE merge-rule training ([[graft.pipeline.Bpe.bpeTrain]]):
    * 8 merges learned over the corpus's distinct-word frequency table,
    * deterministic argmax (count DESC, left ASC, right ASC). The
    * oracle unrolls all 8 iterations of the exact relational loop. */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeMergeRows(s, dir).toDF("rank", "left_sym", "right_sym", "merged", "cnt")
  }

  private val q118Sql = {
    val rows = (1 to bpeN).map(k =>
      s"SELECT CAST($k AS BIGINT) AS rank, l AS left_sym, r AS right_sym, " +
      s"l || r AS merged, cnt FROM m$k")
    s"WITH ${bpeTrainCtes(bpeN)}\n${rows.mkString("\nUNION ALL ")}"
  }

  /** q119 — BPE corpus segmentation ([[graft.pipeline.Bpe
    * .bpeSegmentRows]]): every document as its subword stream (doc_id,
    * pos, sym) under the q118 rules, segmented by the NATIVE
    * `bpe_encode` expression. The oracle joins word occurrences to the
    * unrolled training state (training state = segmentation — the
    * identity that pins the native lowest-rank-repeat apply to the
    * relational rank-order train). */
  private def q119(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Bpe.bpeSegmentRows(t(s, dir, "documents"), "doc_id", "text",
                                      bpeRules(s, dir))

  private val q119Sql =
    s"""WITH ${bpeTrainCtes(bpeN)},
      |${bpeStreamCtes(bpeN)}
      |SELECT doc_id, pos, sym FROM enc""".stripMargin

  /** q120 — the pack chain on SUBWORD ids ([[graft.pipeline.Bpe
    * .materializePacksBpe]]): q119's segmentation → frequency-ranked
    * subword ids (top-30 vocab, OOV → 0) → packs bucketed by SUBWORD
    * count → flattened training rows with per-bucket truncation. One
    * statement replays tokenize→encode→pack→flatten end to end. */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val rules = bpeRules(s, dir)
    graft.pipeline.Bpe.materializePacksBpe(docs, "doc_id", "text", rules,
      graft.pipeline.Bpe.bpeVocabulary(docs, "doc_id", "text", rules, topK = 30))
  }

  private val q120Sql =
    s"""WITH ${bpeTrainCtes(bpeN)},
      |${bpeStreamCtes(bpeN)},
      |svoc AS (SELECT sym, count(*) AS n_occ FROM enc GROUP BY 1),
      |vrank AS (SELECT sym,
      |            CAST(row_number() OVER (ORDER BY n_occ DESC, sym) AS BIGINT) AS rank
      |          FROM svoc ORDER BY n_occ DESC, sym LIMIT 30),
      |ids AS (SELECT e.doc_id, e.pos, COALESCE(v.rank, 0) AS tid
      |        FROM enc e LEFT JOIN vrank v USING (sym)),
      |nt AS (SELECT doc_id, count(*) AS n_tokens FROM enc GROUP BY 1),
      |b AS (SELECT doc_id, n_tokens,
      |    CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
      |         WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
      |         WHEN n_tokens <= 256 THEN 256 ELSE 512 END AS bucket
      |  FROM nt),
      |sh AS (SELECT doc_id,
      |    ${hashPointSql("CAST(doc_id AS VARCHAR)", "pack", 32L)} AS shard
      |  FROM b),
      |wn AS (SELECT b.doc_id, bucket, shard,
      |    row_number() OVER (PARTITION BY bucket, shard ORDER BY b.doc_id) AS rn
      |  FROM b JOIN sh ON sh.doc_id = b.doc_id),
      |pk AS (SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
      |    CAST(bucket AS BIGINT) * 1000000000 + CAST(shard AS BIGINT) * 1000000
      |         + CAST((rn - 1) // (2048 // bucket) AS BIGINT) AS pack_id,
      |    CAST((rn - 1) % (2048 // bucket) AS BIGINT) AS slot
      |  FROM wn)
      |SELECT pk.pack_id, pk.slot * pk.bucket + i.pos AS pos, i.tid, i.doc_id
      |FROM ids i JOIN pk USING (doc_id)
      |WHERE i.pos < pk.bucket""".stripMargin

  /** q145 — tokenizer ROUND-TRIP ([[graft.pipeline.Bpe.bpeDecode]]):
    * segment → encode to subword ids (top-30 vocab, OOV → 0) → DECODE
    * back (id→symbol map literal, OOV → '<unk>') and compare with the
    * original text modulo the whitespace the word tokenizer consumed.
    * Per document: token/OOV counts, the `ok` lossless-round-trip
    * verdict (1 exactly when no OOV corrupted the stream — both
    * branches live at this vocab size), and the md5 of the decoded
    * string (pins the decoded BYTES, not just the verdict). The oracle
    * replays train → segment → rank → encode → decode → compare in one
    * statement. */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val rules = bpeRules(s, dir)
    val vocab = graft.pipeline.Bpe.bpeVocabulary(docs, "doc_id", "text", rules,
                                                 topK = 30)
    val enc = cacheOnce(
      graft.pipeline.Bpe.bpeEncodeIds(docs, "doc_id", "text", rules, vocab))
    val vp = vocab.select(col("rank"), col("sym")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    graft.pipeline.Bpe.bpeDecode(enc, "doc_id", "ids", vp)
      .join(enc.select(col("doc_id"), col("n_tokens"), col("n_oov")), Seq("doc_id"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
              (col("text_rt") === translate(col("text"), " ", ""))
                .cast("long").as("ok"),
              md5(col("text_rt")).as("rt_md5"))
  }

  private val q145Sql =
    s"""WITH ${bpeTrainCtes(bpeN)},
      |${bpeStreamCtes(bpeN)},
      |svoc AS (SELECT sym, count(*) AS n_occ FROM enc GROUP BY 1),
      |vrank AS (SELECT sym,
      |            CAST(row_number() OVER (ORDER BY n_occ DESC, sym) AS BIGINT) AS rank
      |          FROM svoc ORDER BY n_occ DESC, sym LIMIT 30),
      |ids AS (SELECT e.doc_id, e.pos, COALESCE(v.rank, 0) AS tid
      |        FROM enc e LEFT JOIN vrank v USING (sym)),
      |dec AS (SELECT i.doc_id,
      |          string_agg(CASE WHEN i.tid = 0 THEN '<unk>' ELSE vr.sym END,
      |                     '' ORDER BY i.pos) AS text_rt
      |        FROM ids i LEFT JOIN vrank vr ON vr.rank = i.tid GROUP BY 1),
      |nt AS (SELECT doc_id, count(*) AS n_tokens,
      |         CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |       FROM ids GROUP BY 1)
      |SELECT d.doc_id, nt.n_tokens, nt.n_oov,
      |       CAST(CASE WHEN dec.text_rt = replace(d.text, ' ', '')
      |            THEN 1 ELSE 0 END AS BIGINT) AS ok,
      |       md5(dec.text_rt) AS rt_md5
      |FROM dec JOIN nt USING (doc_id) JOIN documents d USING (doc_id)""".stripMargin

  // ---------------------------------------------------- batched BPE

  /** Unrolled CTEs for the BATCHED trainer ([[graft.pipeline.Bpe
    * .bpeTrainBatched]]): per pass k the same relational steps the
    * Scala runs — pair counts bp{k} (≥ minPairFreq), locally-maximal
    * selection bsel{k} (per-symbol window rank, a pair survives iff it
    * ranks first in EVERY symbol group it belongs to, capped at
    * batchSize by (cnt DESC, l, r)), simultaneous candidate positions
    * bc{k} over the WHOLE batch, gaps-and-islands greedy bisl{k}, and
    * the merged+renumbered table bs{k} (merged symbol = sym || nxt —
    * no per-rule literal needed). `head` supplies bs0 (code-point or
    * hex-byte symbols). */
  private def bpeBatchCtes(head: String, nPasses: Int, batchSize: Int,
                           minPairFreq: Long): String = {
    val iters = (1 to nPasses).map { k =>
      s"""bd$k AS MATERIALIZED (SELECT w, freq, pos, sym,
        |           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
        |         FROM bs${k - 1}),
        |bp$k AS MATERIALIZED (SELECT sym AS l, nxt AS r, CAST(sum(freq) AS BIGINT) AS cnt
        |         FROM bd$k WHERE nxt IS NOT NULL
        |         GROUP BY 1, 2 HAVING sum(freq) >= $minPairFreq),
        |bsel$k AS MATERIALIZED (SELECT l, r, cnt,
        |           CAST(row_number() OVER (ORDER BY cnt DESC, l, r) AS BIGINT) AS brank
        |         FROM (SELECT l, r, cnt FROM (
        |                 SELECT l, r, cnt,
        |                        row_number() OVER (PARTITION BY s ORDER BY cnt DESC, l, r) AS rk
        |                 FROM (SELECT l, r, cnt, u.s
        |                       FROM bp$k, LATERAL unnest(list_distinct([l, r])) AS u(s)) e) g
        |               GROUP BY l, r, cnt HAVING max(rk) = 1) x
        |         ORDER BY cnt DESC, l, r LIMIT $batchSize),
        |bc$k AS MATERIALIZED (SELECT d.w, d.pos FROM bd$k d JOIN bsel$k m
        |           ON d.sym = m.l AND d.nxt = m.r),
        |bisl$k AS MATERIALIZED (SELECT w, pos FROM (
        |    SELECT w, pos, min(pos) OVER (PARTITION BY w, grp) AS rs
        |    FROM (SELECT w, pos,
        |            pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
        |          FROM bc$k) g) h
        |  WHERE (pos - rs) % 2 = 0),
        |bs$k AS MATERIALIZED (SELECT w, freq,
        |           row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos, sym
        |         FROM (
        |           SELECT d.w, d.freq, d.pos,
        |                  CASE WHEN sel.pos IS NOT NULL THEN d.sym || d.nxt
        |                       ELSE d.sym END AS sym
        |           FROM bd$k d
        |           LEFT JOIN bisl$k sel ON sel.w = d.w AND sel.pos = d.pos
        |           LEFT JOIN bisl$k ab ON ab.w = d.w AND ab.pos + 1 = d.pos
        |           WHERE ab.pos IS NULL) z)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  private def bpeBatchFinal(nPasses: Int): String = {
    val union = (1 to nPasses)
      .map(k => s"SELECT $k AS pass, l, r, cnt, brank FROM bsel$k")
      .mkString("\nUNION ALL ")
    s"""SELECT CAST(row_number() OVER (ORDER BY pass, brank) AS BIGINT) AS rank,
      |       l AS left_sym, r AS right_sym, l || r AS merged, cnt
      |FROM ($union)""".stripMargin
  }

  private val bpeBatchPasses = 4
  private val bpeBatchSize = 4

  /** q136 — BATCHED BPE training ([[graft.pipeline.Bpe
    * .bpeTrainBatched]], the r11 verdict's production-scale fix): each
    * pass learns up to `batchSize` PAIRWISE-SYMBOL-DISJOINT rules (the
    * locally-maximal selection — a pair survives iff it beats every
    * pair sharing a symbol under (cnt DESC, l, r)) and merges them in
    * ONE simultaneous relational pass, so a 32k-merge vocabulary costs
    * vocab/batchSize Spark jobs instead of vocab. The oracle unrolls
    * all passes, selection rule included. */
  private def q136(s: SparkSession, dir: String): DataFrame =
    memoTrainedMerges(s, dir, "batched")(
      graft.pipeline.Bpe.bpeTrainBatched(t(s, dir, "documents"), "doc_id", "text",
                                         nPasses = bpeBatchPasses,
                                         batchSize = bpeBatchSize))

  private val q136Sql = {
    val head =
      """bbw AS MATERIALIZED (SELECT w, count(*) AS freq FROM (
        |    SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents) x
        |  WHERE w <> '' GROUP BY 1),
        |bs0 AS MATERIALIZED (SELECT w, freq, u.i - 1 AS pos,
        |         list_extract(regexp_extract_all(w, '.'), u.i) AS sym
        |       FROM bbw, LATERAL unnest(
        |         generate_series(1, len(regexp_extract_all(w, '.')))) AS u(i))""".stripMargin
    s"WITH ${bpeBatchCtes(head, bpeBatchPasses, bpeBatchSize, 2L)}\n${bpeBatchFinal(bpeBatchPasses)}"
  }

  /** q137 — BYTE-LEVEL batched BPE training ([[graft.pipeline.Bpe
    * .bpeTrainBytes]]): GPT-2-style pretokenizer (letter/digit/punct
    * runs with optional leading space — identical leftmost-first
    * semantics in Java regex and RE2), symbols = UPPERCASE HEX of
    * UTF-8 bytes (`upper(hex(encode(w)))` on both engines), so the
    * vocabulary is closed over arbitrary bytes and multibyte unicode
    * decomposes into byte symbols instead of UNK. Same batched
    * machinery and oracle unroll as q136, byte head. */
  private def q137(s: SparkSession, dir: String): DataFrame =
    memoTrainedMerges(s, dir, "bytes")(
      graft.pipeline.Bpe.bpeTrainBytes(t(s, dir, "documents"), "doc_id", "text",
                                       nPasses = bpeBatchPasses,
                                       batchSize = bpeBatchSize))

  private val q137Sql = {
    val head =
      s"""bbw AS MATERIALIZED (SELECT upper(hex(encode(wtxt))) AS w, count(*) AS freq
        |  FROM (SELECT unnest(regexp_extract_all(text,
        |          '${graft.pipeline.Bpe.pretokenRegex}')) AS wtxt
        |        FROM documents) x
        |  WHERE wtxt <> '' GROUP BY 1),
        |bs0 AS MATERIALIZED (SELECT w, freq, u.i - 1 AS pos,
        |         substr(w, 2 * u.i - 1, 2) AS sym
        |       FROM bbw, LATERAL unnest(generate_series(1, len(w) // 2)) AS u(i))""".stripMargin
    s"WITH ${bpeBatchCtes(head, bpeBatchPasses, bpeBatchSize, 2L)}\n${bpeBatchFinal(bpeBatchPasses)}"
  }

  /** q150 — BYTE-LEVEL corpus segmentation (the APPLY side of q137's
    * trained rules — [[graft.pipeline.Bpe.bpeSegmentRowsBytes]], the
    * native `bpe_encode_bytes` expression): every document as its
    * hex-byte subword stream in document order; spaces ride inside
    * pretokens, so the stream is byte-lossless. The oracle joins
    * doc-order pretoken occurrences to the UNROLLED byte-training
    * state — the q119 training-state≡segmentation identity on the
    * byte universe, which also pins the native lowest-rank apply to
    * the batched relational train. */
  private def q150(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Bpe.bpeSegmentRowsBytes(t(s, dir, "documents"), "doc_id",
                                           "text", byteRules(s, dir))

  private val q150Sql = {
    val head =
      s"""bbw AS MATERIALIZED (SELECT upper(hex(encode(wtxt))) AS w, count(*) AS freq
        |  FROM (SELECT unnest(regexp_extract_all(text,
        |          '${graft.pipeline.Bpe.pretokenRegex}')) AS wtxt
        |        FROM documents) x
        |  WHERE wtxt <> '' GROUP BY 1),
        |bs0 AS MATERIALIZED (SELECT w, freq, u.i - 1 AS pos,
        |         substr(w, 2 * u.i - 1, 2) AS sym
        |       FROM bbw, LATERAL unnest(generate_series(1, len(w) // 2)) AS u(i))""".stripMargin
    s"""WITH ${bpeBatchCtes(head, bpeBatchPasses, bpeBatchSize, 2L)},
      |bocc AS MATERIALIZED (
      |  SELECT doc_id, u.i AS wpos, upper(hex(encode(l[u.i]))) AS w
      |  FROM (SELECT doc_id, regexp_extract_all(text,
      |          '${graft.pipeline.Bpe.pretokenRegex}') AS l FROM documents) t,
      |  LATERAL unnest(generate_series(1, len(l))) AS u(i)
      |  WHERE l[u.i] <> ''),
      |bflat AS MATERIALIZED (SELECT o.doc_id, o.wpos, s.pos AS spos, s.sym
      |         FROM bocc o JOIN bs$bpeBatchPasses s ON s.w = o.w)
      |SELECT doc_id,
      |       CAST(row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY wpos, spos) AS BIGINT) - 1 AS pos,
      |       sym
      |FROM bflat""".stripMargin
  }

  /** q153 — TOKENIZER FERTILITY ([[graft.pipeline.Bpe
    * .tokenizerFertility]]): the metric tokenizers are chosen by —
    * per document the whitespace / learned-subword / byte-subword
    * stream sizes against byte length, plus subwords-per-word and
    * bytes-per-byte-symbol (micro-scaled; null for token-less docs).
    * ONE statement replays BOTH trainers (the q118 code-point unroll
    * and the q137 batched byte unroll — their CTE namespaces are
    * disjoint) and derives every count and ratio. */
  private def q153(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Bpe.tokenizerFertility(t(s, dir, "documents"), "doc_id",
                                          "text", bpeRules(s, dir),
                                          byteRules(s, dir))

  private val q153Sql = {
    val head =
      s"""bbw AS MATERIALIZED (SELECT upper(hex(encode(wtxt))) AS w, count(*) AS freq
        |  FROM (SELECT unnest(regexp_extract_all(text,
        |          '${graft.pipeline.Bpe.pretokenRegex}')) AS wtxt
        |        FROM documents) x
        |  WHERE wtxt <> '' GROUP BY 1),
        |bs0 AS MATERIALIZED (SELECT w, freq, u.i - 1 AS pos,
        |         substr(w, 2 * u.i - 1, 2) AS sym
        |       FROM bbw, LATERAL unnest(generate_series(1, len(w) // 2)) AS u(i))""".stripMargin
    s"""WITH ${bpeTrainCtes(bpeN)},
      |${bpeStreamCtes(bpeN)},
      |${bpeBatchCtes(head, bpeBatchPasses, bpeBatchSize, 2L)},
      |bocc AS MATERIALIZED (
      |  SELECT doc_id, u.i AS wpos, upper(hex(encode(l[u.i]))) AS w
      |  FROM (SELECT doc_id, regexp_extract_all(text,
      |          '${graft.pipeline.Bpe.pretokenRegex}') AS l FROM documents) t,
      |  LATERAL unnest(generate_series(1, len(l))) AS u(i)
      |  WHERE l[u.i] <> ''),
      |bflat AS MATERIALIZED (SELECT o.doc_id, o.wpos, s.pos AS spos, s.sym
      |         FROM bocc o JOIN bs$bpeBatchPasses s ON s.w = o.w),
      |fws AS (SELECT doc_id, count(*) AS n_ws FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> '' GROUP BY 1),
      |fbpe AS (SELECT doc_id, count(*) AS n_bpe FROM enc GROUP BY 1),
      |fbyte AS (SELECT doc_id, count(*) AS n_byte_syms FROM bflat GROUP BY 1)
      |SELECT d.doc_id,
      |       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
      |       CAST(coalesce(fws.n_ws, 0) AS BIGINT) AS n_ws,
      |       CAST(coalesce(fbpe.n_bpe, 0) AS BIGINT) AS n_bpe,
      |       CAST(coalesce(fbyte.n_byte_syms, 0) AS BIGINT) AS n_byte_syms,
      |       CASE WHEN coalesce(fws.n_ws, 0) > 0
      |            THEN CAST(round(coalesce(fbpe.n_bpe, 0) * 1000000.0 / fws.n_ws) AS BIGINT)
      |            END AS bpe_per_word_e6,
      |       CASE WHEN coalesce(fbyte.n_byte_syms, 0) > 0
      |            THEN CAST(round(octet_length(encode(d.text)) * 1000000.0
      |                            / fbyte.n_byte_syms) AS BIGINT)
      |            END AS bytes_per_sym_e6
      |FROM documents d
      |LEFT JOIN fws USING (doc_id) LEFT JOIN fbpe USING (doc_id)
      |LEFT JOIN fbyte USING (doc_id)""".stripMargin
  }

  /** q151 — BYTE-LOSSLESS tokenizer round-trip: the full byte chain
    * segment → rank → encode → DECODE, with `ok` comparing the decoded
    * hex stream against the document's OWN hex — EXACT equality, text
    * and whitespace included (q145's round-trip is modulo tokenizer
    * whitespace; the byte chain has no such loss — THE property
    * byte-level tokenizers exist for). OOV ids decode to 'EFBFBD'
    * (U+FFFD replacement char), corrupting exactly the OOV documents.
    * One statement replays train → segment → rank → encode → decode →
    * byte-compare. The vocab size sits inside the corpus's measured
    * coverage range (36/39 post-merge symbols at sf0.001/sf0.01; 35
    * leaves 85/21 documents fully covered and the rest OOV-corrupted —
    * both branches live at BOTH driver scales). */
  private val byteVocabK = 35

  private def q151(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val rules = byteRules(s, dir)
    val vocab = graft.pipeline.Bpe.bpeVocabularyBytes(docs, "doc_id", "text",
                                                      rules, topK = byteVocabK)
    val enc = cacheOnce(
      graft.pipeline.Bpe.bpeEncodeIdsBytes(docs, "doc_id", "text", rules, vocab))
    val vp = vocab.select(col("rank"), col("sym")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    graft.pipeline.Bpe.bpeDecode(enc, "doc_id", "ids", vp, oovSym = "EFBFBD")
      .join(enc.select(col("doc_id"), col("n_tokens"), col("n_oov")), Seq("doc_id"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
              (col("text_rt") === hex(encode(col("text"), "UTF-8")))
                .cast("long").as("ok"),
              md5(col("text_rt")).as("rt_md5"))
  }

  private val q151Sql = {
    val head =
      s"""bbw AS MATERIALIZED (SELECT upper(hex(encode(wtxt))) AS w, count(*) AS freq
        |  FROM (SELECT unnest(regexp_extract_all(text,
        |          '${graft.pipeline.Bpe.pretokenRegex}')) AS wtxt
        |        FROM documents) x
        |  WHERE wtxt <> '' GROUP BY 1),
        |bs0 AS MATERIALIZED (SELECT w, freq, u.i - 1 AS pos,
        |         substr(w, 2 * u.i - 1, 2) AS sym
        |       FROM bbw, LATERAL unnest(generate_series(1, len(w) // 2)) AS u(i))""".stripMargin
    s"""WITH ${bpeBatchCtes(head, bpeBatchPasses, bpeBatchSize, 2L)},
      |bocc AS MATERIALIZED (
      |  SELECT doc_id, u.i AS wpos, upper(hex(encode(l[u.i]))) AS w
      |  FROM (SELECT doc_id, regexp_extract_all(text,
      |          '${graft.pipeline.Bpe.pretokenRegex}') AS l FROM documents) t,
      |  LATERAL unnest(generate_series(1, len(l))) AS u(i)
      |  WHERE l[u.i] <> ''),
      |bflat AS MATERIALIZED (SELECT o.doc_id, o.wpos, s.pos AS spos, s.sym
      |         FROM bocc o JOIN bs$bpeBatchPasses s ON s.w = o.w),
      |benc AS MATERIALIZED (SELECT doc_id,
      |         CAST(row_number() OVER (PARTITION BY doc_id
      |                                 ORDER BY wpos, spos) AS BIGINT) - 1 AS pos,
      |         sym
      |       FROM bflat),
      |bsvoc AS (SELECT sym, count(*) AS n_occ FROM benc GROUP BY 1),
      |bvrank AS (SELECT sym,
      |             CAST(row_number() OVER (ORDER BY n_occ DESC, sym) AS BIGINT) AS rank
      |           FROM bsvoc ORDER BY n_occ DESC, sym LIMIT $byteVocabK),
      |bids AS (SELECT b.doc_id, b.pos, COALESCE(v.rank, 0) AS tid
      |         FROM benc b LEFT JOIN bvrank v USING (sym)),
      |bdec AS (SELECT i.doc_id,
      |           string_agg(CASE WHEN i.tid = 0 THEN 'EFBFBD' ELSE vr.sym END,
      |                      '' ORDER BY i.pos) AS hexcat
      |         FROM bids i LEFT JOIN bvrank vr ON vr.rank = i.tid GROUP BY 1),
      |bnt AS (SELECT doc_id, count(*) AS n_tokens,
      |          CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |        FROM bids GROUP BY 1)
      |SELECT d.doc_id, bnt.n_tokens, bnt.n_oov,
      |       CAST(CASE WHEN bdec.hexcat = upper(hex(encode(d.text)))
      |            THEN 1 ELSE 0 END AS BIGINT) AS ok,
      |       md5(bdec.hexcat) AS rt_md5
      |FROM bdec JOIN bnt USING (doc_id) JOIN documents d USING (doc_id)""".stripMargin
  }

  // q124 — the distilled classifier ([[graft.pipeline.Classifier]]):
  // hashed-bag-of-words logistic regression trained by full-batch GD
  // on the integer micro-grid. The oracle UNROLLS the gradient-descent
  // loop (the q118 technique applied to training): per iteration one
  // margin join, one sigmoid/residual rounding, one bucket-gradient
  // groupBy, one weight update — identical integers both engines.

  private val clfDim = 64
  private val clfIters = 16

  /** Trained weights are a per-(session, dir) corpus artifact — the
    * bpeMemo contract, so q124 and repeated bench passes pay the
    * 16-iteration training loop once. Stores the (dim+1)-entry model
    * (hyperparameter-sized, never corpus-sized). */
  private val clfMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.pipeline.Classifier.HashedLogistic]
  private def clfModel(s: SparkSession, dir: String): graft.pipeline.Classifier.HashedLogistic =
    clfMemo.getOrElseUpdate((s, dir), {
      clfMemo.keys.filter(_._1 eq s).filter(_._2 != dir).foreach(clfMemo.remove)
      graft.pipeline.Classifier.trainHashedLogistic(
        t(s, dir, "documents"), "doc_id", "text",
        (col("n_chars") >= 300).cast("long"), clfDim, clfIters)
    })

  /** One margin CTE: previous iteration's weights applied to every
    * document (feature-less docs keep the bare bias via the left
    * join + COALESCE — exactly the Spark plan's shape). */
  private def clfMarginCte(t: Int, prev: Int): String =
    s"""m$t AS (SELECT clab.doc_id, clab.y,
      |    CAST(round(COALESCE(fw.s, 0) / 1000000.0) AS BIGINT) + b$prev.b_e6 AS m_e6
      |  FROM clab CROSS JOIN b$prev
      |  LEFT JOIN (SELECT cfeat.doc_id, sum(w.w_e6 * cfeat.f) AS s
      |             FROM cfeat JOIN w$prev w USING (h) GROUP BY 1) fw
      |  USING (doc_id))""".stripMargin

  /** Unrolled GD: per iteration t — margin m{t}, rounded residual
    * r{t}, bucket/bias gradients g{t}/gb{t}, updated weights w{t}/
    * b{t}. Iteration 1 starts from the all-zero model (margin ≡ 0). */
  private def clfCtes(iters: Int): String = {
    val head =
      s"""ctoks AS (SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
        |  WHERE t <> ''),
        |ccnt AS (SELECT doc_id, count(*) AS n FROM ctoks GROUP BY 1),
        |craw AS (SELECT doc_id, ${hashPointSql("t", "clf", clfDim.toLong)} AS h,
        |                count(*) AS c FROM ctoks GROUP BY 1, 2),
        |cfeat AS MATERIALIZED (
        |  SELECT craw.doc_id, h, CAST(round(c * 1000000.0 / n) AS BIGINT) AS f
        |  FROM craw JOIN ccnt USING (doc_id)
        |  UNION ALL
        |  SELECT doc_id, CAST($clfDim AS BIGINT) AS h,
        |         CAST(round(least(n, 256) * 1000000.0 / 256) AS BIGINT) AS f
        |  FROM ccnt),
        |clab AS MATERIALIZED (SELECT doc_id, CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y FROM documents),
        |cn AS MATERIALIZED (SELECT count(*) AS n FROM clab)""".stripMargin
    val blocks = (1 to iters).map { i =>
      val m =
        if (i == 1) "m1 AS (SELECT doc_id, y, CAST(0 AS BIGINT) AS m_e6 FROM clab)"
        else clfMarginCte(i, i - 1)
      val w =
        if (i == 1)
          "SELECT h, CAST(0 AS BIGINT) - CAST(round(4.0 * g / (n * 1000000.0)) AS BIGINT) AS w_e6 FROM g1 CROSS JOIN cn"
        else
          s"SELECT g.h, w.w_e6 - CAST(round(4.0 * g.g / (cn.n * 1000000.0)) AS BIGINT) AS w_e6 " +
            s"FROM g$i g JOIN w${i - 1} w USING (h) CROSS JOIN cn"
      val b =
        if (i == 1)
          "SELECT CAST(0 AS BIGINT) - CAST(round(4.0 * g / n) AS BIGINT) AS b_e6 FROM gb1 CROSS JOIN cn"
        else
          s"SELECT b.b_e6 - CAST(round(4.0 * gb.g / cn.n) AS BIGINT) AS b_e6 " +
            s"FROM gb$i gb CROSS JOIN b${i - 1} b CROSS JOIN cn"
      s"""$m,
        |r$i AS MATERIALIZED (SELECT doc_id, CAST(round((1.0/(1.0+exp(-(m_e6/1000000.0))) - y)*1000000.0) AS BIGINT) AS r_e6 FROM m$i),
        |g$i AS (SELECT h, sum(r_e6 * f) AS g FROM cfeat JOIN r$i USING (doc_id) GROUP BY 1),
        |gb$i AS (SELECT sum(r_e6) AS g FROM r$i),
        |w$i AS MATERIALIZED ($w),
        |b$i AS MATERIALIZED ($b)""".stripMargin
    }
    (head +: blocks).mkString(",\n")
  }

  /** q124 — distilled classifier scoring ([[graft.pipeline.Classifier
    * .distillClassifier]]): the corpus scored by the logistic model
    * distilled from its own length-quality gate (n_chars >= 300 — the
    * corpus median, a balanced LEARNABLE target: token-count features
    * linearly encode document length, so the model genuinely separates
    * rather than memorizing an arbitrary tag). Scoring rides the
    * zero-shuffle INLINE serving path (batch-path parity is spec-
    * pinned, so the oracle covers both). The oracle replays all
    * 16 GD iterations AND the final scoring pass — margins hash-exact
    * because training never leaves the integer micro-grid. */
  private def q124(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Classifier.scoreHashedLogisticInline(
      t(s, dir, "documents"), "doc_id", "text",
      (col("n_chars") >= 300).cast("long"), clfModel(s, dir))

  private val q124Sql = {
    val T = clfIters
    s"""WITH ${clfCtes(T)},
      |${clfMarginCte(T + 1, T)}
      |SELECT doc_id, CAST(y AS BIGINT) AS label, CAST(m_e6 AS BIGINT) AS margin_e6,
      |       round(1.0/(1.0+exp(-(m_e6/1000000.0))), 6) AS p,
      |       CAST(CASE WHEN m_e6 > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
      |FROM m${T + 1}""".stripMargin
  }

  /** q121 — duplicated-span removal ([[TextDedup.removeDuplicatedSpans]]):
    * Lee-et-al-style exact-substring dedup as a REWRITE — every doc
    * with its cross-document duplicated 8-gram spans cut out. The
    * oracle replays gram construction, the df>1 cut, position
    * coverage, and the ordered re-join; fully-duplicated docs clean to
    * '' (n_kept = 0) so both the removal and pass-through branches are
    * exercised (47 of 500 docs lose spans at sf0.01). */
  private def q121(s: SparkSession, dir: String): DataFrame =
    TextDedup.removeDuplicatedSpans(t(s, dir, "documents"), "doc_id", "text")

  private val q121Sql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
      |tok AS (
      |  SELECT doc_id, i AS pos, l[i] AS tok
      |  FROM toks, LATERAL unnest(range(1, len(l)+1)) AS t(i)),
      |g AS (
      |  SELECT doc_id, i AS start, array_to_string(l[i:i+7], '_') AS bg
      |  FROM toks, LATERAL unnest(range(1, len(l)-6)) AS t(i)
      |  WHERE len(l) >= 8),
      |dup AS (
      |  SELECT bg FROM (SELECT DISTINCT doc_id, bg FROM g) GROUP BY bg
      |  HAVING count(*) > 1),
      |cov AS (
      |  SELECT DISTINCT g.doc_id, p
      |  FROM g JOIN dup USING (bg), LATERAL unnest(range(g.start, g.start+8)) AS t(p))
      |SELECT tok.doc_id,
      |       coalesce(array_to_string(list(tok.tok ORDER BY tok.pos)
      |                FILTER (WHERE cov.p IS NULL), ' '), '') AS clean_text,
      |       CAST(count(*) FILTER (WHERE cov.p IS NULL) AS BIGINT) AS n_kept,
      |       CAST(count(*) FILTER (WHERE cov.p IS NOT NULL) AS BIGINT) AS n_removed
      |FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.p
      |GROUP BY 1""".stripMargin

  /** q122 — Kneser-Ney bigram perplexity ([[TextAnalysis
    * .knPerplexity]]): the CCNet quality filter one model order above
    * q112. D = 3/4 makes every probability the exact integer rational
    * ((4c−3)B + 3·N1f·N1b)/(4·c1·B), so the oracle feeds ONE `ln` the
    * same integers and the milli-nat rounding pins the hash. The
    * 3420 flag threshold sits between the corpus median (≈3386) and
    * max (≈3662) mean surprisal — both branches fire. */
  private def q122(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.knPerplexity(t(s, dir, "documents"), "doc_id", "text")

  /** Shared CTE chain replaying the Kneser-Ney bigram model through the
    * per-doc surprisal sums (the q122 body, factored so q163's
    * perplexity bucketing can compose on top). */
  private val knCtes =
    """toksk AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
      |bg AS (
      |  SELECT doc_id, l[i] AS w1, l[i+1] AS w2
      |  FROM toksk, LATERAL unnest(range(1, len(l))) AS t(i)
      |  WHERE len(l) >= 2),
      |c AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c) AS c1, count(*) AS n1f FROM c GROUP BY 1),
      |n1b AS (SELECT w2, count(*) AS n1b FROM c GROUP BY 1),
      |btot AS (SELECT count(*) AS b FROM c),
      |s AS (
      |  SELECT c.w1, c.w2,
      |         CAST(round(ln((4.0 * c1.c1 * btot.b) /
      |                       ((4 * c.c - 3) * btot.b + 3 * c1.n1f * n1b.n1b)) * 1000.0)
      |              AS BIGINT) AS s_e3
      |  FROM c JOIN c1 USING (w1) JOIN n1b USING (w2) CROSS JOIN btot),
      |per AS (
      |  SELECT bg.doc_id, count(*) AS n_bigrams, sum(s.s_e3) AS s_sum
      |  FROM bg JOIN s ON bg.w1 = s.w1 AND bg.w2 = s.w2 GROUP BY 1)""".stripMargin

  private val q122Sql =
    s"""WITH $knCtes
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |       CAST(s_sum AS BIGINT) AS kn_surprisal_e3,
      |       round(s_sum * 1.0 / n_bigrams, 6) AS avg_kn_e3,
      |       round(exp(round(s_sum * 1.0 / n_bigrams, 6) / 1000.0), 6) AS kn_perplexity,
      |       CAST(CASE WHEN round(s_sum * 1.0 / n_bigrams, 6) > 3420.0
      |            THEN 1 ELSE 0 END AS BIGINT) AS kn_flagged
      |FROM per""".stripMargin

  /** q163 — CCNet perplexity buckets
    * ([[TextAnalysis.perplexityBuckets]]): the published head/middle/
    * tail corpus split — per-language LM-score ranking (the repo's own
    * KN bigram model) cut into thirds by the explicit
    * ((rank−1)·3) div n formula. The distributed form ranks via the
    * score-grid decomposition (no language-sized window partition);
    * the oracle computes the equivalent single-window rank over the
    * full q122 replay, hash-checking the decomposition. */
  private def q163(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text",
                                   "lang")

  private val q163Sql =
    s"""WITH $knCtes,
      |pdl AS (SELECT per.doc_id, d.lang,
      |               round(per.s_sum * 1.0 / per.n_bigrams, 6) AS avg_kn_e3
      |        FROM per JOIN documents d ON d.doc_id = per.doc_id),
      |r AS (SELECT doc_id, lang, avg_kn_e3,
      |        CAST(row_number() OVER (PARTITION BY lang
      |               ORDER BY avg_kn_e3, doc_id) AS BIGINT) AS ppl_rank,
      |        CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
      |      FROM pdl)
      |SELECT doc_id, lang, avg_kn_e3, ppl_rank, n_lang,
      |       CAST(((ppl_rank - 1) * 3) // n_lang AS BIGINT) AS ppl_bucket
      |FROM r""".stripMargin

  /** q168 — source-divergence report ([[TextAnalysis.sourceDivergence]]):
    * KL(P_source ‖ Q_corpus) over unigram term frequencies — the
    * per-ingest drift monitor for mixture sources. Per-token
    * contributions quantized to millionths per row (integer
    * micro-grid), so kl_e6 is an exact integer sum the oracle
    * reproduces bit-for-bit. 20 rows, one per source. */
  private def q168(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceDivergence(t(s, dir, "documents"), "text", "source")

  private val q168Sql =
    """WITH tk AS (
      |  SELECT source, unnest(string_split(trim(text), ' ')) AS tok
      |  FROM documents),
      |tk2 AS (SELECT source, tok FROM tk WHERE tok <> ''),
      |st AS (SELECT source, tok, count(*) AS c_st FROM tk2 GROUP BY 1, 2),
      |tot AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
      |              count(*) AS n_types FROM st GROUP BY 1),
      |na AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_all FROM ns)
      |SELECT st.source, ns.n_s AS n_tokens, ns.n_types,
      |       CAST(sum(CAST(round((st.c_st * 1.0 / ns.n_s) *
      |              ln((st.c_st * 1.0 * na.n_all) / (ns.n_s * 1.0 * tot.c_t))
      |              * 1e6) AS BIGINT)) AS BIGINT) AS kl_e6
      |FROM st
      |JOIN tot USING (tok) JOIN ns USING (source) CROSS JOIN na
      |GROUP BY 1, 2, 3""".stripMargin

  /** q169 — Zipf fit ([[TextAnalysis.zipfFit]]): OLS of ln(freq) on
    * ln(rank) over the corpus unigram table, rank grid-decomposed over
    * distinct frequency values (no vocabulary-sized window). The
    * oracle computes the single-window rank and the same
    * e3-quantized integer sums — the decomposition is hash-checked;
    * slope lands near the Zipfian −1 on this corpus. */
  private def q169(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfFit(t(s, dir, "documents"), "text")

  private val q169Sql =
    """WITH tk AS (
      |  SELECT t.tok FROM (
      |    SELECT unnest(string_split(trim(text), ' ')) AS tok
      |    FROM documents) t
      |  WHERE t.tok <> ''),
      |freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
      |r AS (SELECT c,
      |        CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS r
      |      FROM freq),
      |xy AS (SELECT c,
      |         CAST(round(ln(r * 1.0) * 1e3) AS BIGINT) AS x,
      |         CAST(round(ln(c * 1.0) * 1e3) AS BIGINT) AS y
      |       FROM r),
      |s AS (SELECT count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx,
      |             CAST(sum(x * y) AS BIGINT) AS sxy,
      |             CAST(sum(y * y) AS BIGINT) AS syy
      |      FROM xy),
      |s2 AS (SELECT *,
      |         n_types * 1.0 * sxy - sx * 1.0 * sy AS cov,
      |         n_types * 1.0 * sxx - sx * 1.0 * sx AS varx,
      |         n_types * 1.0 * syy - sy * 1.0 * sy AS vary
      |       FROM s),
      |s3 AS (SELECT *, round(cov / varx, 6) AS slope FROM s2)
      |SELECT n_types, n_tokens, slope,
      |       round((sy * 1.0 / n_types - slope * sx / n_types) / 1e3, 6)
      |         AS intercept,
      |       round(cov * cov / (varx * vary), 6) AS r2
      |FROM s3""".stripMargin

  /** q170 — source-overlap matrix ([[TextDedup.sourceOverlap]]):
    * pairwise trigram containment + Jaccard between the corpus's 20
    * sources — the mirror-detection audit run before mixture
    * weighting. Exact over distinct per-source shingle sets; the
    * oracle replays shingling, the group-level inverted-index join,
    * and both ratios. */
  private def q170(s: SparkSession, dir: String): DataFrame =
    TextDedup.sourceOverlap(t(s, dir, "documents"), "source", "text")

  private val q170Sql =
    """WITH w AS (SELECT source, string_split(trim(text), ' ') AS ws
      |           FROM documents),
      |sg AS (
      |  SELECT DISTINCT source,
      |         ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS bg
      |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |  WHERE len(ws) >= 3),
      |cnt AS (SELECT source, count(*) AS n_sh FROM sg GROUP BY 1),
      |i AS (SELECT a.source AS source_a, b.source AS source_b,
      |             count(*) AS i
      |      FROM sg a JOIN sg b USING (bg)
      |      WHERE a.source <> b.source GROUP BY 1, 2)
      |SELECT i.source_a, i.source_b, ca.n_sh AS n_a, cb.n_sh AS n_b, i.i,
      |       round(i.i * 1.0 / ca.n_sh, 6) AS containment,
      |       round(i.i * 1.0 / (ca.n_sh + cb.n_sh - i.i), 6) AS jaccard
      |FROM i
      |JOIN cnt ca ON ca.source = i.source_a
      |JOIN cnt cb ON cb.source = i.source_b""".stripMargin

  /** q123 — sliding-window chunker ([[TextAnalysis.chunkDocuments]]):
    * retrieval-prep windows of 32 tokens every 24 (overlap 8). The
    * oracle replays the chunk-count formula, window slicing, and the
    * short-last-chunk clip; ~100-token docs yield up to 4 chunks so
    * the multi-chunk and single-chunk branches both fire. */
  private def q123(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkDocuments(t(s, dir, "documents"), "doc_id", "text")

  private val q123Sql =
    """WITH toksc AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS l,
      |         len(string_split(trim(text), ' ')) AS n
      |  FROM documents),
      |nc AS (
      |  SELECT doc_id, l, n,
      |         1 + CASE WHEN n > 32 THEN (n - 32 + 23) // 24 ELSE 0 END AS n_chunks
      |  FROM toksc)
      |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
      |       CAST(1 + k * 24 AS BIGINT) AS begin_pos,
      |       array_to_string(l[1 + k*24 : 1 + k*24 + 31], ' ') AS chunk_text,
      |       CAST(least(32, n - k*24) AS BIGINT) AS n_chunk_tokens
      |FROM nc, LATERAL unnest(range(0, n_chunks)) AS t(k)""".stripMargin

  /** q125 — token-budget selection ([[TextAnalysis.selectUnderBudget]]):
    * the "assemble the best B tokens" ledger — greedy quality-ranked
    * prefix under a 15k-token budget (cuts mid-corpus at every SF, so
    * both keep branches fire). The Spark side computes the global
    * prefix two-phase (distinct-score window + keyed within-score
    * window); the oracle states the same total order directly. */
  private def q125(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.selectUnderBudget(t(s, dir, "documents"), "doc_id", "text",
                                   budgetTokens = 15000L)

  private val q125Sql =
    s"""WITH qb AS ($q51Sql),
      |selb AS (SELECT doc_id, n_tokens, quality_score,
      |    row_number() OVER (ORDER BY quality_score DESC, doc_id) AS sel_rank,
      |    sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
      |                        ROWS UNBOUNDED PRECEDING) AS cum_tokens
      |  FROM qb)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality_score,
      |  CAST(sel_rank AS BIGINT) AS sel_rank,
      |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  CAST(CASE WHEN cum_tokens <= 15000 THEN 1 ELSE 0 END AS BIGINT) AS selected
      |FROM selb""".stripMargin

  /** q126 — pack curriculum ([[TextAnalysis.packCurriculum]]): q104's
    * packs scored by their members' mean per-token LM surprisal
    * (q112's model), banded into 250-milli-nat difficulty bands — the
    * easy→hard schedule, rank-free by design (band is a projection of
    * the pack's own score; no global window over the pack frame). */
  private def q126(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packCurriculum(t(s, dir, "documents"), "doc_id", "text")

  private val q126Sql =
    s"""WITH pk AS ($q104Sql),
      |sp AS ($q112Sql)
      |SELECT pk.pack_id, pk.bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(sp.n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(sum(sp.surprisal_e3) AS BIGINT) AS sum_surprisal_e3,
      |  round(sum(sp.surprisal_e3) * 1.0 / sum(sp.n_tokens), 6) AS difficulty_e3,
      |  CAST(floor(round(sum(sp.surprisal_e3) * 1.0 / sum(sp.n_tokens), 6) / 250)
      |       AS BIGINT) AS band
      |FROM pk JOIN sp USING (doc_id)
      |GROUP BY 1, 2""".stripMargin

  /** q134 — Unicode NFC normalization ([[TextAnalysis.normalizeDocs]])
    * over the multibyte union: the decomposed-accent fixture rows
    * (e + U+0301 etc.) COMPOSE — code-point counts shrink and
    * `changed` fires — while CJK, astral-plane, and the ASCII corpus
    * pass through untouched. NFC is Unicode-specified, so
    * `nfc_normalize` replays it exactly. */
  private def q134(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.normalizeDocs(mbDocs(s, dir), "doc_id", "text")

  private val q134Sql =
    s"""WITH $mbSrcCte,
      |nrm AS (SELECT doc_id, text,
      |          regexp_replace(trim(nfc_normalize(text)), ' +', ' ', 'g') AS n
      |        FROM mbdocs)
      |SELECT doc_id, n AS norm_text, CAST(length(n) AS BIGINT) AS n_cp,
      |       CAST(CASE WHEN n <> text THEN 1 ELSE 0 END AS BIGINT) AS changed
      |FROM nrm""".stripMargin

  /** q173 — SNAPSHOT DIFF ([[graft.pipeline.Snapshot.snapshotDiff]]):
    * v1 = the documents table; v2 = a deterministically mutated second
    * snapshot (every doc_id % 17 == 3 removed, every % 13 == 5 revised,
    * every % 29 == 0 re-crawled under a new id) — all four ledger
    * branches live. The oracle builds the SAME v2 in SQL and replays
    * the digest compare; md5 hex agrees byte-for-byte across engines,
    * so the content addresses themselves are hash-checked, not just
    * the statuses. */
  /** The Spark-side twin of [[snapshotV2Cte]], shared by q173/q176/q178. */
  private[queries] def snapshotV2(v1: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    v1.filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 5, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).as("text"))
      .unionAll(v1.filter(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
                concat(col("text"), lit(" (new)")).as("text")))

  private def q173(s: SparkSession, dir: String): DataFrame = {
    val v1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
    graft.pipeline.Snapshot.snapshotDiff(v1, snapshotV2(v1), "doc_id", "text")
  }

  /** The q173/q176 synthetic second snapshot, shared by both oracles
    * (removals, revisions, and re-crawled new ids from the v1 CTE).
    * A def, not a val: EmbeddingQueries interpolates it during ITS
    * object init, which the cross-object reference cycle can reach
    * before this object's vals are assigned. */
  private[queries] def snapshotV2Cte =
    """v2 AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 13 = 5 THEN text || ' [rev2]' ELSE text END AS text
      |  FROM v1 WHERE doc_id % 17 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text || ' (new)' AS text
      |  FROM v1 WHERE doc_id % 29 = 0)""".stripMargin

  private val q173Sql =
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
      |$snapshotV2Cte,
      |o AS (SELECT doc_id, md5(text) AS old_digest FROM v1),
      |n AS (SELECT doc_id, md5(text) AS new_digest FROM v2),
      |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |             o.old_digest, n.new_digest
      |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      |SELECT doc_id,
      |       CASE WHEN old_digest IS NULL THEN 'added'
      |            WHEN new_digest IS NULL THEN 'removed'
      |            WHEN old_digest <> new_digest THEN 'changed'
      |            ELSE 'unchanged' END AS status,
      |       coalesce(new_digest, old_digest) AS digest
      |FROM j""".stripMargin

  /** q174 — PADDING-WASTE REPORT ([[TextAnalysis.paddingBuckets]]):
    * the documents table split into 8 equal-count length buckets; per
    * bucket the padded-batch geometry (count, pad target, waste
    * ratio). The oracle computes the same ntile rule with a single
    * naive rank window — pinning the grid-decomposed distributed rank
    * to the textbook definition. */
  private def q174(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TextAnalysis.paddingBuckets(
      t(s, dir, "documents"), "doc_id", "text", 8)

  private val q174Sql =
    """WITH lens AS (
      |  SELECT doc_id,
      |         length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS len
      |  FROM documents),
      |tot AS (SELECT count(*) AS n_total FROM lens),
      |r AS (SELECT len,
      |             row_number() OVER (ORDER BY len, doc_id) - 1 AS rank0
      |      FROM lens),
      |b AS (SELECT len, (rank0 * 8) // n_total + 1 AS bucket
      |      FROM r CROSS JOIN tot)
      |SELECT bucket, count(*) AS n_docs, max(len) AS max_len,
      |       CASE WHEN max(len) = 0 THEN 0.0
      |            ELSE round(1.0 - sum(len) / (count(*) * max(len)), 6) END
      |         AS waste_ratio
      |FROM b GROUP BY bucket""".stripMargin

  /** q175 — TAINT PROPAGATION ([[graft.pipeline.TextDedup
    * .propagateFlags]]): q80's duplicate clusters × q109's quality
    * gate — any member failing the gate flags its whole near-dup
    * family ("the spam variant condemns its siblings"), with the
    * per-cluster flagged count as the audit trail. The oracle nests
    * BOTH full statements (the recursive closure and the rule table)
    * and replays the cluster OR. */
  private def q175(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val verdict = graft.pipeline.TextDedup.dedupCorpus(docs, "doc_id", "text")
    val flags = graft.pipeline.TextAnalysis.qualityRules(docs, "doc_id", "text")
      .select(col("doc_id"), (lit(1L) - col("q_keep")).as("flagged"))
    graft.pipeline.TextDedup.propagateFlags(verdict, flags)
  }

  private val q175Sql =
    s"""WITH v AS (SELECT doc_id, cluster FROM (${q80Sql}) q80v),
      |f AS (SELECT doc_id, 1 - q_keep AS own_flag0 FROM (${q109Sql}) q109v),
      |j AS (SELECT v.doc_id, v.cluster,
      |             CAST(coalesce(f.own_flag0, 0) AS BIGINT) AS own_flag
      |      FROM v LEFT JOIN f ON f.doc_id = v.doc_id),
      |cl AS (SELECT cluster, CAST(sum(own_flag) AS BIGINT) AS n_flagged,
      |              max(own_flag) AS cluster_flagged
      |       FROM j GROUP BY 1)
      |SELECT j.doc_id, j.cluster, j.own_flag, cl.cluster_flagged, cl.n_flagged
      |FROM j JOIN cl USING (cluster)""".stripMargin

  /** q177 — UNICODE SCRIPT PROFILE ([[TextAnalysis.scriptProfile]])
    * over the q91 multibyte union, so every census class is live: the
    * ASCII corpus (latin), the CJK fixture, decomposed accents
    * (combining marks), and astral emoji/math. Both engines count
    * code points via class-stripping regexp_replace (DuckDB needs the
    * explicit 'g' flag — Spark replaces globally by default), so the
    * census and the dominant-script CASE are hash-checked. */
  private def q177(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.scriptProfile(mbDocs(s, dir), "doc_id", "text")

  private val q177Sql = {
    def c(pat: String) =
      s"CAST(length(text) - length(regexp_replace(text, '$pat', '', 'g')) AS BIGINT)"
    val other = "(n_chars - n_latin - n_cjk - n_marks - n_astral - n_digit - n_space)"
    s"""WITH $mbSrcCte,
      |prof AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
      |         ${c("[A-Za-z]")} AS n_latin,
      |         ${c("[\\x{4e00}-\\x{9fff}]")} AS n_cjk,
      |         ${c("[\\x{0300}-\\x{036f}]")} AS n_marks,
      |         ${c("[\\x{10000}-\\x{10ffff}]")} AS n_astral,
      |         ${c("[0-9]")} AS n_digit,
      |         ${c("[ ]")} AS n_space
      |  FROM mbdocs)
      |SELECT doc_id, n_chars, n_latin, n_cjk, n_marks, n_astral, n_digit,
      |       n_space, $other AS n_other,
      |       CASE WHEN n_chars = 0 THEN 'und'
      |            WHEN n_latin >= n_cjk AND n_latin >= $other AND n_latin > 0
      |              THEN 'latin'
      |            WHEN n_cjk >= $other AND n_cjk > 0 THEN 'cjk'
      |            WHEN $other > 0 THEN 'other'
      |            ELSE 'und' END AS script
      |FROM prof""".stripMargin
  }

  /** q178 — CROSS-SNAPSHOT NOVELTY ([[graft.pipeline.Snapshot
    * .noveltyVsCorpus]]): the q173 delta's added/changed docs scored
    * for distinct-trigram novelty against the v1 corpus — "are the new
    * bytes new INFORMATION". Changed docs (a ' [rev2]' suffix on known
    * text) score near 0, re-crawled clones slightly higher (their
    * ' (new)' boundary grams), so the metric visibly separates
    * revision from genuine novelty even on the synthetic delta. The
    * oracle derives the same work list from digest compares and
    * replays both gram tables with the q158 trigram CTE idiom. */
  private def q178(s: SparkSession, dir: String): DataFrame = {
    val v1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val v2 = snapshotV2(v1)
    val diff = graft.pipeline.Snapshot.snapshotDiff(v1, v2, "doc_id", "text")
    val fresh = v2.join(diff.filter(col("status").isin("added", "changed"))
      .select(col("doc_id")), Seq("doc_id"), "left_semi")
    graft.pipeline.Snapshot.noveltyVsCorpus(fresh, v1, "doc_id", "text")
  }

  private val q178Sql =
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
      |$snapshotV2Cte,
      |o AS (SELECT doc_id, md5(text) AS h1 FROM v1),
      |nn AS (SELECT doc_id, md5(text) AS h2 FROM v2),
      |work AS (
      |  SELECT nn.doc_id FROM nn LEFT JOIN o USING (doc_id)
      |  WHERE o.h1 IS NULL OR o.h1 <> nn.h2),
      |nd AS (SELECT v2.doc_id, v2.text FROM v2 JOIN work USING (doc_id)),
      |refw AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM v1),
      |refg AS (SELECT DISTINCT ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS bg
      |         FROM refw, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |         WHERE len(ws) >= 3),
      |nw AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM nd),
      |ng AS (SELECT DISTINCT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS bg
      |       FROM nw, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |       WHERE len(ws) >= 3),
      |per AS (SELECT ng.doc_id, count(*) AS n_grams,
      |               sum(CASE WHEN refg.bg IS NOT NULL THEN 1 ELSE 0 END) AS n_seen
      |        FROM ng LEFT JOIN refg ON refg.bg = ng.bg GROUP BY 1)
      |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
      |       CAST(n_seen AS BIGINT) AS n_seen,
      |       round(1.0 - n_seen * 1.0 / n_grams, 6) AS novelty
      |FROM per""".stripMargin

  /** q179 — PER-SOURCE QUALITY CALIBRATION ([[TextAnalysis
    * .calibrateQuality]]): every document's quality score replaced by
    * its percentile WITHIN its source (SQL percent_rank semantics,
    * ties shared) — the cross-source comparability step before any
    * global threshold. The oracle computes the textbook
    * `percent_rank() OVER (PARTITION BY source ORDER BY ...)` while
    * the engine runs the grid-decomposed rank (no source-sized window
    * partition), so the decomposition is hash-pinned to the standard
    * definition — the q161/q174 pattern one key deeper. */
  private def q179(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.calibrateQuality(t(s, dir, "documents"), "doc_id", "text",
                                  "source")

  private val q179Sql =
    s"""WITH sc AS (SELECT doc_id, quality_score FROM ($q51Sql) q51v),
      |b AS (SELECT d.doc_id, d.source,
      |             CAST(round(sc.quality_score * 1000000) AS BIGINT) AS s_e6
      |      FROM documents d JOIN sc ON sc.doc_id = d.doc_id)
      |SELECT doc_id, source, s_e6,
      |       round(percent_rank() OVER (PARTITION BY source ORDER BY s_e6), 6)
      |         AS pct_rank
      |FROM b""".stripMargin

  /** q180 — SERVING-PATH NOVELTY GATE ([[graft.pipeline.Snapshot
    * .noveltyServe]]): q178's work list re-scored through the
    * zero-shuffle bloom projection (2^16-bit gram filter over v1,
    * k=3) instead of the exact gram join — the streaming form's plan,
    * hash-checked: the oracle replays the bloom BIT ARITHMETIC (every
    * set bit, every probe, the all-k conjunction) and the
    * occurrence-weighted fold, so the sketch path itself sits under
    * the oracle, false positives included. */
  private def q180(s: SparkSession, dir: String): DataFrame = {
    val v1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val v2 = snapshotV2(v1)
    val diff = graft.pipeline.Snapshot.snapshotDiff(v1, v2, "doc_id", "text")
    val fresh = v2.join(diff.filter(col("status").isin("added", "changed"))
      .select(col("doc_id")), Seq("doc_id"), "left_semi")
    val mBits = 1 << 16
    val bits = graft.pipeline.CorpusSketch.bloomBits(
      TextDedup.ngramShingles(v1, "doc_id", "text", 3).select(col("bg")),
      "bg", mBits, 3)
    val mask = graft.pipeline.CorpusSketch.packBloomBits(bits, mBits)
    graft.pipeline.Snapshot.noveltyServe(fresh, "doc_id", "text", mask, mBits)
  }

  /** DuckDB replay of [[graft.pipeline.CorpusSketch.h32]] (8 hex chars
    * of md5 folded with 4-bit shifts — the SketchQueries helper,
    * local copy for the gram-bloom oracle). */
  private def h32Sql(mdExpr: String): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 8),
      |  hj -> (CAST(instr('0123456789abcdef', substr($mdExpr, hj, 1)) - 1 AS BIGINT)
      |        << (4 * (8 - hj))))) AS BIGINT)""".stripMargin

  private val q180Sql = {
    def bit(key: String) = s"${h32Sql(s"md5('bloom|' || jj.j || '|' || $key)")} % 65536"
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
      |$snapshotV2Cte,
      |o AS (SELECT doc_id, md5(text) AS h1 FROM v1),
      |nn AS (SELECT doc_id, md5(text) AS h2 FROM v2),
      |work AS (
      |  SELECT nn.doc_id FROM nn LEFT JOIN o USING (doc_id)
      |  WHERE o.h1 IS NULL OR o.h1 <> nn.h2),
      |nd AS (SELECT v2.doc_id, v2.text FROM v2 JOIN work USING (doc_id)),
      |jz AS (SELECT unnest(generate_series(0, 2)) AS j),
      |refw AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM v1),
      |refg AS (SELECT DISTINCT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS bg
      |         FROM refw, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |         WHERE len(ws) >= 3),
      |bits AS (SELECT DISTINCT ${bit("bg")} AS b FROM refg, jz jj),
      |nw AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM nd),
      |ngp AS (SELECT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS bg
      |        FROM nw, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |        WHERE len(ws) >= 3),
      |ngc AS (SELECT doc_id, bg, count(*) AS c FROM ngp GROUP BY 1, 2),
      |pb AS (SELECT doc_id, bg, c, jj.j AS j, ${bit("bg")} AS bit
      |       FROM ngc, jz jj),
      |g3 AS (SELECT doc_id, bg, c,
      |              sum(CASE WHEN bits.b IS NOT NULL THEN 1 ELSE 0 END) AS h
      |       FROM pb LEFT JOIN bits ON bits.b = pb.bit GROUP BY 1, 2, 3),
      |per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
      |               CAST(sum(CASE WHEN h = 3 THEN c ELSE 0 END) AS BIGINT)
      |                 AS n_seen_est
      |        FROM g3 GROUP BY 1)
      |SELECT doc_id, n_grams, n_seen_est,
      |       round(1.0 - n_seen_est * 1.0 / n_grams, 6) AS novelty_est
      |FROM per""".stripMargin
  }

  /** q181 — winnowed document fingerprints
    * ([[TextDedup.winnowFingerprints]], Schleimer et al. 2003 / MOSS):
    * the full selected-fingerprint table at k=8, w=16 — positions and
    * gram hashes. The oracle recomputes every position's 8-gram
    * polynomial hash POSITIONALLY (exact BIGINT arithmetic, the q72
    * idiom), then replays the window minimum over the encoded
    * `h·2³¹ + (2³¹−1−pos)` key — "min hash, rightmost tie" as pure
    * integer order — and dedupes selections. */
  private def q181(s: SparkSession, dir: String): DataFrame =
    TextDedup.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text")

  private val winnowSqlCte: String = {
    val M = graft.plans.RollingHash.Mod
    // 257^(7-j) mod M for gram position j = 0..7 (oldest char first)
    val pows = (0 until 8).map(j =>
      (0 until (7 - j)).foldLeft(1L)((h, _) => h * graft.plans.RollingHash.Base % M))
    val powList = pows.mkString("[", ", ", "]")
    s"""d AS (SELECT doc_id, text AS s FROM documents WHERE length(text) >= 8),
      |g AS (SELECT doc_id, s, unnest(generate_series(1, length(s) - 7)) AS p
      |      FROM d),
      |h AS (
      |  SELECT doc_id, p,
      |         list_sum(list_transform(generate_series(0, 7),
      |           j -> CAST(ascii(substr(s, CAST(p + j AS BIGINT), 1)) AS BIGINT)
      |                * $powList[j + 1]))
      |           % $M AS h
      |  FROM g),
      |gc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng FROM h GROUP BY 1),
      |enc AS (SELECT doc_id, p, h * 2147483648 + (2147483647 - p) AS e FROM h),
      |wm AS (SELECT doc_id, p,
      |         min(e) OVER (PARTITION BY doc_id ORDER BY p
      |                      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS me
      |       FROM enc),
      |sel AS (SELECT DISTINCT wm.doc_id, me FROM wm JOIN gc USING (doc_id)
      |        WHERE wm.p <= greatest(1, gc.ng - 15))""".stripMargin
  }

  private val q181Sql =
    s"""WITH $winnowSqlCte
      |SELECT doc_id,
      |       CAST(2147483647 - (me % 2147483648) AS INTEGER) AS fp_pos,
      |       CAST(me // 2147483648 AS BIGINT) AS fp_hash
      |FROM sel""".stripMargin

  /** q182 — winnowing clone pairs ([[TextDedup.winnowClonePairs]]):
    * MOSS over the corpus — documents sharing ≥ 2 winnowed
    * fingerprints rarer than df ≤ 20 (the stop-fingerprint cap that
    * keeps the inverted-index join linear), with shared counts and the
    * containment-style overlap fraction. The oracle replays the q181
    * fingerprint table, the df cutoff, the hash-grouped pair join, and
    * both per-doc fingerprint totals. */
  private def q182(s: SparkSession, dir: String): DataFrame =
    TextDedup.winnowClonePairs(t(s, dir, "documents"), "doc_id", "text")

  private val q182Sql =
    s"""WITH $winnowSqlCte,
      |fp AS (SELECT doc_id,
      |              me // 2147483648 AS fp_hash
      |       FROM sel),
      |fps AS (SELECT DISTINCT doc_id, fp_hash FROM fp),
      |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM fps GROUP BY 1),
      |dfreq AS (SELECT fp_hash FROM fps GROUP BY fp_hash HAVING count(*) <= 20),
      |idx AS (SELECT f.doc_id, f.fp_hash FROM fps f JOIN dfreq USING (fp_hash)),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |              CAST(count(*) AS BIGINT) AS shared
      |       FROM idx a JOIN idx b ON a.fp_hash = b.fp_hash
      |                            AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT doc_a, doc_b, shared, pa.n_fp AS n_fp_a, pb.n_fp AS n_fp_b,
      |       round(shared * 1.0 / least(pa.n_fp, pb.n_fp), 6) AS overlap
      |FROM pr JOIN pd pa ON pa.doc_id = pr.doc_a
      |        JOIN pd pb ON pb.doc_id = pr.doc_b""".stripMargin

  /** q183 — character-distribution stats ([[TextAnalysis.charStats]]):
    * per-doc code-point entropy as an exact e6 integer (per-character
    * micro-terms summed inside one native expression — the q168 grid
    * idiom collapsed to a zero-shuffle projection), plus the
    * normalized ratio against the ln(n_distinct) ceiling. The oracle
    * groups characters with `string_split(s, '')` and re-sums the
    * identical rounded terms. */
  private def q183(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charStats(t(s, dir, "documents"), "doc_id", "text")

  private val q183Sql =
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
      |            FROM documents WHERE length(text) > 0),
      |cc AS (SELECT doc_id, ch, count(*) AS c FROM tk GROUP BY 1, 2),
      |nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
      |              CAST(count(*) AS BIGINT) AS n_distinct
      |       FROM cc GROUP BY 1),
      |terms AS (SELECT cc.doc_id,
      |                 CAST(round((c * 1.0 / n_chars) * ln(n_chars * 1.0 / c)
      |                            * 1e6) AS BIGINT) AS t
      |          FROM cc JOIN nn USING (doc_id)),
      |e AS (SELECT doc_id, CAST(sum(t) AS BIGINT) AS entropy_e6
      |      FROM terms GROUP BY 1),
      |base AS (SELECT doc_id FROM documents)
      |SELECT b.doc_id,
      |       coalesce(nn.n_chars, 0) AS n_chars,
      |       coalesce(nn.n_distinct, 0) AS n_distinct,
      |       coalesce(e.entropy_e6, 0) AS entropy_e6,
      |       CASE WHEN coalesce(nn.n_distinct, 0) <= 1 THEN 0.0
      |            ELSE least(round(e.entropy_e6 / 1e6
      |                             / ln(nn.n_distinct * 1.0), 6), 1.0)
      |       END AS entropy_ratio
      |FROM base b LEFT JOIN nn ON nn.doc_id = b.doc_id
      |            LEFT JOIN e ON e.doc_id = b.doc_id""".stripMargin

  /** q184 — edit-distance-confirmed clones
    * ([[TextDedup.editConfirmedClones]]): the q182 winnow candidates
    * verified with true Levenshtein distance (both engines' built-in,
    * same DP), keeping pairs at normalized edit similarity ≥ 0.4.
    * The length-gap prefilter and the confirm threshold are replayed
    * identically by the oracle. */
  private def q184(s: SparkSession, dir: String): DataFrame =
    TextDedup.editConfirmedClones(t(s, dir, "documents"), "doc_id", "text")

  private val q184Sql =
    s"""WITH $winnowSqlCte,
      |fp AS (SELECT doc_id, me // 2147483648 AS fp_hash FROM sel),
      |fps AS (SELECT DISTINCT doc_id, fp_hash FROM fp),
      |dfreq AS (SELECT fp_hash FROM fps GROUP BY fp_hash HAVING count(*) <= 20),
      |idx AS (SELECT f.doc_id, f.fp_hash FROM fps f JOIN dfreq USING (fp_hash)),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |              CAST(count(*) AS BIGINT) AS shared
      |       FROM idx a JOIN idx b ON a.fp_hash = b.fp_hash
      |                            AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2 HAVING count(*) >= 2),
      |tx AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
      |       FROM documents),
      |jj AS (SELECT pr.doc_a, pr.doc_b, pr.shared,
      |              ta.len AS len_a, tb.len AS len_b,
      |              ta.text AS sa, tb.text AS sb
      |       FROM pr JOIN tx ta ON ta.doc_id = pr.doc_a
      |               JOIN tx tb ON tb.doc_id = pr.doc_b
      |       WHERE abs(ta.len - tb.len) <= 0.6 * greatest(ta.len, tb.len)),
      |lv AS (SELECT doc_a, doc_b, shared, len_a, len_b,
      |              CAST(levenshtein(sa, sb) AS BIGINT) AS lev,
      |              round(1.0 - levenshtein(sa, sb) * 1.0
      |                    / greatest(len_a, len_b), 6) AS edit_sim
      |       FROM jj)
      |SELECT doc_a, doc_b, shared, len_a, len_b, lev, edit_sim
      |FROM lv WHERE edit_sim >= 0.4""".stripMargin

  /** q188 — PMI collocations ([[TextAnalysis.collocations]]): every
    * adjacent word pair with joint count ≥ 5 scored by pointwise
    * mutual information on the e6 grid (single log expression per
    * output row — counts aggregate exactly). The oracle replays
    * tokenization, both count tables, the shared-normalizer
    * definition (n_bi = kept-bigram occurrences pre-threshold), and
    * the quantized PMI. */
  private def q188(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.collocations(t(s, dir, "documents"), "text")

  private val q188Sql =
    """WITH tk AS (SELECT string_split(trim(text), ' ') AS l FROM documents),
      |pr AS (SELECT l[i] AS w1, l[i + 1] AS w2
      |       FROM tk, unnest(generate_series(1, len(l) - 1)) AS t(i)
      |       WHERE len(l) >= 2),
      |pr2 AS (SELECT w1, w2 FROM pr WHERE w1 <> '' AND w2 <> ''),
      |bi_all AS (SELECT w1, w2, count(*) AS c_ab FROM pr2 GROUP BY 1, 2),
      |nbi AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bi FROM bi_all),
      |tok AS (SELECT unnest(l) AS w FROM tk),
      |uni AS (SELECT w, count(*) AS c_w FROM tok WHERE w <> '' GROUP BY 1),
      |nuni AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_uni FROM uni),
      |bi AS (SELECT * FROM bi_all WHERE c_ab >= 5)
      |SELECT b.w1, b.w2, CAST(b.c_ab AS BIGINT) AS c_ab,
      |       CAST(ua.c_w AS BIGINT) AS c_a, CAST(ub.c_w AS BIGINT) AS c_b,
      |       CAST(round(ln((b.c_ab * 1.0 / n_bi) /
      |                     ((ua.c_w * 1.0 / n_uni) * (ub.c_w * 1.0 / n_uni)))
      |                  * 1e6) AS BIGINT) AS pmi_e6
      |FROM bi b JOIN uni ua ON ua.w = b.w1
      |          JOIN uni ub ON ub.w = b.w2
      |CROSS JOIN nbi CROSS JOIN nuni""".stripMargin

  /** q218 — EXACT-threshold Jaccard join ([[TextDedup
    * .jaccardJoinExact]]): every undirected pair at trigram Jaccard
    * ≥ 0.8, recall GUARANTEED by prefix filtering (rarest-first
    * (df, gram) order, L = s − ceil(0.8·s) + 1 prefixes, symmetric
    * size filter) — the audit-grade complement to the LSH tier's
    * probabilistic recall. The oracle replays prefix selection,
    * candidate join, and full-set confirm. */
  private def q218(s: SparkSession, dir: String): DataFrame =
    TextDedup.jaccardJoinExact(t(s, dir, "documents"), "doc_id", "text",
                               tau = 0.8, n = 3)

  private val q218Sql =
    """WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id, ws[i] || '_' || ws[i+1] || '_' || ws[i+2] AS bg
      |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
      |  WHERE len(ws) >= 3),
      |dfq AS (SELECT bg, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY bg),
      |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM g GROUP BY doc_id),
      |p AS (SELECT g.doc_id, g.bg, cnt.n_sh,
      |        row_number() OVER (PARTITION BY g.doc_id
      |                           ORDER BY dfq.df, g.bg) AS rn
      |      FROM g JOIN dfq USING (bg) JOIN cnt USING (doc_id)),
      |pre AS (SELECT doc_id, bg, n_sh FROM p
      |        WHERE rn <= n_sh - (n_sh * 800000 + 999999) // 1000000 + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
      |         a.n_sh AS n_a, b.n_sh AS n_b
      |  FROM pre a JOIN pre b USING (bg)
      |  WHERE a.doc_id < b.doc_id
      |    AND a.n_sh * 800000 <= b.n_sh * 1000000
      |    AND b.n_sh * 800000 <= a.n_sh * 1000000),
      |ix AS (
      |  SELECT c.da, c.db, c.n_a, c.n_b, CAST(count(*) AS BIGINT) AS i
      |  FROM cand c
      |  JOIN g ga ON ga.doc_id = c.da
      |  JOIN g gb ON gb.doc_id = c.db AND gb.bg = ga.bg
      |  GROUP BY 1, 2, 3, 4)
      |SELECT da AS doc_a, db AS doc_b, n_a, n_b, i,
      |       round(i * 1.0 / (n_a + n_b - i), 6) AS jaccard
      |FROM ix WHERE round(i * 1.0 / (n_a + n_b - i), 6) >= 0.8""".stripMargin

  /** q265 — exact phrase search
    * ([[graft.pipeline.PhraseSearch.phraseSearch]], phrase
    * "big order scan" — present at every test SF): positional-index
    * retrieval — m−1 keyed
    * (doc, pos) equi-joins with phrase-term filters pushed to each
    * branch, the quoted-string primitive bag-of-words BM25 (q81)
    * cannot express. Overlapping occurrences count (standard
    * positional semantics). */
  private def q265(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.PhraseSearch.phraseSearch(
      t(s, dir, "documents"), "doc_id", "text",
      Seq("big", "order", "scan"))

  private val q265Sql =
    """WITH toks AS (
      |  SELECT doc_id, p - 1 AS pos, l[p] AS w
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS l
      |        FROM documents) t,
      |       LATERAL (SELECT unnest(generate_series(1, len(l))) AS p)
      |  WHERE l[p] <> ''),
      |m0 AS (SELECT doc_id, pos FROM toks WHERE w = 'big'),
      |m1 AS (SELECT m0.doc_id, m0.pos FROM m0
      |       JOIN toks t1 ON t1.doc_id = m0.doc_id
      |                   AND t1.pos = m0.pos + 1 AND t1.w = 'order'),
      |m2 AS (SELECT m1.doc_id, m1.pos FROM m1
      |       JOIN toks t2 ON t2.doc_id = m1.doc_id
      |                   AND t2.pos = m1.pos + 2 AND t2.w = 'scan')
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
      |       CAST(min(pos) AS BIGINT) AS first_pos
      |FROM m2 GROUP BY 1""".stripMargin

  /** q266 — unigram-LM tokenizer training
    * ([[graft.pipeline.UnigramLm.trainViterbiEm]], 2 Viterbi-EM
    * iterations, pieces ≤ 6 chars, words ≤ 12): SentencePiece's
    * probabilistic family next to the BPE merges (q118/q136) — pieces
    * carry milli-nat costs, words segment by maximum likelihood, and
    * the M-step recounts winning pieces (singles floored, losing
    * multi-char pieces prune out). The oracle unrolls BOTH EM
    * iterations — costs, the position-indexed Viterbi DP with the
    * (cost, split) tie rule, the backtrace, and the recount — as
    * generated CTEs. */
  private def q266(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.UnigramLm.unigramPieces(
      t(s, dir, "documents"), "doc_id", "text",
      maxPieceLen = 6, maxWordLen = 12, iters = 2)

  private val q266Sql = {
    val mp = 6
    val ml = 12
    val iters = 2
    def dpChain(t: Int): String = {
      val levels = (1 to ml).map { k =>
        val prevs = (math.max(0, k - mp) until k)
          .map(j => s"SELECT * FROM d${t}_$j").mkString(" UNION ALL ")
        s"""d${t}_$k AS MATERIALIZED (
          |  SELECT w, $k AS k, cost, j AS back FROM (
          |    SELECT u.w, u.cost, u.j,
          |           row_number() OVER (PARTITION BY u.w
          |                              ORDER BY u.cost, u.j) AS rn
          |    FROM (SELECT p.w, dj.cost + p.cost_e3 AS cost, p.i AS j
          |          FROM pwc$t p JOIN ($prevs) dj
          |            ON dj.w = p.w AND dj.k = p.i
          |          WHERE p.k = $k) u) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val all = (1 to ml).map(k => s"SELECT * FROM d${t}_$k")
        .mkString(" UNION ALL ")
      s"""$levels,
        |dall$t AS MATERIALIZED ($all)""".stripMargin
    }
    def backChain(t: Int): String = {
      val steps = (1 to ml).map { s =>
        if (s == 1)
          s"""f${t}_1 AS MATERIALIZED (SELECT wl.w, d.back AS i, wl.len AS k
            |  FROM wl JOIN dall$t d ON d.w = wl.w AND d.k = wl.len)"""
            .stripMargin
        else
          s"""f${t}_$s AS MATERIALIZED (SELECT f.w, d.back AS i, f.i AS k
            |  FROM f${t}_${s - 1} f JOIN dall$t d
            |    ON d.w = f.w AND d.k = f.i
            |  WHERE f.i > 0)""".stripMargin
      }.mkString(",\n")
      val all = (1 to ml).map(s => s"SELECT * FROM f${t}_$s")
        .mkString(" UNION ALL ")
      s"""$steps,
        |seg$t AS MATERIALIZED ($all)""".stripMargin
    }
    def iteration(t: Int): String =
      s"""tt$t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM c$t),
        |cost$t AS (SELECT piece,
        |    CAST(round(ln(CAST(tt AS DOUBLE) / cnt) * 1e3) AS BIGINT)
        |      AS cost_e3
        |  FROM c$t CROSS JOIN tt$t),
        |pwc$t AS MATERIALIZED (SELECT pw.w, pw.i, pw.k, pw.piece, cost_e3
        |  FROM pw JOIN cost$t USING (piece)),
        |d${t}_0 AS MATERIALIZED (SELECT w, 0 AS k, CAST(0 AS BIGINT) AS cost, -1 AS back
        |  FROM w0),
        |${dpChain(t)},
        |${backChain(t)},
        |sc$t AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM seg$t JOIN pw USING (w, i, k) GROUP BY 1),
        |c${t + 1} AS MATERIALIZED (
        |  SELECT piece, cnt FROM sc$t
        |  WHERE piece NOT IN (SELECT piece FROM sing)
        |  UNION ALL
        |  SELECT s.piece, greatest(coalesce(sc.cnt, 0), 1) AS cnt
        |  FROM sing s LEFT JOIN sc$t sc USING (piece))""".stripMargin
    s"""WITH w0 AS MATERIALIZED (
      |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(string_split(trim(text), ' ')) AS w
      |    FROM documents) x
      |  WHERE w <> '' AND length(w) <= $ml GROUP BY 1),
      |wl AS (SELECT w, length(w) AS len FROM w0),
      |pw AS MATERIALIZED (
      |  SELECT a.w, a.freq, a.i, b.k, substr(a.w, a.i + 1, b.k - a.i)
      |           AS piece
      |  FROM (SELECT w, freq,
      |          unnest(generate_series(0, length(w) - 1)) AS i
      |        FROM w0) a,
      |  LATERAL (SELECT unnest(generate_series(a.i + 1,
      |             least(length(a.w), a.i + $mp))) AS k) b),
      |sing AS MATERIALIZED (SELECT DISTINCT piece FROM pw WHERE k - i = 1),
      |c1 AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
      |       FROM pw GROUP BY 1),
      |${(1 to iters).map(iteration).mkString(",\n")},
      |ttf AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM c${iters + 1})
      |SELECT piece, cnt,
      |  CAST(round(ln(CAST(tt AS DOUBLE) / cnt) * 1e3) AS BIGINT)
      |    AS cost_e3
      |FROM c${iters + 1} CROSS JOIN ttf""".stripMargin
  }

  /** q273 — multinomial Naive Bayes language router
    * ([[graft.pipeline.NaiveBayes.classify]]): train priors +
    * Laplace-smoothed token likelihoods on even doc_ids, score odd
    * doc_ids, argmax with label-ascending tie-break. Scores are
    * exact long sums of micro-nat terms, so the oracle replays
    * training AND scoring as plain SQL. */
  private def q273(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.NaiveBayes.classify(
      t(s, dir, "documents"), "doc_id", "text", "lang",
      col("doc_id") % 2 === 0)

  private val q273Sql =
    """WITH docs AS (SELECT doc_id AS id, text AS txt, lang AS lbl,
      |                doc_id % 2 = 0 AS tr FROM documents),
      |toks AS (SELECT id, lbl, tr, t
      |         FROM (SELECT id, lbl, tr,
      |                 unnest(string_split(trim(txt), ' ')) AS t
      |               FROM docs) x WHERE t <> ''),
      |cnt AS (SELECT lbl, t, CAST(count(*) AS BIGINT) AS c
      |        FROM toks WHERE tr GROUP BY 1, 2),
      |tot AS (SELECT lbl, CAST(sum(c) AS BIGINT) AS tot
      |        FROM cnt GROUP BY 1),
      |vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
      |          FROM toks WHERE tr),
      |nd AS (SELECT lbl, CAST(count(*) AS BIGINT) AS n_l
      |       FROM docs WHERE tr GROUP BY 1),
      |na AS (SELECT CAST(count(*) AS BIGINT) AS n_all
      |       FROM docs WHERE tr),
      |priors AS (SELECT lbl AS cl,
      |             CAST(round(ln(CAST(n_l AS DOUBLE) / n_all) * 1e6)
      |               AS BIGINT) AS prior_e6
      |           FROM nd CROSS JOIN na),
      |llr AS (SELECT cnt.lbl AS cl, t,
      |          CAST(round(ln(CAST(c + 1 AS DOUBLE) / (tot + v)) * 1e6)
      |            AS BIGINT) AS llr_e6
      |        FROM cnt JOIN tot ON cnt.lbl = tot.lbl CROSS JOIN vocab),
      |defs AS (SELECT lbl AS cl,
      |           CAST(round(ln(1.0 / (tot + v)) * 1e6) AS BIGINT)
      |             AS def_e6
      |         FROM tot CROSS JOIN vocab),
      |tt AS (SELECT id, lbl AS true_lbl, t, CAST(count(*) AS BIGINT)
      |         AS tc
      |       FROM toks WHERE NOT tr GROUP BY 1, 2, 3),
      |scores AS (
      |  SELECT tt.id, tt.true_lbl, p.cl,
      |    p.prior_e6 + CAST(sum(tt.tc * coalesce(l.llr_e6, d.def_e6))
      |      AS BIGINT) AS score_e6
      |  FROM tt CROSS JOIN priors p
      |  LEFT JOIN llr l ON l.cl = p.cl AND l.t = tt.t
      |  JOIN defs d ON d.cl = p.cl
      |  GROUP BY tt.id, tt.true_lbl, p.cl, p.prior_e6),
      |ranked AS (SELECT *, row_number() OVER
      |    (PARTITION BY id ORDER BY score_e6 DESC, cl) AS rn
      |  FROM scores)
      |SELECT id AS doc_id, true_lbl AS lang, cl AS pred_label,
      |  score_e6 AS best_e6,
      |  CAST(true_lbl = cl AS BIGINT) AS correct
      |FROM ranked WHERE rn = 1""".stripMargin

  /** q274 — histogram decision stump
    * ([[graft.pipeline.Stump.bestSplits]]): best single Gini split of
    * "is this document English?" over three integer features (chars,
    * whitespace tokens, vowel count) — the LightGBM histogram-split
    * primitive as one relational scan, cumulative class counts on
    * the distributed per-feature grid prefix. */
  private def q274(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Stump.bestSplits(
      t(s, dir, "documents").select(
        length(col("text")).cast("long").as("n_chars"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[aeiou]", "")))
          .cast("long").as("n_vowels"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y")),
      Seq("n_chars", "n_tokens", "n_vowels"), "y")

  private val q274Sql =
    """WITH f AS (SELECT
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
      |    CAST(length(text) -
      |      length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
      |      AS n_vowels,
      |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
      |      ELSE CAST(0 AS BIGINT) END AS y
      |  FROM documents),
      |m AS (SELECT 'n_chars' AS feature, n_chars AS v, y FROM f
      |      UNION ALL SELECT 'n_tokens', n_tokens, y FROM f
      |      UNION ALL SELECT 'n_vowels', n_vowels, y FROM f),
      |g AS (SELECT feature, v, CAST(sum(y) AS BIGINT) AS pos,
      |        CAST(sum(1 - y) AS BIGINT) AS neg
      |      FROM m GROUP BY 1, 2),
      |c AS (SELECT feature, v, pos, neg,
      |        CAST(sum(pos) OVER w AS BIGINT) AS cum_pos,
      |        CAST(sum(neg) OVER w AS BIGINT) AS cum_neg
      |      FROM g WINDOW w AS (PARTITION BY feature ORDER BY v
      |        ROWS UNBOUNDED PRECEDING)),
      |t AS (SELECT feature, CAST(sum(pos) AS BIGINT) AS t_pos,
      |        CAST(sum(neg) AS BIGINT) AS t_neg
      |      FROM g GROUP BY 1),
      |cand AS (SELECT c.feature, v,
      |    cum_pos + cum_neg AS n_l,
      |    t_pos + t_neg - cum_pos - cum_neg AS n_r,
      |    CAST(round((
      |      (CAST(cum_pos AS DOUBLE) * cum_pos
      |       + CAST(cum_neg AS DOUBLE) * cum_neg) / (cum_pos + cum_neg)
      |      + (CAST(t_pos - cum_pos AS DOUBLE) * (t_pos - cum_pos)
      |         + CAST(t_neg - cum_neg AS DOUBLE) * (t_neg - cum_neg))
      |        / (t_pos + t_neg - cum_pos - cum_neg)
      |      ) * 1000000.0) AS BIGINT) AS score_e6
      |  FROM c JOIN t ON c.feature = t.feature
      |  WHERE t_pos + t_neg - cum_pos - cum_neg > 0),
      |r AS (SELECT *, row_number() OVER
      |    (PARTITION BY feature ORDER BY score_e6 DESC, v) AS rn
      |  FROM cand)
      |SELECT feature, v AS threshold, n_l AS n_left, n_r AS n_right,
      |  score_e6
      |FROM r WHERE rn = 1""".stripMargin

  /** q276 — fuzzy record linkage
    * ([[graft.pipeline.EntityResolution.fuzzyNamePairs]]): near-
    * duplicate part names via df-capped all-token blocking +
    * Levenshtein ≤ 3 confirm, on the distinct-name grid with row
    * counts as weights — the typo'd-vendor / re-keyed-SKU primitive
    * without an n² join. */
  private def q276(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.EntityResolution.fuzzyNamePairs(
      t(s, dir, "part"), "p_name", maxLev = 3)

  private val q276Sql =
    """WITH names AS (SELECT p_name AS nm, CAST(count(*) AS BIGINT)
      |    AS cnt FROM part GROUP BY 1),
      |toks AS (SELECT DISTINCT nm, cnt, t FROM (
      |    SELECT nm, cnt, unnest(string_split(trim(nm), ' ')) AS t
      |    FROM names) x WHERE t <> ''),
      |dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS df
      |        FROM toks GROUP BY 1
      |        HAVING count(*) BETWEEN 2 AND 1000),
      |blk AS (SELECT toks.t AS bk, nm, cnt
      |        FROM toks JOIN dfq ON toks.t = dfq.t),
      |cand AS (SELECT DISTINCT a.nm AS name_a, b.nm AS name_b,
      |    a.cnt AS n_a, b.cnt AS n_b
      |  FROM blk a JOIN blk b ON a.bk = b.bk AND a.nm < b.nm)
      |SELECT name_a, name_b, n_a, n_b,
      |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev
      |FROM cand WHERE levenshtein(name_a, name_b) <= 3""".stripMargin

  /** q277 — RM3 pseudo-relevance feedback
    * ([[TextAnalysis.rm3TopK]]): q81's BM25 query expanded with the 5
    * most characteristic terms of its top-10 feedback docs (exact
    * integer relevance model), rescored with expansion terms at 0.4
    * weight. The oracle replays both passes, the term-weight fold,
    * and the expansion pick. */
  private def q277(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rm3TopK(t(s, dir, "documents"), "doc_id", "text",
                         Seq("hash", "join", "filter"), k = 20)

  private val q277Sql = {
    val k1 = 1.2; val b = 0.75
    s"""WITH toks AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t
      |    FROM documents) x
      |  WHERE t <> ''),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf1 AS (SELECT doc_id, t, count(*) AS tf FROM toks
      |        WHERE t IN ('hash', 'join', 'filter') GROUP BY 1, 2),
      |df1 AS (SELECT t, count(*) AS df FROM tf1 GROUP BY 1),
      |c1 AS (
      |  SELECT tf1.doc_id,
      |         CAST(round(ln((st.n_docs - df1.df + 0.5) / (df1.df + 0.5) + 1.0)
      |           * (tf1.tf * ${k1 + 1}) / (tf1.tf + $k1 * (${1.0 - b} + $b * dl.dl / st.avgdl))
      |           * 1000000.0) AS BIGINT) AS c_e6
      |  FROM tf1 JOIN df1 USING (t) JOIN dl USING (doc_id) CROSS JOIN st),
      |p1 AS (SELECT doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6
      |       FROM c1 GROUP BY 1
      |       ORDER BY score_e6 DESC, doc_id LIMIT 10),
      |fbtf AS (SELECT toks.doc_id, p1.score_e6, toks.t,
      |           CAST(count(*) AS BIGINT) AS tf
      |         FROM toks JOIN p1 ON toks.doc_id = p1.doc_id
      |         GROUP BY 1, 2, 3),
      |tw AS (SELECT t, CAST(sum((tf * score_e6) // dl.dl) AS BIGINT) AS tw
      |       FROM fbtf JOIN dl ON fbtf.doc_id = dl.doc_id
      |       WHERE t NOT IN ('hash', 'join', 'filter')
      |       GROUP BY t),
      |expn AS (SELECT t AS tok, CAST(400000 AS BIGINT) AS w_e6 FROM (
      |    SELECT t, row_number() OVER (ORDER BY tw DESC, t) AS rn
      |    FROM tw) y WHERE rn <= 5),
      |terms AS (SELECT 'hash' AS tok, CAST(1000000 AS BIGINT) AS w_e6
      |          UNION ALL SELECT 'join', 1000000
      |          UNION ALL SELECT 'filter', 1000000
      |          UNION ALL SELECT tok, w_e6 FROM expn),
      |tf2 AS (SELECT doc_id, tok, w_e6, count(*) AS tf
      |        FROM toks JOIN terms ON toks.t = terms.tok
      |        GROUP BY 1, 2, 3),
      |df2 AS (SELECT tok, count(*) AS df FROM tf2 GROUP BY 1),
      |c2 AS (
      |  SELECT tf2.doc_id,
      |    (CAST(round(ln((st.n_docs - df2.df + 0.5) / (df2.df + 0.5) + 1.0)
      |      * (tf2.tf * ${k1 + 1}) / (tf2.tf + $k1 * (${1.0 - b} + $b * dl.dl / st.avgdl))
      |      * 1000000.0) AS BIGINT) * tf2.w_e6) // 1000000 AS cw_e6
      |  FROM tf2 JOIN df2 USING (tok) JOIN dl USING (doc_id) CROSS JOIN st),
      |sc2 AS (SELECT doc_id, CAST(sum(cw_e6) AS BIGINT) AS score_e6
      |        FROM c2 GROUP BY 1)
      |SELECT doc_id, score_e6,
      |  CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT)
      |    AS rank
      |FROM sc2 ORDER BY score_e6 DESC, doc_id LIMIT 20""".stripMargin
  }

  /** q286 — proximity search
    * ([[graft.pipeline.PhraseSearch.proximitySearch]], terms
    * {big, order, scan}, slop 6): all terms within a 6-token window
    * in any order — the sloppy-phrase middle ground between q265's
    * exact phrase and q81's bag-of-words. */
  private def q286(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.PhraseSearch.proximitySearch(
      t(s, dir, "documents"), "doc_id", "text",
      Seq("big", "order", "scan"), slop = 6)

  private val q286Sql =
    """WITH toks AS (
      |  SELECT doc_id, p - 1 AS pos, l[p] AS w
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS l
      |        FROM documents) t,
      |       LATERAL (SELECT unnest(generate_series(1, len(l))) AS p)
      |  WHERE l[p] <> ''),
      |w AS (
      |  SELECT a.doc_id, a.pos AS p0, b.pos AS p1, c.pos AS p2,
      |    CAST(greatest(a.pos, b.pos, c.pos)
      |         - least(a.pos, b.pos, c.pos) AS BIGINT) AS span
      |  FROM toks a
      |  JOIN toks b ON b.doc_id = a.doc_id AND b.w = 'order'
      |  JOIN toks c ON c.doc_id = a.doc_id AND c.w = 'scan'
      |  WHERE a.w = 'big')
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
      |  min(span) AS min_span,
      |  CAST(min(least(p0, p1, p2)) AS BIGINT) AS first_pos
      |FROM w WHERE span <= 6 GROUP BY 1""".stripMargin

  /** q281 — RAKE keyphrase extraction
    * ([[graft.pipeline.Rake.rakePhrases]]): top-20 stopword-delimited
    * keyphrases by deg/freq word scores on the exact e6 grid —
    * phrase ids from a doc-keyed running stopword count, word stats
    * one vocabulary aggregate. */
  private def q281(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Rake.rakePhrases(
      t(s, dir, "documents"), "doc_id", "text")

  private val q281Sql =
    """WITH toks AS (
      |  SELECT doc_id AS id, p - 1 AS pos, l[p] AS tok,
      |    CASE WHEN l[p] IN ('the', 'a', 'and', 'of', 'is')
      |      THEN 1 ELSE 0 END AS is_stop
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS l
      |        FROM documents) t,
      |       LATERAL (SELECT unnest(generate_series(1, len(l))) AS p)
      |  WHERE l[p] <> ''),
      |ph AS (SELECT id, pos, tok, is_stop,
      |    CAST(sum(is_stop) OVER (PARTITION BY id ORDER BY pos
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pid
      |  FROM toks),
      |phr AS (SELECT * FROM ph WHERE is_stop = 0),
      |plen AS (SELECT id, pid, CAST(count(*) AS BIGINT) AS plen,
      |    string_agg(tok, ' ' ORDER BY pos) AS phrase
      |  FROM phr GROUP BY 1, 2 HAVING count(*) <= 4),
      |wo AS (SELECT phr.id, phr.pid, phr.tok, plen.plen
      |       FROM phr JOIN plen USING (id, pid)),
      |ws AS (SELECT tok,
      |    (CAST(sum(plen) AS BIGINT) * 1000000)
      |      // CAST(count(*) AS BIGINT) AS ws_e6
      |  FROM wo GROUP BY 1),
      |ps AS (SELECT wo.id, wo.pid,
      |    CAST(sum(ws.ws_e6) AS BIGINT) AS score_e6
      |  FROM wo JOIN ws USING (tok) GROUP BY 1, 2)
      |SELECT plen.phrase, CAST(count(*) AS BIGINT) AS n_occ,
      |  CAST(max(plen.plen) AS BIGINT) AS n_words,
      |  CAST(max(ps.score_e6) AS BIGINT) AS score_e6
      |FROM ps JOIN plen USING (id, pid)
      |GROUP BY plen.phrase
      |ORDER BY score_e6 DESC, phrase LIMIT 20""".stripMargin

  /** q306 — pairwise Jensen–Shannon divergence
    * ([[graft.stats.Divergence.jensenShannon]]) between the
    * per-source unigram distributions: the symmetric bounded drift
    * matrix over feeds that PSI's baseline-vs-candidate shape can't
    * express. Source pair grid is the 5-source contract; per-term
    * contributions e6-rounded before the exact sum. */
  private def q306(s: SparkSession, dir: String): DataFrame =
    graft.stats.Divergence.jensenShannon(
      t(s, dir, "documents")
        .select(col("source"),
                explode(split(trim(col("text")), " ")).as("cat"))
        .filter(col("cat") =!= "")
        .groupBy(col("source"), col("cat"))
        .agg(count(lit(1)).as("c")),
      "source", "cat", "c")

  private val q306Sql =
    """WITH tk AS (
      |  SELECT source, unnest(string_split(trim(text), ' ')) AS cat
      |  FROM documents),
      |ct AS (SELECT source AS k, cat, CAST(count(*) AS BIGINT) AS c
      |       FROM tk WHERE cat <> '' GROUP BY 1, 2),
      |tot AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM ct GROUP BY 1),
      |pr AS (SELECT a.k AS ka, a.n AS na, b.k AS kb, b.n AS nb
      |       FROM tot a JOIN tot b ON a.k < b.k),
      |sup AS (SELECT DISTINCT k, cat FROM ct),
      |grid AS (SELECT DISTINCT ka, kb, na, nb, cat FROM (
      |    SELECT pr.ka, pr.kb, pr.na, pr.nb, s.cat
      |    FROM pr JOIN sup s ON s.k = pr.ka
      |    UNION ALL
      |    SELECT pr.ka, pr.kb, pr.na, pr.nb, s.cat
      |    FROM pr JOIN sup s ON s.k = pr.kb)),
      |j AS (SELECT g.ka, g.kb, g.na, g.nb, g.cat,
      |        coalesce(ca.c, 0) AS c_a, coalesce(cb.c, 0) AS c_b
      |      FROM grid g
      |      LEFT JOIN ct ca ON ca.k = g.ka AND ca.cat = g.cat
      |      LEFT JOIN ct cb ON cb.k = g.kb AND cb.cat = g.cat),
      |tm AS (SELECT ka, kb,
      |        CAST(round((
      |          CASE WHEN c_a > 0 THEN
      |            (CAST(c_a AS DOUBLE) / CAST(na AS DOUBLE))
      |            * ln((CAST(c_a AS DOUBLE) / CAST(na AS DOUBLE))
      |              / ((CAST(c_a AS DOUBLE) / CAST(na AS DOUBLE)
      |                  + CAST(c_b AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
      |          ELSE 0.0 END / 2.0
      |          + CASE WHEN c_b > 0 THEN
      |            (CAST(c_b AS DOUBLE) / CAST(nb AS DOUBLE))
      |            * ln((CAST(c_b AS DOUBLE) / CAST(nb AS DOUBLE))
      |              / ((CAST(c_a AS DOUBLE) / CAST(na AS DOUBLE)
      |                  + CAST(c_b AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
      |          ELSE 0.0 END / 2.0) * 1000000.0) AS BIGINT) AS term
      |       FROM j)
      |SELECT ka AS source_a, kb AS source_b,
      |  CAST(count(*) AS BIGINT) AS n_terms,
      |  CAST(sum(term) AS BIGINT) AS jsd_e6
      |FROM tm GROUP BY 1, 2""".stripMargin

  /** q307 — Cohen's κ ([[graft.stats.Agreement.cohenKappa]]) between
    * the length gate (n_chars ≥ 300) and the English-language gate:
    * do two curation verdicts agree beyond their marginal keep rates?
    * Fully exact — count products in decimal(38), one truncating
    * division. */
  private def q307(s: SparkSession, dir: String): DataFrame =
    graft.stats.Agreement.cohenKappa(
      t(s, dir, "documents")
        .select((col("n_chars") >= 300L).cast("long").as("ga"),
                (col("lang") === "en").cast("long").as("gb")),
      "ga", "gb")

  private val q307Sql =
    """WITH o AS (
      |  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b
      |  FROM documents),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_agree,
      |         CAST(sum(a) AS BIGINT) AS ma1,
      |         CAST(sum(b) AS BIGINT) AS mb1
      |       FROM o),
      |pe AS (SELECT *,
      |         CAST(ma1 AS HUGEINT) * mb1
      |           + CAST(n - ma1 AS HUGEINT) * (n - mb1) AS pe_n2
      |       FROM ag)
      |SELECT n, n_agree,
      |  CAST(CASE WHEN CAST(n AS HUGEINT) * n - pe_n2 = 0 THEN NULL
      |       ELSE (CAST(n AS HUGEINT) * n_agree - pe_n2) * 1000000
      |            // (CAST(n AS HUGEINT) * n - pe_n2) END AS BIGINT)
      |    AS kappa_e6
      |FROM pe""".stripMargin

  /** q308 — exact AUC ([[graft.stats.MlEval.aucExact]]) of word
    * count as a score for the n_chars ≥ 300 gate: the
    * Mann–Whitney/midrank identity on the score-value grid, one
    * truncating division. The classifier-eval twin of q171's IR
    * scorecard. */
  private def q308(s: SparkSession, dir: String): DataFrame =
    graft.stats.MlEval.aucExact(
      t(s, dir, "documents")
        .select(size(split(trim(col("text")), " ")).as("s"),
                (col("n_chars") >= 300L).cast("long").as("y")),
      "s", "y")

  private val q308Sql =
    """WITH o AS (
      |  SELECT len(string_split(trim(text), ' ')) AS s,
      |         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |g AS (SELECT s, CAST(sum(y) AS BIGINT) AS c_pos,
      |             CAST(count(*) AS BIGINT) AS c
      |      FROM o GROUP BY 1),
      |r AS (SELECT *,
      |        2*(sum(c) OVER (ORDER BY s) - c) + c + 1 AS r2
      |      FROM g),
      |ag AS (SELECT CAST(sum(c_pos) AS BIGINT) AS n_pos,
      |         CAST(sum(c - c_pos) AS BIGINT) AS n_neg,
      |         sum(CAST(c_pos AS HUGEINT) * r2) AS r2_pos
      |       FROM r)
      |SELECT n_pos, n_neg,
      |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    (r2_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
      |    // (CAST(n_pos AS HUGEINT) * n_neg * 2) END AS BIGINT)
      |    AS auc_e6
      |FROM ag""".stripMargin

  /** q319 — McNemar's test ([[graft.stats.Agreement.mcnemar]]) on
    * q307's two quality gates: κ asked whether the length gate and
    * the language gate AGREE beyond chance; this asks whether their
    * DISAGREEMENTS are asymmetric — does switching gates move the
    * keep set in one direction. Off-diagonal counts only, χ² plain
    * and continuity-corrected, exact integer-div micros. */
  private def q319(s: SparkSession, dir: String): DataFrame =
    graft.stats.Agreement.mcnemar(
      t(s, dir, "documents")
        .select((col("n_chars") >= 300L).cast("long").as("ga"),
                (col("lang") === "en").cast("long").as("gb")),
      "ga", "gb")

  private val q319Sql =
    """WITH o AS (
      |  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b
      |  FROM documents),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
      |           AS BIGINT) AS b_ct,
      |         CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
      |           AS BIGINT) AS c_ct
      |       FROM o)
      |SELECT n, b_ct, c_ct,
      |  CASE WHEN b_ct + c_ct = 0 THEN NULL
      |    ELSE CAST(CAST(b_ct - c_ct AS HUGEINT) * (b_ct - c_ct)
      |      * 1000000 // (b_ct + c_ct) AS BIGINT) END AS chi2_e6,
      |  CASE WHEN b_ct + c_ct = 0 THEN NULL
      |    ELSE CAST(CAST(greatest(abs(b_ct - c_ct) - 1, 0) AS HUGEINT)
      |      * greatest(abs(b_ct - c_ct) - 1, 0)
      |      * 1000000 // (b_ct + c_ct) AS BIGINT) END AS chi2_cc_e6
      |FROM ag""".stripMargin

  /** q320 — exact average precision ([[graft.stats.MlEval
    * .averagePrecision]]) of q308's score/label pair: where AUC asks
    * "does a random positive outscore a random negative", AP weights
    * precision by where the positives actually LAND — the retrieval
    * number for a keep-the-top-slice curation gate. Sklearn step
    * definition over the descending score grid, one truncating e6
    * term per distinct score. */
  private def q320(s: SparkSession, dir: String): DataFrame =
    graft.stats.MlEval.averagePrecision(
      t(s, dir, "documents")
        .select(size(split(trim(col("text")), " ")).as("s"),
                (col("n_chars") >= 300L).cast("long").as("y")),
      "s", "y")

  private val q320Sql =
    """WITH o AS (
      |  SELECT len(string_split(trim(text), ' ')) AS s,
      |         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |g AS (SELECT -s AS v, CAST(sum(y) AS BIGINT) AS c_pos,
      |             CAST(count(*) AS BIGINT) AS c
      |      FROM o GROUP BY 1),
      |pre AS (SELECT v, c_pos, c,
      |          sum(c) OVER (ORDER BY v) AS cum_c,
      |          sum(c_pos) OVER (ORDER BY v) AS cum_p
      |        FROM g),
      |tot AS (SELECT CAST(max(cum_p) AS BIGINT) AS n_p,
      |          CAST(max(cum_c) AS BIGINT) AS n_all FROM pre)
      |SELECT n_p AS n_pos, n_all - n_p AS n_neg,
      |  CASE WHEN n_p = 0 THEN NULL
      |    ELSE CAST(sum(CAST(c_pos AS HUGEINT) * cum_p * 1000000
      |      // (CAST(n_p AS HUGEINT) * cum_c)) AS BIGINT) END AS ap_e6
      |FROM pre CROSS JOIN tot GROUP BY n_p, n_all""".stripMargin

  /** q339 — G-test of independence ([[graft.stats.Hypothesis
    * .gTest]]): is document LANGUAGE independent of SOURCE — the
    * log-likelihood twin of the Pearson χ², additive across
    * drill-downs, per-cell e6 log terms (the q306 discipline). */
  private def q339(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.gTest(
      t(s, dir, "documents").select(col("source"), col("lang")),
      "source", "lang")

  private val q339Sql =
    """WITH cells AS (SELECT source AS a, lang AS b,
      |                 CAST(count(*) AS BIGINT) AS o
      |               FROM documents GROUP BY 1, 2),
      |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells
      |       GROUP BY 1),
      |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c_t FROM cells
      |       GROUP BY 1),
      |tt AS (SELECT CAST(sum(r) AS BIGINT) AS n,
      |         CAST(count(*) AS BIGINT) AS r_levels FROM rt),
      |cl AS (SELECT CAST(count(*) AS BIGINT) AS c_levels FROM ct),
      |terms AS (SELECT n, r_levels, c_levels,
      |            CAST(round(CAST(o AS DOUBLE)
      |              * ln(CAST(o AS DOUBLE) * n
      |                   / (CAST(r AS DOUBLE) * c_t)) * 1000000)
      |              AS BIGINT) AS term
      |          FROM cells JOIN rt USING (a) JOIN ct USING (b)
      |          CROSS JOIN tt CROSS JOIN cl)
      |SELECT n, r_levels, c_levels,
      |  (r_levels - 1) * (c_levels - 1) AS dof,
      |  CAST(2 * sum(term) AS BIGINT) AS g_e6
      |FROM terms GROUP BY n, r_levels, c_levels""".stripMargin

  /** q321 — Cochran's Q ([[graft.stats.Agreement.cochranQ]]) over
    * THREE quality gates (length, language, word count) on the same
    * documents: q319's McNemar compares two gates' marginals; Q asks
    * whether the whole gate PANEL keeps the same fraction — the
    * pre-test before pairwise McNemar drill-downs. */
  private def q321(s: SparkSession, dir: String): DataFrame =
    graft.stats.Agreement.cochranQ(
      t(s, dir, "documents")
        .select((col("n_chars") >= 300L).cast("long").as("ga"),
                (col("lang") === "en").cast("long").as("gb"),
                (size(split(trim(col("text")), " ")) >= 50)
                  .cast("long").as("gc")),
      Seq("ga", "gb", "gc"))

  private val q321Sql =
    """WITH o AS (
      |  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b,
      |         CASE WHEN len(string_split(trim(text), ' ')) >= 50
      |           THEN 1 ELSE 0 END AS c
      |  FROM documents),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(a) AS BIGINT) AS t0, CAST(sum(b) AS BIGINT) AS t1,
      |         CAST(sum(c) AS BIGINT) AS t2,
      |         CAST(sum(a + b + c) AS BIGINT) AS t_total,
      |         CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sl2
      |       FROM o)
      |SELECT n, CAST(3 AS BIGINT) AS k, t_total,
      |  CASE WHEN 3 * t_total - sl2 <= 0 THEN NULL
      |    ELSE CAST(CAST(2 AS HUGEINT)
      |      * (3 * (CAST(t0 AS HUGEINT) * t0 + CAST(t1 AS HUGEINT) * t1
      |              + CAST(t2 AS HUGEINT) * t2)
      |         - CAST(t_total AS HUGEINT) * t_total) * 1000000
      |      // (3 * t_total - sl2) AS BIGINT) END AS q_e6
      |FROM ag""".stripMargin

  /** q324 — calibration readout ([[graft.stats.MlEval
    * .brierCalibration]], 10 bins): treat the length-derived e6
    * probability least(n_chars/600, 1) as a "keeps-English"
    * predictor and grade it AS A PROBABILITY against lang = 'en' —
    * Brier score plus the reliability-bin gaps whose weighted sum
    * is the ECE. A deliberately mis-calibrated score: the bins show
    * WHERE it lies. */
  private def q324(s: SparkSession, dir: String): DataFrame =
    graft.stats.MlEval.brierCalibration(
      t(s, dir, "documents")
        .select(expr("least(CAST(n_chars AS BIGINT) * 1000000 div 600," +
                  " CAST(1000000 AS BIGINT))").as("p"),
                (col("lang") === "en").cast("long").as("y")),
      "p", "y", nBins = 10)

  private val q324Sql =
    """WITH o AS (
      |  SELECT least(CAST(n_chars AS BIGINT) * 1000000 // 600, 1000000)
      |           AS p,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |pb AS (SELECT least(p * 10 // 1000000, 9) AS bin,
      |         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT)
      |           AS n_pos,
      |         CAST(sum(p) AS BIGINT) AS sum_p,
      |         sum(CAST(p - 1000000 * y AS HUGEINT) * (p - 1000000 * y))
      |           AS sq
      |       FROM o GROUP BY 1),
      |tt AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
      |         CAST(sum(abs(sum_p - 1000000 * n_pos)) AS BIGINT)
      |           AS gap_sum,
      |         sum(sq) AS sq_sum FROM pb)
      |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
      |  sum_p // n AS conf_e6,
      |  n_pos * 1000000 // n AS acc_e6,
      |  abs(sum_p - 1000000 * n_pos) // n AS gap_e6,
      |  n_total, gap_sum // n_total AS ece_e6,
      |  CAST(sq_sum // (CAST(n_total AS HUGEINT) * 1000000) AS BIGINT)
      |    AS brier_e6
      |FROM pb CROSS JOIN tt""".stripMargin

  /** q325 — best-F1 threshold sweep ([[graft.stats.MlEval
    * .bestF1Threshold]]) of q308's score/label pair: AUC graded the
    * word-count RANKING; this picks the operating point — the
    * word-count threshold the gate would actually ship with, its
    * full confusion matrix, and MCC at the winner. */
  private def q325(s: SparkSession, dir: String): DataFrame =
    graft.stats.MlEval.bestF1Threshold(
      t(s, dir, "documents")
        .select(size(split(trim(col("text")), " ")).as("s"),
                (col("n_chars") >= 300L).cast("long").as("y")),
      "s", "y")

  private val q325Sql =
    """WITH o AS (
      |  SELECT len(string_split(trim(text), ' ')) AS s,
      |         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |g AS (SELECT -s AS v, CAST(sum(y) AS BIGINT) AS c_pos,
      |             CAST(count(*) AS BIGINT) AS c
      |      FROM o GROUP BY 1),
      |pre AS (SELECT v, c_pos, c,
      |          sum(c) OVER (ORDER BY v) AS cum_c,
      |          sum(c_pos) OVER (ORDER BY v) AS cum_p
      |        FROM g),
      |tot AS (SELECT CAST(max(cum_p) AS BIGINT) AS n_p,
      |          CAST(max(cum_c) AS BIGINT) AS n_all FROM pre),
      |st AS (SELECT CAST(-v AS BIGINT) AS thr,
      |         CAST(cum_p AS BIGINT) AS tp,
      |         CAST(cum_c - cum_p AS BIGINT) AS fp,
      |         CAST(n_p - cum_p AS BIGINT) AS fn,
      |         CAST(n_all - n_p - cum_c + cum_p AS BIGINT) AS tn,
      |         n_p, n_all,
      |         CAST(2 * cum_p * 1000000
      |           // (2 * cum_p + (cum_c - cum_p) + (n_p - cum_p))
      |           AS BIGINT) AS f1_e6
      |       FROM pre CROSS JOIN tot),
      |b AS (SELECT CAST(max(f1_e6) AS BIGINT) AS f1_best FROM st),
      |w AS (SELECT * FROM st CROSS JOIN b WHERE f1_e6 = f1_best),
      |tb AS (SELECT CAST(max(thr) AS BIGINT) AS thr_best FROM w)
      |SELECT thr, tp, fp, fn, tn,
      |  tp * 1000000 // (tp + fp) AS prec_e6,
      |  CASE WHEN n_p > 0 THEN tp * 1000000 // n_p END AS rec_e6,
      |  CASE WHEN n_p > 0 THEN f1_e6 END AS f1_e6,
      |  CASE WHEN n_p > 0 AND n_p < n_all
      |        AND sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
      |                 * (tn + fp) * (tn + fn)) > 0
      |    THEN CAST(round(
      |      CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
      |        AS DOUBLE)
      |      / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
      |             * (tn + fp) * (tn + fn)) * 1000000) AS BIGINT)
      |  END AS mcc_e6
      |FROM w CROSS JOIN tb WHERE thr = thr_best""".stripMargin

  /** q309 — decile lift table ([[graft.stats.MlEval.liftTable]]) of
    * the same score/label pair: positives' concentration in the top
    * score bands, exact equal-count buckets (ties by doc_id), lift
    * and cumulative capture as integer-div micros. The oracle is the
    * naive single-window form — the grid decomposition is
    * hash-pinned to it. */
  private def q309(s: SparkSession, dir: String): DataFrame =
    graft.stats.MlEval.liftTable(
      t(s, dir, "documents")
        .select(col("doc_id"),
                size(split(trim(col("text")), " ")).as("s"),
                (col("n_chars") >= 300L).cast("long").as("y")),
      "s", "y", "doc_id", nBuckets = 10)

  private val q309Sql =
    """WITH o AS (
      |  SELECT doc_id, len(string_split(trim(text), ' ')) AS s,
      |         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |rk AS (SELECT *,
      |         row_number() OVER (ORDER BY s DESC, doc_id) - 1 AS r0,
      |         CAST(count(*) OVER () AS BIGINT) AS n_total
      |       FROM o),
      |bk AS (SELECT *, (r0 * 10) // n_total + 1 AS bucket FROM rk),
      |pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(y) AS BIGINT) AS n_pos,
      |         CAST(max(n_total) AS BIGINT) AS n_total
      |       FROM bk GROUP BY 1),
      |tt AS (SELECT CAST(sum(n_pos) AS BIGINT) AS pos_total FROM pb),
      |cm AS (SELECT *,
      |         CAST(sum(n_pos) OVER (ORDER BY bucket) AS BIGINT)
      |           AS cum_pos
      |       FROM pb)
      |SELECT CAST(bucket AS BIGINT) AS bucket, n, n_pos,
      |  n_pos * 1000000 // n AS rate_e6,
      |  CAST(CASE WHEN pos_total > 0 THEN
      |    CAST(n_pos AS HUGEINT) * n_total * 1000000
      |    // (CAST(n AS HUGEINT) * pos_total) END AS BIGINT) AS lift_e6,
      |  CASE WHEN pos_total > 0 THEN cum_pos * 1000000 // pos_total END
      |    AS cum_capture_e6
      |FROM cm CROSS JOIN tt""".stripMargin

  /** q314 — vocabulary richness ([[graft.pipeline.VocabStats
    * .vocabRichness]]): Good–Turing unseen mass n₁/N and
    * bias-corrected Chao1 — how much of the next document is
    * never-seen tokens, and how many types the corpus still hides.
    * All exact counting + two truncating divisions. */
  private def q314(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.VocabStats.vocabRichness(
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= ""),
      "tok")

  private val q314Sql =
    """WITH tk AS (
      |  SELECT unnest(string_split(trim(text), ' ')) AS t
      |  FROM documents),
      |ct AS (SELECT t, CAST(count(*) AS BIGINT) AS c
      |       FROM tk WHERE t <> '' GROUP BY 1),
      |ag AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
      |         CAST(count(*) AS BIGINT) AS v_types,
      |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n1,
      |         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n2
      |       FROM ct)
      |SELECT n_tokens, v_types, n1, n2,
      |  n1 * 1000000 // n_tokens AS unseen_mass_e6,
      |  v_types * 100 + CAST(CAST(n1 AS HUGEINT) * (n1 - 1) * 100
      |    // (2 * (n2 + 1)) AS BIGINT) AS chao1_e2
      |FROM ag""".stripMargin

  /** q315 — Heaps' law curve ([[graft.pipeline.VocabStats
    * .heapsCurve]]): vocabulary size at 10 equal-count document
    * checkpoints plus the fitted growth exponent — does the corpus
    * keep paying new types, or has dedup/scraping saturated it? The
    * oracle is the naive single-window replay of the same grid. */
  private def q315(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.VocabStats.heapsCurve(
      t(s, dir, "documents")
        .select(col("doc_id"),
                explode(split(trim(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= ""),
      "doc_id", "tok", nBuckets = 10)

  private val q315Sql =
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t
      |  FROM documents),
      |tk2 AS (SELECT doc_id, t FROM tk WHERE t <> ''),
      |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS t_c
      |       FROM tk2 GROUP BY 1),
      |fv AS (SELECT d AS doc_id, CAST(count(*) AS BIGINT) AS v_c
      |       FROM (SELECT t, min(doc_id) AS d FROM tk2 GROUP BY 1)
      |       GROUP BY 1),
      |g AS (SELECT pd.doc_id, t_c, coalesce(v_c, 0) AS v_c
      |      FROM pd LEFT JOIN fv USING (doc_id)),
      |w AS (SELECT doc_id,
      |        CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS pos,
      |        CAST(sum(t_c) OVER (ORDER BY doc_id) AS BIGINT) AS ctk,
      |        CAST(sum(v_c) OVER (ORDER BY doc_id) AS BIGINT) AS cv,
      |        CAST(count(*) OVER () AS BIGINT) AS n
      |      FROM g),
      |b AS (SELECT ((pos - 1) * 10) // n + 1 AS bucket, pos, ctk, cv
      |      FROM w),
      |pb AS (SELECT CAST(bucket AS BIGINT) AS bucket,
      |         CAST(max(pos) AS BIGINT) AS docs_cum,
      |         CAST(max_by(ctk, pos) AS BIGINT) AS tokens_cum,
      |         CAST(max_by(cv, pos) AS BIGINT) AS types_cum
      |       FROM b GROUP BY 1),
      |pt AS (SELECT *,
      |         CAST(round(ln(CAST(tokens_cum AS DOUBLE)) * 1000000.0)
      |              AS BIGINT) AS x,
      |         CAST(round(ln(CAST(types_cum AS DOUBLE)) * 1000000.0)
      |              AS BIGINT) AS yl
      |       FROM pb),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS m,
      |         CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(sum(yl) AS BIGINT) AS sy,
      |         sum(CAST(x AS HUGEINT) * x) AS sxx,
      |         sum(CAST(x AS HUGEINT) * yl) AS sxy
      |       FROM pt),
      |hh AS (SELECT CASE WHEN m >= 2 AND CAST(m AS HUGEINT) * sxx
      |                - CAST(sx AS HUGEINT) * sx <> 0 THEN
      |         CAST(round(CAST(CAST(m AS HUGEINT) * sxy
      |             - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |           / CAST(CAST(m AS HUGEINT) * sxx
      |             - CAST(sx AS HUGEINT) * sx AS DOUBLE)
      |           * 1000000.0) AS BIGINT) END AS beta_e6
      |       FROM ag)
      |SELECT bucket, docs_cum, tokens_cum, types_cum, beta_e6
      |FROM pb CROSS JOIN hh""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q314_vocab_richness", q314, Some(q314Sql)),
    QueryDef("q315_heaps_law", q315, Some(q315Sql)),
    QueryDef("q308_auc_exact", q308, Some(q308Sql)),
    QueryDef("q309_lift_table", q309, Some(q309Sql)),
    QueryDef("q319_mcnemar", q319, Some(q319Sql)),
    QueryDef("q320_avg_precision", q320, Some(q320Sql)),
    QueryDef("q321_cochran_q", q321, Some(q321Sql)),
    QueryDef("q339_g_test", q339, Some(q339Sql)),
    QueryDef("q324_calibration", q324, Some(q324Sql)),
    QueryDef("q325_f1_sweep", q325, Some(q325Sql)),
    QueryDef("q306_jensen_shannon", q306, Some(q306Sql)),
    QueryDef("q307_cohen_kappa", q307, Some(q307Sql)),
    QueryDef("q273_naive_bayes", q273, Some(q273Sql)),
    QueryDef("q274_gini_stump", q274, Some(q274Sql)),
    QueryDef("q276_fuzzy_linkage", q276, Some(q276Sql)),
    QueryDef("q277_rm3_expansion", q277, Some(q277Sql)),
    QueryDef("q281_rake_phrases", q281, Some(q281Sql)),
    QueryDef("q286_proximity_search", q286, Some(q286Sql)),
    QueryDef("q266_unigram_lm", q266, Some(q266Sql)),
    QueryDef("q265_phrase_search", q265, Some(q265Sql)),
    QueryDef("q181_winnow_fps", q181, Some(q181Sql)),
    QueryDef("q182_winnow_clones", q182, Some(q182Sql)),
    QueryDef("q183_char_stats", q183, Some(q183Sql)),
    QueryDef("q184_edit_confirm", q184, Some(q184Sql)),
    QueryDef("q188_collocations", q188, Some(q188Sql)),
    QueryDef("q173_snapshot_diff", q173, Some(q173Sql)),
    QueryDef("q175_taint_propagation", q175, Some(q175Sql)),
    QueryDef("q177_script_profile", q177, Some(q177Sql)),
    QueryDef("q178_snapshot_novelty", q178, Some(q178Sql)),
    QueryDef("q179_quality_calibration", q179, Some(q179Sql)),
    QueryDef("q180_novelty_gate", q180, Some(q180Sql)),
    QueryDef("q174_padding_buckets", q174, Some(q174Sql)),
    QueryDef("q50_token_stats", q50, Some(q50Sql)),
    QueryDef("q51_quality_score", q51, Some(q51Sql)),
    QueryDef("q52_language_id", q52, Some(q52Sql)),
    QueryDef("q53_fingerprint", q53, Some(q53Sql)),
    QueryDef("q54_dedup_exact", q54, Some(q54Sql)),
    QueryDef("q55_minhash_signature", q55, Some(q55Sql)),
    QueryDef("q56_lsh_near_dup", q56, Some(q56Sql)),
    QueryDef("q57_near_dup_topk", q57, Some(q57Sql)),
    QueryDef("q58_simhash", q58, Some(q58Sql)),
    QueryDef("q66_dup_clusters", q66, Some(q66Sql)),
    QueryDef("q67_bpe_pretokens", q67, Some(q67Sql)),
    QueryDef("q69_rolling_fingerprint", q69, Some(q69Sql)),
    QueryDef("q72_cdc_chunks", q72, Some(q72Sql)),
    QueryDef("q73_chunk_dedup", q73, Some(q73Sql)),
    QueryDef("q75_dataset_split", q75, Some(q75Sql)),
    QueryDef("q77_simhash64_neardup", q77, Some(q77Sql)),
    QueryDef("q78_dup_clusters_pj", q78, Some(q66Sql)),
    QueryDef("q80_dedup_corpus", q80, Some(q80Sql)),
    QueryDef("q147_keeper_by_quality", q147, Some(q147Sql)),
    QueryDef("q155_curate_semantic", q155, Some(q155Sql)),
    QueryDef("q81_bm25_topk", q81, Some(q81Sql)),
    QueryDef("q82_curate_corpus", q82, Some(q82Sql)),
    QueryDef("q83_contamination", q83, Some(q83Sql)),
    QueryDef("q84_repetition", q84, Some(q84Sql)),
    QueryDef("q85_simhash128_neardup", q85, Some(q85Sql)),
    QueryDef("q90_multibyte_cdc", q90, Some(q90Sql)),
    QueryDef("q91_multibyte_textstats", q91, Some(q91Sql)),
    QueryDef("q92_multibyte_pretokens", q92, Some(q92Sql)),
    QueryDef("q99_leakage_safe_split", q99, Some(q99Sql)),
    QueryDef("q102_pii_redaction", q102, Some(q102Sql)),
    QueryDef("q103_mixture_resample", q103, Some(q103Sql)),
    QueryDef("q104_sequence_packing", q104, Some(q104Sql)),
    QueryDef("q105_span_dedup", q105, Some(q105Sql)),
    QueryDef("q106_incremental_dedup", q106, Some(q106Sql)),
    QueryDef("q107_vocabulary", q107, Some(q107Sql)),
    QueryDef("q109_quality_rules", q109, Some(q109Sql)),
    QueryDef("q110_tfidf_topk", q110, Some(q110Sql)),
    QueryDef("q111_shuffle_shards", q111, Some(q111Sql)),
    QueryDef("q112_lm_surprisal", q112, Some(q112Sql)),
    QueryDef("q113_encode_tokens", q113, Some(q113Sql)),
    QueryDef("q114_corpus_report", q114, Some(q114Sql)),
    QueryDef("q115_dsir_weights", q115, Some(q115Sql)),
    QueryDef("q160_dsir_resample", q160, Some(q160Sql)),
    QueryDef("q117_materialize_packs", q117, Some(q117Sql)),
    QueryDef("q118_bpe_merges", q118, Some(q118Sql)),
    QueryDef("q119_bpe_segment", q119, Some(q119Sql)),
    QueryDef("q120_bpe_packs", q120, Some(q120Sql)),
    QueryDef("q145_bpe_roundtrip", q145, Some(q145Sql)),
    QueryDef("q150_bpe_bytes_segment", q150, Some(q150Sql)),
    QueryDef("q151_bpe_bytes_roundtrip", q151, Some(q151Sql)),
    QueryDef("q153_tokenizer_fertility", q153, Some(q153Sql)),
    QueryDef("q121_span_removal", q121, Some(q121Sql)),
    QueryDef("q122_kn_perplexity", q122, Some(q122Sql)),
    QueryDef("q123_chunk_windows", q123, Some(q123Sql)),
    QueryDef("q124_distill_classifier", q124, Some(q124Sql)),
    QueryDef("q125_token_budget", q125, Some(q125Sql)),
    QueryDef("q126_pack_curriculum", q126, Some(q126Sql)),
    QueryDef("q134_nfc_normalize", q134, Some(q134Sql)),
    QueryDef("q136_bpe_batched", q136, Some(q136Sql)),
    QueryDef("q137_bpe_bytes", q137, Some(q137Sql)),
    QueryDef("q157_line_dedup", q157, Some(q157Sql)),
    QueryDef("q158_containment_dedup", q158, Some(q158Sql)),
    QueryDef("q159_lsh_band_plan", q159, Some(q159Sql)),
    QueryDef("q161_source_quota_cap", q161, Some(q161Sql)),
    QueryDef("q162_normalized_dedup", q162, Some(q162Sql)),
    QueryDef("q163_perplexity_buckets", q163, Some(q163Sql)),
    QueryDef("q168_source_divergence", q168, Some(q168Sql)),
    QueryDef("q169_zipf_fit", q169, Some(q169Sql)),
    QueryDef("q170_source_overlap", q170, Some(q170Sql)),
    QueryDef("q218_jaccard_join", q218, Some(q218Sql))
  )

}
