package graft.queries

import graft.QueryDef
import graft.pipeline.CorpusSketch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-statistics family ([[graft.pipeline.CorpusSketch]]): the
  * fixed-size mergeable summaries a 100 TB curation run uses instead of
  * exact distinct/vocabulary/percentile shuffles. Each oracle replays the
  * FULL sketch algorithm in DuckDB — hash construction, register max,
  * counter min, integer CDF ranks — so the compare checks the sketch
  * arithmetic itself, not just row counts. The exact answers ride along
  * in the same result precisely so the driver can see sketch-vs-truth.
  *
  * Oracle hash parsing: `pow(16, j)` is exact in a double only to
  * `16^13`, so the 15-hex-char 60-bit parse SHIFTS (`<< 4(15-j)`)
  * instead of multiplying; the 8-char 32-bit parse could use either and
  * shifts for symmetry. */
object SketchQueries {

  /** DuckDB replay of [[CorpusSketch.h60]]/[[CorpusSketch.h32]]: hex
    * digits of md5 folded with 4-bit shifts (exact integer arithmetic). */
  private def hexSql(mdExpr: String, chars: Int): String =
    s"""CAST(list_sum(list_transform(generate_series(1, $chars),
      |  j -> (CAST(instr('0123456789abcdef', substr($mdExpr, j, 1)) - 1 AS BIGINT)
      |        << (4 * ($chars - j))))) AS BIGINT)""".stripMargin

  /** q94 — HyperLogLog distinct texts per source (p=10, m=1024
    * registers, 60-bit hash), next to the exact distinct count. The
    * oracle recomputes every register (bucket = top 10 hash bits,
    * rho = 1 + leading zeros of the low 50 via `length(bin(..))`), the
    * exact integer harmonic denominator `sum_scaled`, and the corrected
    * estimate with the identical IEEE expression order. At sf0.01 every
    * source sits in linear-counting range (n ≪ m) — the correction
    * branch is what runs, and it lands within ~2% of truth, which the
    * spec asserts; the raw branch is exercised by the spec's 50k-distinct
    * synthetic corpus. */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("text")).as("n_exact"))
    exact.join(CorpusSketch.hllSketch(docs, "source", "text"), Seq("source"))
      .select(col("source"), col("n_exact"), col("v_empty"),
              col("sum_scaled"), col("est"))
  }

  private val q94Sql = {
    val h = hexSql("md5('hll' || text)", 15)
    s"""WITH h AS (SELECT source, text, $h AS h FROM documents),
      |b AS (SELECT source, text, h >> 50 AS bucket,
      |             h & ((1::BIGINT << 50) - 1) AS rem FROM h),
      |r AS (SELECT source, bucket,
      |             MAX(CASE WHEN rem = 0 THEN 51
      |                      ELSE 51 - length(bin(rem)) END) AS rho
      |      FROM b GROUP BY 1, 2),
      |a AS (SELECT source, COUNT(*) AS occupied,
      |             SUM(1::BIGINT << (51 - rho)) AS occ_scaled
      |      FROM r GROUP BY 1),
      |sc AS (SELECT source,
      |              CAST(1024 - occupied AS BIGINT) AS v_empty,
      |              CAST(occ_scaled + (1024 - occupied) * (1::BIGINT << 51)
      |                   AS BIGINT) AS sum_scaled
      |       FROM a),
      |e AS (SELECT source, v_empty, sum_scaled,
      |             0.7213 / (1.0 + 1.079 / 1024) * 1048576.0
      |               * 2251799813685248.0 / sum_scaled AS est_raw
      |      FROM sc),
      |x AS (SELECT source, COUNT(DISTINCT text) AS n_exact
      |      FROM documents GROUP BY 1)
      |SELECT x.source, CAST(x.n_exact AS BIGINT) AS n_exact, e.v_empty,
      |       e.sum_scaled,
      |       round(CASE WHEN est_raw <= 2560.0 AND v_empty > 0
      |                  THEN 1024.0 * ln(1024.0 / v_empty)
      |                  ELSE est_raw END, 2) AS est
      |FROM x JOIN e USING (source)""".stripMargin
  }

  /** q95 — count-min heavy hitters over the whitespace token stream
    * (d=4 rows × w=1024 buckets, exact top-20 candidates): every number
    * is an integer, so the compare is exact — including the sketch's
    * one-sided error (cms_c ≥ exact_c always, which the spec asserts as
    * a property). */
  private def q95(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(explode(split(trim(col("text")), " ")).as("token"))
    CorpusSketch.cmsHeavyHitters(tok, "token")
  }

  private val q95Sql = {
    val hTok = hexSql("md5('cms' || j || ':' || token)", 8)
    s"""WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS token
      |             FROM documents),
      |js AS (SELECT unnest(generate_series(0, 3)) AS j),
      |cells AS (SELECT j, $hTok % 1024 AS bucket FROM tok, js),
      |cnt AS (SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS c
      |        FROM cells GROUP BY 1, 2),
      |ex AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_c
      |       FROM tok GROUP BY 1),
      |top AS (SELECT token, exact_c FROM ex
      |        ORDER BY exact_c DESC, token LIMIT 20),
      |tb AS (SELECT token, exact_c, j, $hTok % 1024 AS bucket
      |       FROM top, js)
      |SELECT tb.token, tb.exact_c, CAST(MIN(c.c) AS BIGINT) AS cms_c
      |FROM tb JOIN cnt c USING (j, bucket)
      |GROUP BY 1, 2""".stripMargin
  }

  /** q96 — deterministic stratified sampling: downsample the dominant
    * language (en → 12%), boost zh to 80%, 60% elsewhere, keyed on
    * h32(lang|doc_id) mod 1e6 — a pure filter, no shuffle, and the SAME
    * rows keep/drop on both engines (the checksum column proves the
    * exact membership, not just the counts). */
  private def q96(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val kept = CorpusSketch.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 120000L, "zh" -> 800000L), 600000L)
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      .join(kept.groupBy(col("lang"))
              .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum")),
            Seq("lang"), "left")
      .na.fill(0L, Seq("n_kept", "kept_id_sum"))
  }

  private val q96Sql = {
    val h = hexSql("md5('strat' || lang || '|' || doc_id)", 8)
    s"""WITH p AS (SELECT lang, doc_id, $h % 1000000 AS point FROM documents),
      |k AS (SELECT lang, doc_id FROM p
      |      WHERE point < CASE lang WHEN 'en' THEN 120000
      |                              WHEN 'zh' THEN 800000
      |                              ELSE 600000 END),
      |tt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total
      |       FROM documents GROUP BY 1),
      |kk AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |              CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
      |       FROM k GROUP BY 1)
      |SELECT tt.lang, tt.n_total,
      |       CAST(COALESCE(kk.n_kept, 0) AS BIGINT) AS n_kept,
      |       CAST(COALESCE(kk.kept_id_sum, 0) AS BIGINT) AS kept_id_sum
      |FROM tt LEFT JOIN kk USING (lang)""".stripMargin
  }

  /** q97 — histogram quantiles of document length per language
    * (binWidth 64, p50/p90/p99): integer bin counts → windowed CDF →
    * integer ceil-rank, estimate = lower edge of the covering bin. The
    * spec asserts |est − exact percentile| ≤ binWidth; the oracle
    * asserts the binned arithmetic itself. */
  private def q97(s: SparkSession, dir: String): DataFrame =
    CorpusSketch.histogramQuantiles(t(s, dir, "documents"),
                                    "lang", "n_chars", 64L, Seq(50, 90, 99))

  private val q97Sql =
    """WITH b AS (SELECT lang, n_chars // 64 AS bin,
      |                  CAST(COUNT(*) AS BIGINT) AS c
      |           FROM documents GROUP BY 1, 2),
      |w AS (SELECT lang, bin, c,
      |        SUM(c) OVER (PARTITION BY lang ORDER BY bin
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        SUM(c) OVER (PARTITION BY lang) AS n
      |      FROM b),
      |qq AS (SELECT unnest([50, 90, 99]) AS q_pct),
      |f AS (SELECT lang, q_pct, CAST(n AS BIGINT) AS n, bin, cum,
      |             (n * q_pct + 99) // 100 AS rank
      |      FROM w, qq)
      |SELECT lang, q_pct, n, CAST(MIN(bin) * 64 AS BIGINT) AS est
      |FROM f WHERE cum >= rank GROUP BY 1, 2, 3""".stripMargin

  /** q98 — deterministic exact-size sample: the 10 smallest-hash docs
    * per language, through the 50% prefilter scale path (the window
    * sorts half the corpus, provably without changing the answer while
    * every stratum keeps ≥ 10 survivors — which the spec asserts
    * against the unfiltered form). Every emitted value is an integer. */
  private def q98(s: SparkSession, dir: String): DataFrame =
    CorpusSketch.stratumTopK(t(s, dir, "documents"), "lang", "doc_id", 10,
                             prefilterPpm = Some(500000L))
      .select(col("lang"), col("doc_id"), col("point"), col("rank"))

  private val q98Sql = {
    val h = hexSql("md5('strat' || lang || '|' || doc_id)", 8)
    s"""WITH p AS (SELECT lang, doc_id, $h % 1000000 AS point FROM documents),
      |f AS (SELECT * FROM p WHERE point < 500000),
      |r AS (SELECT lang, doc_id, point,
      |        CAST(row_number() OVER (PARTITION BY lang
      |                                ORDER BY point, doc_id) AS BIGINT) AS rank
      |      FROM f)
      |SELECT lang, doc_id, point, rank FROM r WHERE rank <= 10""".stripMargin
  }

  /** q116 — Bloom-filter seen-set ([[CorpusSketch.bloomBits]] /
    * [[CorpusSketch.bloomProbe]]): the membership sketch probed by the
    * q106 ingest split (existing corpus = doc_id % 5 ≠ 0 builds the
    * filter; the batch probes it). Every tenth batch doc REUSES an
    * existing doc's text (the planted true positive — no-false-negative
    * branch), the rest are fresh (the definitely-new branch, with the
    * filter's ~m/k-load FP rate riding along). The oracle replays the
    * exact bits: 3 salted-md5 hash points per key mod 4096, distinct
    * set-bit frame, per-key hit conjunction. */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val existing = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val bits = CorpusSketch.bloomBits(existing, "text")
    val borrow = docs.select(col("doc_id").as("src_id"), col("text").as("src_text"))
    val probe = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .join(borrow, col("src_id") === col("doc_id") + 1, "left")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 0 && col("src_text").isNotNull,
             col("src_text")).otherwise(col("text")).as("text"))
    CorpusSketch.bloomProbe(probe, "doc_id", "text", bits)
  }

  private val q116Sql = {
    val bit =
      s"${hexSql("md5('bloom|' || CAST(jj.j AS VARCHAR) || '|' || text)", 8)} % 4096"
    s"""WITH jz AS (SELECT unnest(generate_series(0, 2)) AS j),
      |bits AS (SELECT DISTINCT $bit AS b
      |         FROM documents, jz jj WHERE doc_id % 5 <> 0),
      |pr AS (SELECT b.doc_id,
      |         CASE WHEN b.doc_id % 10 = 0 AND e.text IS NOT NULL
      |              THEN e.text ELSE b.text END AS text
      |       FROM documents b LEFT JOIN documents e ON e.doc_id = b.doc_id + 1
      |       WHERE b.doc_id % 5 = 0),
      |pb AS (SELECT doc_id, $bit AS bit FROM pr, jz jj),
      |hits AS (SELECT pb.doc_id,
      |           sum(CASE WHEN bits.b IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
      |         FROM pb LEFT JOIN bits ON bits.b = pb.bit GROUP BY 1)
      |SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
      |       CAST(CASE WHEN n_hits = 3 THEN 1 ELSE 0 END AS BIGINT) AS maybe_seen
      |FROM hits""".stripMargin
  }

  /** q194 — sequential Poisson weighted sampling
    * ([[graft.pipeline.CorpusSketch.seqPoissonSample]], Ohlsson
    * 1998): 25 documents per language, inclusion probability ∝
    * n_chars, priority = ((point+1)·1e9) div weight on the exact
    * integer grid. The oracle recomputes the hash point, the
    * priority, and the per-stratum rank window on the identical
    * (priority, doc_id) order — exact-membership check, not a
    * statistics-only one. */
  private def q194(s: SparkSession, dir: String): DataFrame =
    CorpusSketch.seqPoissonSample(
      t(s, dir, "documents").select(col("lang"), col("doc_id"), col("n_chars")),
      "lang", "doc_id", "n_chars", k = 25)

  private val q194Sql = {
    val h = hexSql("md5('seqpois' || lang || '|' || doc_id)", 8)
    s"""WITH p AS (SELECT lang, doc_id, n_chars,
      |             ((($h % 1000000) + 1) * 1000000000) // n_chars AS priority
      |           FROM documents WHERE n_chars > 0),
      |r AS (SELECT lang, doc_id, n_chars, priority,
      |        CAST(row_number() OVER (PARTITION BY lang
      |             ORDER BY priority, doc_id) AS BIGINT) AS rank
      |      FROM p)
      |SELECT lang, doc_id, n_chars, priority, rank
      |FROM r WHERE rank <= 25""".stripMargin
  }

  /** q200 — table checksum ([[graft.streaming.StreamOps
    * .streamingChecksum]] on the static frame — the SAME function
    * serves batch and stream): per language, row count, character
    * total, and the order-independent 60-bit XOR digest of every
    * document hash — the replication-audit primitive (two copies of
    * a partition disagree ⇒ digests differ; XOR distributes
    * perfectly over partials, so the check costs one
    * map-side-combined aggregate at any scale). */
  private def q200(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.streamingChecksum(
      t(s, dir, "documents"), "lang", "text", "n_chars")

  private val q200Sql = {
    val h = hexSql("md5('ck' || text)", 15)
    s"""WITH h AS (SELECT lang, n_chars, $h AS h FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(bit_xor(h) AS BIGINT) AS xor60
      |FROM h GROUP BY 1""".stripMargin
  }

  /** q202 — HLL rolling distinct users over a trailing 7-day window
    * ([[CorpusSketch.hllRollingDistinct]]): the mergeability payoff —
    * per-day registers + a per-bucket running max replace any
    * re-scan of raw values per window position. The oracle replays
    * registers, the dense day×bucket grid, the RANGE-frame max, and
    * the q94 estimate chain. */
  private def q202(s: SparkSession, dir: String): DataFrame =
    CorpusSketch.hllRollingDistinct(
      t(s, dir, "events").select(dayBucket(col("ts")).as("d"), col("user_id")),
      "d", "user_id", windowDays = 7)

  private val q202Sql = {
    val h = hexSql("md5('hll' || user_id)", 15)
    s"""WITH h AS (SELECT CAST(date_trunc('day', ts) AS DATE)
      |                   - DATE '1970-01-01' AS di,
      |                   $h AS h FROM events),
      |b AS (SELECT di, h >> 50 AS bucket,
      |             h & ((1::BIGINT << 50) - 1) AS rem FROM h),
      |r AS (SELECT di, bucket,
      |             MAX(CASE WHEN rem = 0 THEN 51
      |                      ELSE 51 - length(bin(rem)) END) AS rho
      |      FROM b GROUP BY 1, 2),
      |days AS (SELECT DISTINCT di FROM h),
      |grid AS (SELECT di, CAST(unnest(generate_series(0, 1023)) AS BIGINT)
      |                    AS bucket FROM days),
      |g2 AS (SELECT grid.di, grid.bucket, r.rho
      |       FROM grid LEFT JOIN r USING (di, bucket)),
      |rolled AS (SELECT di, bucket,
      |             max(rho) OVER (PARTITION BY bucket ORDER BY di
      |               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rho
      |           FROM g2),
      |f AS (SELECT di, bucket, rho FROM rolled WHERE rho IS NOT NULL),
      |a AS (SELECT di, COUNT(*) AS occupied,
      |             SUM(1::BIGINT << (51 - rho)) AS occ_scaled
      |      FROM f GROUP BY 1),
      |sc AS (SELECT di, CAST(1024 - occupied AS BIGINT) AS v_empty,
      |              CAST(occ_scaled + (1024 - occupied) * (1::BIGINT << 51)
      |                   AS BIGINT) AS sum_scaled
      |       FROM a),
      |e AS (SELECT di, v_empty, sum_scaled,
      |             0.7213 / (1.0 + 1.079 / 1024) * 1048576.0
      |               * 2251799813685248.0 / sum_scaled AS est_raw
      |      FROM sc)
      |SELECT CAST(DATE '1970-01-01' + CAST(di AS INTEGER) AS DATE) AS d,
      |       v_empty, sum_scaled,
      |       round(CASE WHEN est_raw <= 2560.0 AND v_empty > 0
      |                  THEN 1024.0 * ln(1024.0 / v_empty)
      |                  ELSE est_raw END, 2) AS est
      |FROM e""".stripMargin
  }

  /** q206 — Merkle bucket audit ([[graft.pipeline.Snapshot
    * .merkleDiff]], 8192 buckets): which hash-partitions of the
    * corpus differ between v1 and the q173 mutated snapshot —
    * comparing two 100 TB replicas moves O(buckets) digest rows and
    * localizes re-scans to n/buckets rows per suspect. The oracle
    * recomputes both digest frames (order-independent bit_xor of
    * h60(id|text)) and the full-outer differ. */
  private def q206(s: SparkSession, dir: String): DataFrame = {
    val v1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
    graft.pipeline.Snapshot.merkleDiff(v1, TextQueries.snapshotV2(v1),
      "doc_id", "text", nBuckets = 8192)
  }

  private val q206Sql = {
    val hb = hexSql("md5('mkb' || doc_id)", 15)
    val hh = hexSql("md5('mk' || doc_id || '|' || text)", 15)
    def side(src: String, suffix: String) =
      s"""SELECT $hb % 8192 AS bucket, CAST(count(*) AS BIGINT) AS n_$suffix,
        |       CAST(bit_xor($hh) AS BIGINT) AS digest_$suffix
        |FROM $src GROUP BY 1""".stripMargin
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
      |${TextQueries.snapshotV2Cte},
      |da AS (${side("v1", "a")}),
      |db AS (${side("v2", "b")})
      |SELECT COALESCE(da.bucket, db.bucket) AS bucket,
      |       COALESCE(da.n_a, 0) AS n_a, COALESCE(db.n_b, 0) AS n_b,
      |       COALESCE(da.digest_a, 0) AS digest_a,
      |       COALESCE(db.digest_b, 0) AS digest_b
      |FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
      |WHERE COALESCE(da.n_a, 0) <> COALESCE(db.n_b, 0)
      |   OR COALESCE(da.digest_a, 0) <> COALESCE(db.digest_b, 0)""".stripMargin
  }

  /** q216 — EXACT per-group percentiles ([[CorpusSketch
    * .exactPercentiles]]): p50/p90/p99 of document length per
    * language via the value-grid decomposition — the exact twin of
    * q97's binned estimates (the window sorts distinct VALUES, not
    * documents). The oracle replays the grid, the cumulative
    * windows, and the ceil-rank cover filter. */
  private def q216(s: SparkSession, dir: String): DataFrame =
    CorpusSketch.exactPercentiles(t(s, dir, "documents"),
      "lang", "n_chars", Seq(50, 90, 99))

  private val q216Sql =
    """WITH g AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM documents GROUP BY 1, 2),
      |w AS (SELECT lang, v, c,
      |        sum(c) OVER (PARTITION BY lang ORDER BY v
      |                     ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY lang) AS n
      |      FROM g),
      |x AS (SELECT lang, v, c, cum, n,
      |             unnest([CAST(50 AS BIGINT), CAST(90 AS BIGINT),
      |                     CAST(99 AS BIGINT)]) AS q_pct
      |      FROM w)
      |SELECT lang, q_pct, CAST(n AS BIGINT) AS n, v AS exact
      |FROM x
      |WHERE cum - c < (n * q_pct + 99) // 100
      |  AND (n * q_pct + 99) // 100 <= cum""".stripMargin

  /** q236 — winsorized mean per event type: cents values clipped to
    * the exact p05/p95 grid percentiles ([[CorpusSketch
    * .exactPercentiles]] — the q216 cover rule), then the robust
    * mean on exact integers (sum of clipped longs, div count) — the
    * outlier-proof center a metrics pipeline reports instead of the
    * raw mean. Clipping is a pure projection after one
    * attribute-sized percentile join; nothing beyond q216's
    * grid-sized windows sorts anything. */
  private def q236(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "events")
      .select(col("event_type"), cents(col("value")).as("v"))
    val pcts = CorpusSketch.exactPercentiles(vals, "event_type", "v",
        Seq(5, 95))
      .groupBy(col("event_type"))
      .agg(max(when(col("q_pct") === 5L, col("exact"))).as("p05"),
           max(when(col("q_pct") === 95L, col("exact"))).as("p95"))
    vals.join(pcts, Seq("event_type"))
      .select(col("event_type"), col("p05"), col("p95"),
              greatest(col("p05"), least(col("p95"), col("v"))).as("w"))
      .groupBy(col("event_type"), col("p05"), col("p95"))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("wsum_c"))
      .select(col("event_type"), col("n"), col("p05"), col("p95"),
              col("wsum_c"), expr("wsum_c div n").as("wmean_c"))
  }

  private val q236Sql =
    """WITH vals AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v
      |              FROM events),
      |g AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
      |      FROM vals GROUP BY 1, 2),
      |w AS (SELECT event_type, v, c,
      |        sum(c) OVER (PARTITION BY event_type ORDER BY v
      |                     ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY event_type) AS n
      |      FROM g),
      |x AS (SELECT event_type, v, c, cum, n,
      |             unnest([CAST(5 AS BIGINT), CAST(95 AS BIGINT)]) AS q_pct
      |      FROM w),
      |pct AS (SELECT event_type,
      |          max(CASE WHEN q_pct = 5 THEN v END) AS p05,
      |          max(CASE WHEN q_pct = 95 THEN v END) AS p95
      |        FROM x
      |        WHERE cum - c < (n * q_pct + 99) // 100
      |          AND (n * q_pct + 99) // 100 <= cum
      |        GROUP BY 1)
      |SELECT vals.event_type, CAST(count(*) AS BIGINT) AS n, p05, p95,
      |       CAST(sum(greatest(p05, least(p95, v))) AS BIGINT) AS wsum_c,
      |       CAST(sum(greatest(p05, least(p95, v))) AS BIGINT)
      |         // CAST(count(*) AS BIGINT) AS wmean_c
      |FROM vals JOIN pct ON pct.event_type = vals.event_type
      |GROUP BY 1, p05, p95""".stripMargin

  /** q237 — cross-source quantile normalization
    * ([[graft.stats.Normalize.quantileNormalize]]): every source's
    * document-length distribution mapped onto the POOLED corpus
    * distribution by exact integer percentile matching (ceil-rank
    * r of n_g → pooled ceil-rank (r·n_tot+n_g−1) div n_g) — the
    * batch-effect remover that makes per-source scores comparable
    * before a corpus-mix cut. The rank→value lookup is the
    * bucketized cover-interval range join (q165's machinery), never
    * a nested loop; the oracle computes the same lookup as a naive
    * inequality join, hash-pinning the decomposition. */
  private def q237(s: SparkSession, dir: String): DataFrame =
    graft.stats.Normalize.quantileNormalize(
      t(s, dir, "documents").select(col("source"), col("n_chars")),
      "source", "n_chars")

  private val q237Sql =
    """WITH r AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v
      |           FROM documents),
      |sg AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
      |       FROM r GROUP BY 1, 2),
      |ng AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_g FROM sg GROUP BY 1),
      |src AS (SELECT sg.grp, v, c,
      |          CAST(sum(c) OVER (PARTITION BY sg.grp ORDER BY v
      |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, n_g
      |        FROM sg JOIN ng ON ng.grp = sg.grp),
      |pg AS (SELECT v, CAST(count(*) AS BIGINT) AS c_all FROM r GROUP BY 1),
      |nt AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_tot FROM pg),
      |pool AS (SELECT v AS norm_v,
      |           CAST(sum(c_all) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |             - c_all + 1 AS BIGINT) AS lo,
      |           CAST(sum(c_all) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |             AS BIGINT) AS hi
      |         FROM pg),
      |pts AS (SELECT grp, v, c, (cum * n_tot + n_g - 1) // n_g AS tr
      |        FROM src CROSS JOIN nt)
      |SELECT pts.grp AS source, pts.v AS n_chars, c AS n, norm_v
      |FROM pts JOIN pool ON pool.lo <= pts.tr AND pts.tr <= pool.hi""".stripMargin

  /** q217 — deterministic per-group mode: the most frequent document
    * length per language, ties broken toward the LARGER value by the
    * lexicographic struct max (one keyed grid aggregate + one
    * struct-max — no window at all). */
  private def q217(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"), col("n_chars").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(max(struct(col("c"), col("v"))).as("m"))
      .select(col("lang"), col("m.v").as("mode_v"), col("m.c").as("mode_n"))

  private val q217Sql =
    """WITH g AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM documents GROUP BY 1, 2),
      |r AS (SELECT lang, v, c,
      |             row_number() OVER (PARTITION BY lang
      |                                ORDER BY c DESC, v DESC) AS rk
      |      FROM g)
      |SELECT lang, v AS mode_v, c AS mode_n FROM r WHERE rk = 1""".stripMargin

  /** q222 — weighted median ([[CorpusSketch.weightedMedian]]): per
    * return flag, the QUANTITY-weighted lower median of lineitem
    * extended price in cents — "the median unit shipped cost X",
    * the volume-aware center unit-weighted medians misstate. Value-
    * grid decomposition (the q216 discipline with weights); the
    * oracle replays grid, cumulative weights, and the 2·cum ≥ tot
    * cover rule. */
  private def q222(s: SparkSession, dir: String): DataFrame =
    CorpusSketch.weightedMedian(
      t(s, dir, "lineitem").select(col("l_returnflag"),
        graft.queries.cents(col("l_extendedprice")).as("v_c"),
        col("l_quantity").cast("long").as("w")),
      "l_returnflag", "v_c", "w")

  private val q222Sql =
    """WITH r AS (SELECT l_returnflag,
      |                  CAST(round(l_extendedprice*100) AS BIGINT) AS v,
      |                  CAST(l_quantity AS BIGINT) AS w
      |           FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 0),
      |g AS (SELECT l_returnflag, v, CAST(sum(w) AS BIGINT) AS wg,
      |             CAST(count(*) AS BIGINT) AS c
      |      FROM r GROUP BY 1, 2),
      |wdw AS (SELECT l_returnflag, v, wg, c,
      |         sum(wg) OVER (PARTITION BY l_returnflag ORDER BY v
      |                       ROWS UNBOUNDED PRECEDING) AS cum,
      |         sum(wg) OVER (PARTITION BY l_returnflag) AS tot,
      |         sum(c) OVER (PARTITION BY l_returnflag) AS n
      |        FROM g)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
      |       CAST(tot AS BIGINT) AS tot_w, v AS wmedian
      |FROM wdw WHERE cum*2 >= tot AND (cum - wg)*2 < tot""".stripMargin

  /** q271 — KMV distinct estimate ([[graft.pipeline.Kmv]], k = 256):
    * the k-minimum-values sketch of each priority's customer base,
    * next to the order-statistic estimate D̂ = (k−1)·2⁶⁰/h₍k₎. The
    * oracle replays hash, rank and estimate; the engine's two-level
    * min-k equals the oracle's single rank because hashes are
    * distinct per set. */
  private def q271(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Kmv.estimate(
      graft.pipeline.Kmv.sketch(
        t(s, dir, "orders"), "o_orderpriority", "o_custkey", k = 256),
      k = 256)
      .select(col("s").as("set_id"), col("n_sketch"), col("kth_h"),
              col("est"))

  private val q271Kth = hexSql("md5('kmv' || CAST(o_custkey AS VARCHAR))", 15)

  private val q271Sql =
    s"""WITH m AS (SELECT DISTINCT o_orderpriority AS s,
      |             $q271Kth AS h
      |           FROM orders),
      |rk AS (SELECT s, h,
      |         row_number() OVER (PARTITION BY s ORDER BY h) AS rk
      |       FROM m),
      |sk AS (SELECT s, h FROM rk WHERE rk <= 256)
      |SELECT s AS set_id, CAST(count(*) AS BIGINT) AS n_sketch,
      |  max(h) AS kth_h,
      |  CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
      |    ELSE round(255.0 * 1152921504606846976.0 / max(h), 6) END
      |    AS est
      |FROM sk GROUP BY s""".stripMargin

  /** q272 — KMV pairwise overlap ([[graft.pipeline.Kmv.pairOverlap]]):
    * Jaccard and |A∩B| estimates between priority customer bases from
    * the combined min-k sketch — the intersection HLL cannot
    * estimate. */
  private def q272(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Kmv.pairOverlap(
      graft.pipeline.Kmv.sketch(
        t(s, dir, "orders"), "o_orderpriority", "o_custkey", k = 256),
      k = 256)

  private val q272Sql =
    s"""WITH m AS (SELECT DISTINCT o_orderpriority AS s,
      |             $q271Kth AS h
      |           FROM orders),
      |rk AS (SELECT s, h,
      |         row_number() OVER (PARTITION BY s ORDER BY h) AS rk
      |       FROM m),
      |sk AS (SELECT s, h FROM rk WHERE rk <= 256),
      |pairs AS (SELECT a.s AS set_a, b.s AS set_b
      |          FROM (SELECT DISTINCT s FROM sk) a,
      |               (SELECT DISTINCT s FROM sk) b
      |          WHERE a.s < b.s),
      |comb AS (
      |  SELECT set_a, set_b, h, max(in_a) AS in_a, max(in_b) AS in_b
      |  FROM (
      |    SELECT p.set_a, p.set_b, k1.h, CAST(1 AS BIGINT) AS in_a,
      |           CAST(0 AS BIGINT) AS in_b
      |    FROM pairs p JOIN sk k1 ON k1.s = p.set_a
      |    UNION ALL
      |    SELECT p.set_a, p.set_b, k2.h, CAST(0 AS BIGINT),
      |           CAST(1 AS BIGINT)
      |    FROM pairs p JOIN sk k2 ON k2.s = p.set_b) x
      |  GROUP BY 1, 2, 3),
      |top AS (SELECT * FROM (
      |    SELECT set_a, set_b, h, in_a, in_b,
      |      row_number() OVER (PARTITION BY set_a, set_b ORDER BY h)
      |        AS rk
      |    FROM comb) y WHERE rk <= 256),
      |agg AS (SELECT set_a, set_b, CAST(count(*) AS BIGINT) AS k_used,
      |          CAST(sum(in_a * in_b) AS BIGINT) AS matches,
      |          max(h) AS kth_h
      |        FROM top GROUP BY 1, 2)
      |SELECT set_a, set_b, k_used, matches,
      |  CAST((matches * 1000000) // k_used AS BIGINT) AS jaccard_e6,
      |  CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
      |    ELSE round(255.0 * 1152921504606846976.0 / kth_h, 6) END
      |    AS union_est,
      |  round((CAST(matches AS DOUBLE) / k_used) *
      |    (CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
      |      ELSE round(255.0 * 1152921504606846976.0 / kth_h, 6) END),
      |    6) AS inter_est
      |FROM agg""".stripMargin

  /** q292 — Poisson-bootstrap mean CI
    * ([[graft.stats.Bootstrap.bootstrapMeanCi]], B = 40, α = 0.05):
    * per-priority mean order value with a bootstrap percentile
    * interval — every row draws a DETERMINISTIC Poisson(1) weight per
    * replicate from the md5 hash point through exact e6 CDF
    * thresholds, so all 40 resamples run in one pass and replay in
    * SQL. */
  private def q292(s: SparkSession, dir: String): DataFrame =
    graft.stats.Bootstrap.bootstrapMeanCi(
      t(s, dir, "orders").select(col("o_orderpriority"),
        cents(col("o_totalprice")).as("x"), col("o_orderkey")),
      "o_orderpriority", "x", "o_orderkey")

  private val q292U = hexSql(
    "md5('boot' || CAST(b AS VARCHAR) || '|' || CAST(id AS VARCHAR))", 8)

  private val q292Sql = {
    val wExpr = graft.stats.Bootstrap.poisCdfE6
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH r AS (SELECT o_orderpriority AS g,
      |    CAST(round(o_totalprice*100) AS BIGINT) AS x,
      |    CAST(o_orderkey AS VARCHAR) AS id FROM orders),
      |full0 AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |            CAST(sum(x) // count(*) AS BIGINT) AS mean_c
      |          FROM r GROUP BY 1),
      |z AS (SELECT g, x, bb.b,
      |        ($q292U) % 1000000 AS u
      |      FROM r, LATERAL (SELECT unnest(generate_series(1, 40))
      |        AS b) bb),
      |reps AS (SELECT g, b, CAST(sum(($wExpr) * x) AS BIGINT) AS sx,
      |           CAST(sum($wExpr) AS BIGINT) AS sw
      |         FROM z GROUP BY 1, 2 HAVING sum($wExpr) > 0),
      |m AS (SELECT g, b, CAST(sx // sw AS BIGINT) AS m FROM reps),
      |rk AS (SELECT g, m,
      |         row_number() OVER (PARTITION BY g ORDER BY m) AS rk
      |       FROM m),
      |nr AS (SELECT g, CAST(count(*) AS BIGINT) AS b_reps
      |       FROM m GROUP BY 1),
      |bounds AS (SELECT rk.g, nr.b_reps,
      |    CAST(max(CASE WHEN rk.rk = 3 THEN m END) AS BIGINT) AS lo_c,
      |    CAST(max(CASE WHEN rk.rk = nr.b_reps - 2 THEN m END)
      |      AS BIGINT) AS hi_c
      |  FROM rk JOIN nr ON nr.g = rk.g GROUP BY 1, 2)
      |SELECT f.g AS o_orderpriority, f.n, b.b_reps, f.mean_c,
      |  b.lo_c, b.hi_c
      |FROM full0 f JOIN bounds b ON b.g = f.g""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q292_bootstrap_ci", q292, Some(q292Sql)),
    QueryDef("q271_kmv_estimate", q271, Some(q271Sql)),
    QueryDef("q272_kmv_overlap", q272, Some(q272Sql)),
    QueryDef("q216_exact_percentiles", q216, Some(q216Sql)),
    QueryDef("q236_winsorized_mean", q236, Some(q236Sql)),
    QueryDef("q237_quantile_normalize", q237, Some(q237Sql)),
    QueryDef("q222_weighted_median", q222, Some(q222Sql)),
    QueryDef("q217_mode_per_group", q217, Some(q217Sql)),
    QueryDef("q194_weighted_sample", q194, Some(q194Sql)),
    QueryDef("q200_table_checksum", q200, Some(q200Sql)),
    QueryDef("q202_hll_rolling", q202, Some(q202Sql)),
    QueryDef("q206_merkle_diff", q206, Some(q206Sql)),
    QueryDef("q94_hll_distinct", q94, Some(q94Sql)),
    QueryDef("q95_cms_heavy_hitters", q95, Some(q95Sql)),
    QueryDef("q96_stratified_sample", q96, Some(q96Sql)),
    QueryDef("q97_histogram_quantiles", q97, Some(q97Sql)),
    QueryDef("q98_stratum_topk", q98, Some(q98Sql)),
    QueryDef("q116_bloom_seen", q116, Some(q116Sql))
  )
}
