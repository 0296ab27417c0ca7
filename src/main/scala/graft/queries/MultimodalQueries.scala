package graft.queries

import graft.QueryDef
import graft.pipeline.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal queries over the documents table: byte-frame plumbing
  * (text bytes as payloads, ASCII byte sums = codepoint sums) plus
  * REAL codec loops — BMP/WAV/animated-GIF bytes synthesized
  * distributively, decoded through the JDK registries, every stat
  * predicted arithmetically by the oracles (q63/q71/q127-q132). */
object MultimodalQueries {

  /** q61 — media metadata: binary length + frame accounting. */
  private def q61(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("meta.mime").as("mime"),
              col("meta.n_bytes").as("n_bytes"), col("meta.n_frames").as("n_frames"))

  private val q61Sql =
    s"""SELECT doc_id, 'text/plain' AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  CAST(ceil(octet_length(encode(text)) / ${Multimodal.FrameBytes}.0) AS BIGINT) AS n_frames
      |FROM documents""".stripMargin

  /** q62 — frame sampling + per-frame features through the native
    * byte_sum Catalyst expression (whole-stage codegen). */
  private def q62(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameFeatures(
      Multimodal.frameSample(
        Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text")))

  private val q62Sql =
    s"""WITH m AS (
      |  SELECT doc_id, text,
      |         CAST(ceil(octet_length(encode(text)) / ${Multimodal.FrameBytes}.0) AS BIGINT) AS n_frames
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx, text
      |  FROM m)
      |SELECT doc_id, frame_idx,
      |  CAST(length(substr(text, CAST(frame_idx * ${Multimodal.FrameBytes} + 1 AS BIGINT),
      |                     ${Multimodal.FrameBytes})) AS BIGINT) AS frame_bytes,
      |  CAST(list_sum(list_transform(
      |    string_split(substr(text, CAST(frame_idx * ${Multimodal.FrameBytes} + 1 AS BIGINT),
      |                        ${Multimodal.FrameBytes}), ''),
      |    x -> ascii(x))) AS BIGINT) AS frame_sum
      |FROM f""".stripMargin

  /** q63 — REAL image decode, oracle-checked end-to-end: gen_bmp
    * synthesizes genuine 24-bit BMP bytes per doc_id (pixel (x,y):
    * blue = (id·31+7x+13y) mod 256, green/red offset 85/170),
    * decode_image runs them through `javax.imageio` and reduces to
    * per-channel means. With a 4×4 grid the mean is k/16 — exactly
    * representable in a double — so DuckDB can predict every decoded
    * stat arithmetically over the same (id, x, y) formula and the hash
    * compare is bit-exact. */
  private def q63(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeImage(
      Multimodal.imageTable(t(s, dir, "documents"), "doc_id"))

  private val q63Sql =
    // floor-mod formulation (((x % m) + m) % m): GenBmp uses
    // Math.floorMod while DuckDB's % follows the sign of the dividend —
    // identical for the nonnegative doc_ids shipped today, and this form
    // stays correct if a corpus ever carries negative ids
    """WITH px AS (
      |  SELECT d.doc_id,
      |         ((d.doc_id * 31 + 7 * g.x + 13 * g.y) % 256 + 256) % 256 AS b
      |  FROM documents d
      |  CROSS JOIN (
      |    SELECT xs.x, ys.y
      |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
      |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g)
      |SELECT doc_id, 'image/bmp' AS mime,
      |  CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
      |  avg((b + 170) % 256) AS mean_r,
      |  avg((b + 85) % 256) AS mean_g,
      |  avg(b) AS mean_b
      |FROM px GROUP BY doc_id""".stripMargin

  /** q71 — REAL audio decode, oracle-checked end-to-end: gen_wav
    * synthesizes genuine 16-bit PCM WAV bytes per doc_id (sample t:
    * ((id·31 + t·7919) mod 2048) − 1024), decode_audio runs them
    * through `javax.sound.sampled` and reduces to per-clip stats.
    * Integer sample sums are exact, mean/RMS are one IEEE op away, and
    * zero crossings are integer counts — DuckDB predicts every decoded
    * stat arithmetically and the hash compare is bit-exact. */
  private def q71(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAudio(
      Multimodal.audioTable(t(s, dir, "documents"), "doc_id"))

  private val q71Sql =
    // same floor-mod guard as q63 (GenWav uses Math.floorMod)
    """WITH s AS (
      |  SELECT d.doc_id, g.t,
      |         ((d.doc_id * 31 + g.t * 7919) % 2048 + 2048) % 2048 - 1024 AS v
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS t) g),
      |w AS (
      |  SELECT doc_id, v,
      |         lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS prev
      |  FROM s)
      |SELECT doc_id, 'audio/wav' AS mime,
      |  CAST(8000 AS INTEGER) AS sample_rate, CAST(1 AS INTEGER) AS channels,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(sum(v) AS DOUBLE) / count(*) AS mean_amp,
      |  sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)) AS rms_amp,
      |  CAST(count(*) FILTER (WHERE prev IS NOT NULL AND (prev < 0) != (v < 0))
      |       AS BIGINT) AS zero_cross
      |FROM w GROUP BY doc_id""".stripMargin

  /** q127 — image perceptual dedup ([[Multimodal.imagePerceptualDedup]]):
    * the q54 exact-dedup ledger keyed on the average-hash perceptual
    * fingerprint of REAL decoded BMP pixels. The oracle replays the
    * whole chain arithmetically: the bottom-up BMP storage means the
    * decoder's image row y holds the generator's storage row 3−y, the
    * luminance threshold is the division-free integer compare
    * lum·16 > total, and the hash packs bit x + 4y — so DuckDB
    * predicts every 16-bit hash, cluster, and keeper flag exactly. */
  private def q127(s: SparkSession, dir: String): DataFrame =
    Multimodal.imagePerceptualDedup(
      Multimodal.imageTable(t(s, dir, "documents"), "doc_id"))

  private val q127Sql =
    """WITH px AS (
      |  SELECT d.doc_id, g.x, g.y,
      |         ((d.doc_id * 31 + 7 * g.x + 13 * (3 - g.y)) % 256 + 256) % 256 AS b
      |  FROM documents d
      |  CROSS JOIN (
      |    SELECT xs.x, ys.y
      |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
      |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g),
      |lum AS (
      |  SELECT doc_id, x, y,
      |         ((b + 170) % 256) + ((b + 85) % 256) + b AS l
      |  FROM px),
      |tot AS (SELECT doc_id, sum(l) AS t FROM lum GROUP BY 1),
      |hs AS (
      |  SELECT lum.doc_id,
      |         CAST(sum(CASE WHEN l * 16 > t
      |                  THEN CAST(1 AS BIGINT) << (y * 4 + x) ELSE 0 END)
      |              AS BIGINT) AS ahash
      |  FROM lum JOIN tot USING (doc_id) GROUP BY 1),
      |cl AS (SELECT ahash, min(doc_id) AS cluster_id, count(*) AS n_cluster
      |       FROM hs GROUP BY 1)
      |SELECT hs.doc_id, hs.ahash, cl.cluster_id,
      |       CAST(cl.n_cluster AS BIGINT) AS n_cluster,
      |       CAST(CASE WHEN hs.doc_id = cl.cluster_id THEN 1 ELSE 0 END AS BIGINT)
      |         AS is_keeper
      |FROM hs JOIN cl USING (ahash)""".stripMargin

  /** q128 — the resize→decode→hash chain ([[Multimodal.resizeImages]]):
    * 4×4 BMPs box-downsampled to 2×2 by the native `image_resize`
    * (integer per-channel box means, re-encoded as BMP), then decoded
    * AND perceptually hashed in one projection. The oracle predicts
    * every resized pixel ((Σ channel) // 4 over each 2×2 box of the
    * orientation-corrected input formula), the channel means, and the
    * 4-bit ahash — the full media→media→stats chain, arithmetic end
    * to end. */
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val rs = Multimodal.resizeImages(
      Multimodal.imageTable(t(s, dir, "documents"), "doc_id"), 2, 2)
    rs.select(col("doc_id"), col("meta.mime").as("mime"),
              call_function("decode_image", col("media")).as("img"),
              call_function("image_ahash", col("media")).as("ahash_small"))
      .select(col("doc_id"), col("mime"),
              col("img.width").as("width"), col("img.height").as("height"),
              col("img.mean_r").as("mean_r"), col("img.mean_g").as("mean_g"),
              col("img.mean_b").as("mean_b"), col("ahash_small"))
  }

  private val q128Sql =
    """WITH pxi AS (
      |  SELECT d.doc_id, g.x, g.y,
      |         ((d.doc_id * 31 + 7 * g.x + 13 * (3 - g.y)) % 256 + 256) % 256 AS b
      |  FROM documents d
      |  CROSS JOIN (
      |    SELECT xs.x, ys.y
      |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
      |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g),
      |chn AS (
      |  SELECT doc_id, x, y, b, (b + 85) % 256 AS gg, (b + 170) % 256 AS r
      |  FROM pxi),
      |bx AS (
      |  SELECT doc_id, x // 2 AS ox, y // 2 AS oy,
      |         sum(r) // 4 AS r2, sum(gg) // 4 AS g2, sum(b) // 4 AS b2
      |  FROM chn GROUP BY 1, 2, 3),
      |tt AS (SELECT doc_id, sum(r2 + g2 + b2) AS t FROM bx GROUP BY 1),
      |hs AS (
      |  SELECT bx.doc_id,
      |         CAST(sum(CASE WHEN (r2 + g2 + b2) * 4 > t
      |                  THEN CAST(1 AS BIGINT) << (oy * 2 + ox) ELSE 0 END)
      |              AS BIGINT) AS ahash_small
      |  FROM bx JOIN tt USING (doc_id) GROUP BY 1),
      |mn AS (
      |  SELECT doc_id, avg(r2) AS mean_r, avg(g2) AS mean_g, avg(b2) AS mean_b
      |  FROM bx GROUP BY 1)
      |SELECT mn.doc_id, 'image/bmp' AS mime,
      |       CAST(2 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
      |       mn.mean_r, mn.mean_g, mn.mean_b, hs.ahash_small
      |FROM mn JOIN hs USING (doc_id)""".stripMargin

  /** q129 — audio perceptual dedup ([[Multimodal.audioPerceptualDedup]]):
    * the exact-dedup ledger keyed on the energy-contour fingerprint of
    * REAL decoded PCM — 16-sample frames over the 256-sample clips
    * give 16 integer energies and 15 delta-sign bits, every one
    * predicted by the oracle from the q71 sample formula. */
  private def q129(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioPerceptualDedup(
      Multimodal.audioTable(t(s, dir, "documents"), "doc_id"))

  private val q129Sql =
    """WITH smp AS (
      |  SELECT d.doc_id, g.t, g.t // 16 AS frame,
      |         ((d.doc_id * 31 + g.t * 7919) % 2048 + 2048) % 2048 - 1024 AS v
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS t) g),
      |en AS (
      |  SELECT doc_id, frame, sum(v * v) AS e
      |  FROM smp GROUP BY 1, 2),
      |dl AS (
      |  SELECT doc_id, frame,
      |         lead(e) OVER (PARTITION BY doc_id ORDER BY frame) AS nxt, e
      |  FROM en),
      |fps AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN nxt > e
      |                  THEN CAST(1 AS BIGINT) << frame ELSE 0 END)
      |              AS BIGINT) AS fp
      |  FROM dl WHERE nxt IS NOT NULL GROUP BY 1),
      |cl AS (SELECT fp, min(doc_id) AS cluster_id, count(*) AS n_cluster
      |       FROM fps GROUP BY 1)
      |SELECT fps.doc_id, fps.fp, cl.cluster_id,
      |       CAST(cl.n_cluster AS BIGINT) AS n_cluster,
      |       CAST(CASE WHEN fps.doc_id = cl.cluster_id THEN 1 ELSE 0 END AS BIGINT)
      |         AS is_keeper
      |FROM fps JOIN cl USING (fp)""".stripMargin

  /** q130 — REAL video decode ([[Multimodal.decodeVideo]]): the
    * modality's declared stub retired. gen_gif synthesizes genuine
    * multi-frame animated GIFs (exact-palette indexed frames →
    * lossless LZW; interlace disabled — the JDK writer's default
    * interlacing does not round-trip at small heights), decode_video
    * walks every stored frame through the JDK's GIF reader. The
    * oracle predicts every per-frame channel mean from the
    * time-extended pixel formula. */
  private def q130(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeVideo(Multimodal.videoTable(t(s, dir, "documents"), "doc_id"))

  private val q130Sql =
    """WITH vpx AS (
      |  SELECT d.doc_id, fs.f, g.x, g.y,
      |         ((d.doc_id * 31 + 7 * g.x + 13 * g.y + 17 * fs.f) % 256 + 256) % 256 AS b
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS f) fs
      |  CROSS JOIN (
      |    SELECT xs.x, ys.y
      |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
      |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g)
      |SELECT doc_id, 'video/gif' AS mime, CAST(f AS INTEGER) AS frame_idx,
      |       CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
      |       avg((b + 170) % 256) AS mean_r,
      |       avg((b + 85) % 256) AS mean_g,
      |       avg(b) AS mean_b
      |FROM vpx GROUP BY doc_id, f""".stripMargin

  /** q340 — AVI container decode ([[Multimodal.videoTableAvi]] →
    * [[Multimodal.decodeVideo]]): the INDUSTRY video container next
    * to q130's GIF sequence. gen_avi writes genuine RIFF/AVI bytes
    * (header chain, uncompressed-DIB '00db' frames with the format's
    * 4-byte row padding — width 5 exercises it — and an idx1 index);
    * decode_video's hand-written RIFF walker reads every frame
    * straight off the container (no ImageIO plugin exists for AVI).
    * DIB storage is bit-exact, so the oracle predicts every
    * per-frame channel mean from the same time-extended pixel
    * formula as q130. */
  private def q340(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeVideo(Multimodal.videoTableAvi(t(s, dir, "documents"), "doc_id"))

  private val q340Sql =
    """WITH vpx AS (
      |  SELECT d.doc_id, fs.f, g.x, g.y,
      |         ((d.doc_id * 31 + 7 * g.x + 13 * g.y + 17 * fs.f) % 256 + 256) % 256 AS b
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS f) fs
      |  CROSS JOIN (
      |    SELECT xs.x, ys.y
      |    FROM (SELECT unnest(generate_series(0, 4)) AS x) xs,
      |         (SELECT unnest(generate_series(0, 2)) AS y) ys) g)
      |SELECT doc_id, 'video/avi' AS mime, CAST(f AS INTEGER) AS frame_idx,
      |       CAST(5 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
      |       avg((b + 170) % 256) AS mean_r,
      |       avg((b + 85) % 256) AS mean_g,
      |       avg(b) AS mean_b
      |FROM vpx GROUP BY doc_id, f""".stripMargin

  /** q131 — video temporal profile ([[Multimodal.videoSceneStats]]):
    * per-transition L1 delta of the decoded channel means + the
    * scene-cut flag at 100 (the corpus's deltas span 35..113 with 14%
    * above — both branches fire). Means are exact k/16 doubles, so
    * the deltas replay exactly. */
  private def q131(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoSceneStats(Multimodal.videoTable(t(s, dir, "documents"), "doc_id"))

  private val q131Sql =
    """WITH vpx AS (
      |  SELECT d.doc_id, fs.f, g.x, g.y,
      |         ((d.doc_id * 31 + 7 * g.x + 13 * g.y + 17 * fs.f) % 256 + 256) % 256 AS b
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS f) fs
      |  CROSS JOIN (
      |    SELECT xs.x, ys.y
      |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
      |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g),
      |fm AS (
      |  SELECT doc_id, f,
      |         avg((b + 170) % 256) AS mr, avg((b + 85) % 256) AS mg, avg(b) AS mb
      |  FROM vpx GROUP BY 1, 2),
      |dl AS (
      |  SELECT doc_id, f AS frame_idx,
      |         abs(mr - lag(mr) OVER w) + abs(mg - lag(mg) OVER w)
      |           + abs(mb - lag(mb) OVER w) AS delta
      |  FROM fm WINDOW w AS (PARTITION BY doc_id ORDER BY f))
      |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |       round(delta, 6) AS delta,
      |       CAST(CASE WHEN delta > 100.0 THEN 1 ELSE 0 END AS BIGINT) AS scene_cut
      |FROM dl WHERE delta IS NOT NULL""".stripMargin

  /** q132 — video perceptual dedup ([[Multimodal.videoPerceptualDedup]]):
    * the ledger's fourth modality, fingerprint = luminance-contour
    * delta signs over the decoded frame array — a pure higher-order-
    * array composition on decode_video's output. Oracle replays frame
    * luminances (exact k/16 sums) and the lead-compare bits. */
  private def q132(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoPerceptualDedup(
      Multimodal.videoTable(t(s, dir, "documents"), "doc_id"))

  private val q132Sql =
    """WITH vpx AS (
      |  SELECT d.doc_id, fs.f, g.x, g.y,
      |         ((d.doc_id * 31 + 7 * g.x + 13 * g.y + 17 * fs.f) % 256 + 256) % 256 AS b
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS f) fs
      |  CROSS JOIN (
      |    SELECT xs.x, ys.y
      |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
      |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g),
      |fl AS (
      |  SELECT doc_id, f,
      |         avg((b + 170) % 256) + avg((b + 85) % 256) + avg(b) AS lum
      |  FROM vpx GROUP BY 1, 2),
      |dv AS (
      |  SELECT doc_id, f, lead(lum) OVER w AS nxt, lum
      |  FROM fl WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
      |vfps AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN nxt > lum
      |                  THEN CAST(1 AS BIGINT) << f ELSE 0 END) AS BIGINT) AS fp
      |  FROM dv WHERE nxt IS NOT NULL GROUP BY 1),
      |vcl AS (SELECT fp, min(doc_id) AS cluster_id, count(*) AS n_cluster
      |        FROM vfps GROUP BY 1)
      |SELECT vfps.doc_id, vfps.fp, vcl.cluster_id,
      |       CAST(vcl.n_cluster AS BIGINT) AS n_cluster,
      |       CAST(CASE WHEN vfps.doc_id = vcl.cluster_id THEN 1 ELSE 0 END AS BIGINT)
      |         AS is_keeper
      |FROM vfps JOIN vcl USING (fp)""".stripMargin

  // ------------------------------------------- perceptual NEAR-dedup
  // q138-q140 — the Hamming-neighborhood upgrade of the exact
  // perceptual ledgers (r11 verdict gap #3): candidates from
  // pigeonhole banding (perfect recall), exact popcount confirm,
  // connected components over the near graph. The oracles compute the
  // SEMANTIC result — ALL pairs within Hamming ≤ h via a direct join,
  // then a recursive transitive closure — so they also prove the
  // banded path's perfect-recall claim: a single dropped candidate
  // would split a component and break the hash.

  /** Shared oracle tail: near edges at Hamming ≤ `h` over `hs(doc_id,
    * fp)`, min-label closure, cluster sizes, the ledger projection. */
  private def nearLedgerSql(hsCte: String, h: Int): String =
    s"""$hsCte,
      |np AS (SELECT a.doc_id AS da, b.doc_id AS db
      |       FROM hs a JOIN hs b
      |         ON a.doc_id < b.doc_id
      |        AND bit_count(xor(a.fp, b.fp)) <= $h),
      |edges AS (SELECT da AS src, db AS dst FROM np
      |          UNION SELECT db AS src, da AS dst FROM np),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM hs
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
      |sz AS (SELECT cluster_id, count(*) AS n_cluster FROM lab GROUP BY 1)
      |SELECT hs.doc_id, hs.fp, lab.cluster_id,
      |       CAST(sz.n_cluster AS BIGINT) AS n_cluster,
      |       CAST(CASE WHEN hs.doc_id = lab.cluster_id THEN 1 ELSE 0 END AS BIGINT)
      |         AS is_keeper
      |FROM hs JOIN lab USING (doc_id) JOIN sz USING (cluster_id)""".stripMargin

  /** q138 — image NEAR-dedup ([[Multimodal.imageNearDedup]]): the
    * aHash ledger with cluster_id = min doc reachable within
    * Hamming ≤ 2 — what perceptual hashing is FOR (a brightness-shifted
    * or re-encoded image lands bits away, not bytes away). Banded
    * candidates + popcount confirm + connected components on the Spark
    * side; the oracle takes the direct all-pairs Hamming definition,
    * so equality also certifies the banding's perfect recall. */
  private def q138(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageNearDedup(
      Multimodal.imageTable(t(s, dir, "documents"), "doc_id"))

  private val q138Sql = {
    val hs =
      """WITH RECURSIVE px AS (
        |  SELECT d.doc_id, g.x, g.y,
        |         ((d.doc_id * 31 + 7 * g.x + 13 * (3 - g.y)) % 256 + 256) % 256 AS b
        |  FROM documents d
        |  CROSS JOIN (
        |    SELECT xs.x, ys.y
        |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
        |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g),
        |lum AS (
        |  SELECT doc_id, x, y,
        |         ((b + 170) % 256) + ((b + 85) % 256) + b AS l
        |  FROM px),
        |tot AS (SELECT doc_id, sum(l) AS t FROM lum GROUP BY 1),
        |hs AS (
        |  SELECT lum.doc_id,
        |         CAST(sum(CASE WHEN l * 16 > t
        |                  THEN CAST(1 AS BIGINT) << (y * 4 + x) ELSE 0 END)
        |              AS BIGINT) AS fp
        |  FROM lum JOIN tot USING (doc_id) GROUP BY 1)""".stripMargin
    nearLedgerSql(hs, 2)
  }

  /** q139 — audio NEAR-dedup ([[Multimodal.audioNearDedup]]): the
    * energy-contour ledger under Hamming ≤ 2 (a clip re-encoded with
    * one frame's energy ordering flipped is the same recording; exact
    * equality called it distinct). Same banded/closure split as
    * q138. */
  private def q139(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioNearDedup(
      Multimodal.audioTable(t(s, dir, "documents"), "doc_id"))

  private val q139Sql = {
    val hs =
      """WITH RECURSIVE smp AS (
        |  SELECT d.doc_id, g.t, g.t // 16 AS frame,
        |         ((d.doc_id * 31 + g.t * 7919) % 2048 + 2048) % 2048 - 1024 AS v
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS t) g),
        |en AS (
        |  SELECT doc_id, frame, sum(v * v) AS e
        |  FROM smp GROUP BY 1, 2),
        |dl AS (
        |  SELECT doc_id, frame,
        |         lead(e) OVER (PARTITION BY doc_id ORDER BY frame) AS nxt, e
        |  FROM en),
        |hs AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN nxt > e
        |                  THEN CAST(1 AS BIGINT) << frame ELSE 0 END)
        |              AS BIGINT) AS fp
        |  FROM dl WHERE nxt IS NOT NULL GROUP BY 1)""".stripMargin
    nearLedgerSql(hs, 2)
  }

  /** q140 — video NEAR-dedup ([[Multimodal.videoNearDedup]]) on
    * 17-frame GIFs (16 contour bits — a fingerprint wide enough that
    * the neighborhood is non-trivial): luminance-contour fingerprints,
    * Hamming ≤ 2, connected components. Also exercises the decode
    * path at 4× the q130 frame depth. */
  private def q140(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoNearDedup(
      Multimodal.videoTable(t(s, dir, "documents"), "doc_id", nFrames = 17),
      widthBits = 16)

  private val q140Sql = {
    val hs =
      """WITH RECURSIVE vpx AS (
        |  SELECT d.doc_id, fs.f, g.x, g.y,
        |         ((d.doc_id * 31 + 7 * g.x + 13 * g.y + 17 * fs.f) % 256 + 256) % 256 AS b
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 16)) AS f) fs
        |  CROSS JOIN (
        |    SELECT xs.x, ys.y
        |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
        |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g),
        |fl AS (
        |  SELECT doc_id, f,
        |         avg((b + 170) % 256) + avg((b + 85) % 256) + avg(b) AS lum
        |  FROM vpx GROUP BY 1, 2),
        |dv AS (
        |  SELECT doc_id, f, lead(lum) OVER w AS nxt, lum
        |  FROM fl WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
        |hs AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN nxt > lum
        |                  THEN CAST(1 AS BIGINT) << f ELSE 0 END) AS BIGINT) AS fp
        |  FROM dv WHERE nxt IS NOT NULL GROUP BY 1)""".stripMargin
    nearLedgerSql(hs, 2)
  }

  /** q133 — multimodal sample manifest: one row per document joining
    * the text stats with every modality's perceptual fingerprint
    * (image ahash, audio energy contour, video luminance contour) —
    * the export manifest a multimodal training pair loader consumes,
    * and the cross-modal dedup key set (drop a sample when ANY
    * modality is a perceptual dup). Pure composition of the
    * oracle-replayable chains; three keyed joins on doc_id. */
  private def q133(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val text = graft.pipeline.TextAnalysis.tokenStats(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"))
    val img = Multimodal.imagePerceptualDedup(
      Multimodal.imageTable(docs, "doc_id")).select(col("doc_id"), col("ahash"))
    val aud = Multimodal.audioPerceptualDedup(
      Multimodal.audioTable(docs, "doc_id")).select(col("doc_id"), col("fp").as("audio_fp"))
    val vid = Multimodal.videoPerceptualDedup(
      Multimodal.videoTable(docs, "doc_id")).select(col("doc_id"), col("fp").as("video_fp"))
    text.join(img, Seq("doc_id")).join(aud, Seq("doc_id")).join(vid, Seq("doc_id"))
  }

  private val q133Sql = {
    def inner(sql: String, keep: String): String =
      s"SELECT doc_id, $keep FROM (${sql.replace("\n", " ")}) x"
    s"""SELECT t.doc_id,
      |  CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
      |       AS BIGINT) AS n_tokens,
      |  i.ahash, a.fp AS audio_fp, v.fp AS video_fp
      |FROM documents t
      |JOIN (${inner(q127Sql, "ahash")}) i USING (doc_id)
      |JOIN (${inner(q129Sql, "fp")}) a USING (doc_id)
      |JOIN (${inner(q132Sql, "fp")}) v USING (doc_id)""".stripMargin
  }

  /** q135 — audio activity segmentation
    * ([[Multimodal.audioActivitySegments]]): energy-gated VAD over the
    * decoded clips — ~42% of frames clear the 5.6M threshold, so every
    * clip yields a non-trivial active/inactive partition. The oracle
    * replays frame energies and the gaps-and-islands grouping. */
  private def q135(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioActivitySegments(
      Multimodal.audioTable(t(s, dir, "documents"), "doc_id"))

  private val q135Sql =
    """WITH smp AS (
      |  SELECT d.doc_id, g.t, g.t // 16 AS frame,
      |         ((d.doc_id * 31 + g.t * 7919) % 2048 + 2048) % 2048 - 1024 AS v
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS t) g),
      |fen AS (SELECT doc_id, frame, sum(v * v) AS e FROM smp GROUP BY 1, 2),
      |act AS (
      |  SELECT doc_id, frame, e,
      |         frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS grp
      |  FROM fen WHERE e > 5600000),
      |seg AS (
      |  SELECT doc_id, grp, min(frame) AS start_frame, max(frame) AS end_frame,
      |         count(*) AS n_frames, sum(e) AS e_sum
      |  FROM act GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame) AS BIGINT)
      |    AS seg_idx,
      |  CAST(start_frame AS BIGINT) AS start_frame,
      |  CAST(end_frame AS BIGINT) AS end_frame,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(e_sum AS BIGINT) AS e_sum
      |FROM seg""".stripMargin

  /** q252 — LONG-video near-dedup ([[Multimodal.videoNearDedupWindows]])
    * on 80-frame GIFs — videos the single-fingerprint bit budget
    * excludes entirely (79 transitions > 64 bits; q140's path nulls
    * them, r12 verdict gap #2). Five aligned 16-frame windows each
    * fingerprint 15 contour bits; videos fuse when ANY window pair
    * agrees within Hamming ≤ 2, closed transitively. The oracle takes
    * the direct definition — per-window fps from the pixel formula,
    * all-pairs same-window Hamming join, recursive closure — so
    * equality also certifies the banded rep-graph path's perfect
    * recall on the window axis. */
  private def q252(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoNearDedupWindows(
      Multimodal.videoTable(t(s, dir, "documents"), "doc_id", nFrames = 80),
      windowFrames = 16, maxHamming = 2)

  private val q252Sql =
    """WITH RECURSIVE vpx AS (
      |  SELECT d.doc_id, fs.f, g.x, g.y,
      |         ((d.doc_id * 31 + 7 * g.x + 13 * g.y + 17 * fs.f) % 256 + 256) % 256 AS b
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 79)) AS f) fs
      |  CROSS JOIN (
      |    SELECT xs.x, ys.y
      |    FROM (SELECT unnest(generate_series(0, 3)) AS x) xs,
      |         (SELECT unnest(generate_series(0, 3)) AS y) ys) g),
      |fl AS (
      |  SELECT doc_id, f,
      |         avg((b + 170) % 256) + avg((b + 85) % 256) + avg(b) AS lum
      |  FROM vpx GROUP BY 1, 2),
      |dv AS (
      |  SELECT doc_id, f, f // 16 AS win, lead(lum) OVER w AS nxt, lum
      |  FROM fl WINDOW w AS (PARTITION BY doc_id, f // 16 ORDER BY f)),
      |hs AS (
      |  SELECT doc_id, CAST(win AS BIGINT) AS win,
      |         CAST(sum(CASE WHEN nxt > lum
      |                  THEN CAST(1 AS BIGINT) << (f % 16) ELSE 0 END)
      |              AS BIGINT) AS fp
      |  FROM dv WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |np AS (SELECT a.doc_id AS da, b.doc_id AS db
      |       FROM hs a JOIN hs b
      |         ON a.win = b.win AND a.doc_id < b.doc_id
      |        AND bit_count(xor(a.fp, b.fp)) <= 2),
      |edges AS (SELECT DISTINCT da AS src, db AS dst FROM np
      |          UNION SELECT DISTINCT db AS src, da AS dst FROM np),
      |nodes AS (SELECT DISTINCT doc_id FROM hs),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM nodes
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
      |sz AS (SELECT cluster_id, count(*) AS n_cluster FROM lab GROUP BY 1),
      |nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
      |       FROM hs GROUP BY 1)
      |SELECT nodes.doc_id, nw.n_windows, lab.cluster_id,
      |       CAST(sz.n_cluster AS BIGINT) AS n_cluster,
      |       CAST(CASE WHEN nodes.doc_id = lab.cluster_id THEN 1 ELSE 0 END
      |            AS BIGINT) AS is_keeper
      |FROM nodes JOIN nw USING (doc_id) JOIN lab USING (doc_id)
      |           JOIN sz USING (cluster_id)""".stripMargin

  /** q295 — LONG-audio near-dedup ([[Multimodal.audioNearDedupWindows]])
    * on 2048-sample clips — 128 energy frames, 127 transitions, so the
    * single-fingerprint path ([[graft.plans.AudioEnergyFp]]) nulls
    * every clip and q139's ledger silently exempts them (r13 verdict
    * gap #1 — the class q252 closed for video, third modality). Eight
    * aligned 16-frame windows each fingerprint 15 energy-delta bits;
    * clips fuse when ANY window pair agrees within Hamming ≤ 2, closed
    * transitively. The oracle takes the direct definition — per-window
    * fps from the sample formula, all-pairs same-window Hamming join,
    * recursive closure — certifying the banded rep-graph path's
    * perfect recall on the window axis. */
  private def q295(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioNearDedupWindows(
      Multimodal.audioTable(t(s, dir, "documents"), "doc_id",
                            nSamples = 2048),
      frameSamples = 16, windowFrames = 16, maxHamming = 2)

  private val q295Sql =
    """WITH RECURSIVE smp AS (
      |  SELECT d.doc_id, g.t, g.t // 16 AS frame,
      |         ((d.doc_id * 31 + g.t * 7919) % 2048 + 2048) % 2048 - 1024 AS v
      |  FROM documents d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 2047)) AS t) g),
      |fen AS (SELECT doc_id, frame, sum(v * v) AS e FROM smp GROUP BY 1, 2),
      |dv AS (
      |  SELECT doc_id, frame, frame // 16 AS win, lead(e) OVER w AS nxt, e
      |  FROM fen WINDOW w AS (PARTITION BY doc_id, frame // 16 ORDER BY frame)),
      |hs AS (
      |  SELECT doc_id, CAST(win AS BIGINT) AS win,
      |         CAST(sum(CASE WHEN nxt > e
      |                  THEN CAST(1 AS BIGINT) << (frame % 16) ELSE 0 END)
      |              AS BIGINT) AS fp
      |  FROM dv WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |np AS (SELECT a.doc_id AS da, b.doc_id AS db
      |       FROM hs a JOIN hs b
      |         ON a.win = b.win AND a.doc_id < b.doc_id
      |        AND bit_count(xor(a.fp, b.fp)) <= 2),
      |edges AS (SELECT DISTINCT da AS src, db AS dst FROM np
      |          UNION SELECT DISTINCT db AS src, da AS dst FROM np),
      |nodes AS (SELECT DISTINCT doc_id FROM hs),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM nodes
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
      |sz AS (SELECT cluster_id, count(*) AS n_cluster FROM lab GROUP BY 1),
      |nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
      |       FROM hs GROUP BY 1)
      |SELECT nodes.doc_id, nw.n_windows, lab.cluster_id,
      |       CAST(sz.n_cluster AS BIGINT) AS n_cluster,
      |       CAST(CASE WHEN nodes.doc_id = lab.cluster_id THEN 1 ELSE 0 END
      |            AS BIGINT) AS is_keeper
      |FROM nodes JOIN nw USING (doc_id) JOIN lab USING (doc_id)
      |           JOIN sz USING (cluster_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q61_media_meta", q61, Some(q61Sql)),
    QueryDef("q62_frame_features", q62, Some(q62Sql)),
    QueryDef("q63_image_decode", q63, Some(q63Sql)),
    QueryDef("q71_audio_decode", q71, Some(q71Sql)),
    QueryDef("q127_image_phash_dedup", q127, Some(q127Sql)),
    QueryDef("q128_image_resize_chain", q128, Some(q128Sql)),
    QueryDef("q129_audio_fp_dedup", q129, Some(q129Sql)),
    QueryDef("q130_video_decode", q130, Some(q130Sql)),
    QueryDef("q340_avi_decode", q340, Some(q340Sql)),
    QueryDef("q131_video_scene_stats", q131, Some(q131Sql)),
    QueryDef("q132_video_fp_dedup", q132, Some(q132Sql)),
    QueryDef("q133_multimodal_manifest", q133, Some(q133Sql)),
    QueryDef("q135_audio_vad", q135, Some(q135Sql)),
    QueryDef("q138_image_near_dedup", q138, Some(q138Sql)),
    QueryDef("q139_audio_near_dedup", q139, Some(q139Sql)),
    QueryDef("q140_video_near_dedup", q140, Some(q140Sql)),
    QueryDef("q252_video_window_dedup", q252, Some(q252Sql)),
    QueryDef("q295_audio_window_dedup", q295, Some(q295Sql))
  )
}
