package graft.pipeline

import graft.plans.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star op; SURVEY §7.4).
  *
  * Media (image/audio/video) are opaque `binary` columns with a typed
  * metadata struct. The Spark-side machinery — schema, frame sampling,
  * per-frame features, batch shape — is real and tested. IMAGE decode
  * is real too ([[decodeImage]] over the JDK's `javax.imageio`
  * PNG/BMP/GIF/JPEG readers — zero added dependencies), and so is
  * AUDIO decode ([[decodeAudio]] over the JDK's `javax.sound.sampled`
  * WAV/PCM readers), and — since r11 — VIDEO decode ([[decodeVideo]]
  * over multi-frame animated GIF, the one frame-sequence container
  * the JDK both writes and reads — the former byte-statistics stub is
  * deleted; no modality is stubbed).
  *
  * Scale: media rows never leave executors; frame sampling is a
  * flatMap (`explode(sequence(...))`), features are codegen'd
  * expressions ([[graft.plans.ByteSum]]), and decode is a per-row
  * native expression ([[graft.plans.DecodeImage]]), so a 100 TB media
  * corpus streams through scan → explode/decode → project with zero
  * shuffles.
  */
object Multimodal {

  val FrameBytes = 64

  /** Build the canonical media table from any (id, payload) source:
    * (doc_id, media binary, meta struct<mime, n_bytes, n_frames>). */
  def mediaTable(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      struct(
        lit("text/plain").as("mime"),
        length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"),
        ceil(length(encode(col(payloadCol), "UTF-8")) / lit(FrameBytes.toDouble))
          .cast("long").as("n_frames")).as("meta"))
  }

  /** Frame sampling: one row per fixed-size byte window of the media
    * blob — the distributed form of video frame extraction. Empty
    * payloads (n_frames = 0) emit no rows: Spark's `sequence(0, -1)`
    * counts DOWN, so the sequence is gated behind `when` (explode of
    * null yields nothing), matching `generate_series(0, -1)` = empty. */
  def frameSample(media: DataFrame): DataFrame =
    media.select(
        col("doc_id"), col("media"),
        explode(when(col("meta.n_frames") > 0,
                     sequence(lit(0L), col("meta.n_frames") - 1))).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        expr(s"substring(media, cast(frame_idx * $FrameBytes + 1 as int), $FrameBytes)")
          .as("frame"))

  /** Per-frame features via the native byte_sum expression (stays in
    * whole-stage codegen). */
  def frameFeatures(frames: DataFrame): DataFrame = {
    GraftFunctions.register(frames.sparkSession)
    frames.select(
      col("doc_id"), col("frame_idx"),
      length(col("frame")).cast("long").as("frame_bytes"),
      call_function("byte_sum", col("frame")).as("frame_sum"))
  }

  /** Synthesize a REAL image table: one `w`×`h` 24-bit BMP per input
    * row, pixels a deterministic function of the id
    * ([[graft.plans.GenBmp]]) — genuine codec bytes generated
    * distributively (no fixture table, no driver work), so the decode
    * path can be exercised and ORACLE-CHECKED at any corpus size: the
    * per-channel pixel means [[decodeImage]] extracts are predictable
    * arithmetic over (id, x, y). */
  def imageTable(docs: DataFrame, idCol: String, w: Int = 4, h: Int = 4): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val media = call_function("gen_bmp", col(idCol), lit(w), lit(h))
    docs.select(
      col(idCol).as("doc_id"),
      media.as("media"),
      struct(
        lit("image/bmp").as("mime"),
        length(media).cast("long").as("n_bytes"),
        lit(1L).as("n_frames")).as("meta"))
  }

  /** REAL image decode ([[graft.plans.DecodeImage]]): pixels out of the
    * binary payload via the JDK image registry, reduced per row to
    * (width, height, per-channel means). Undecodable payloads yield
    * null stats — skipped, not fabricated. Pure map-side: a native
    * expression inside whole-stage codegen, no UDF, no shuffle. */
  def decodeImage(media: DataFrame): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    media
      .select(col("doc_id"), col("meta.mime").as("mime"),
              call_function("decode_image", col("media")).as("img"))
      .select(col("doc_id"), col("mime"),
              col("img.width").as("width"), col("img.height").as("height"),
              col("img.mean_r").as("mean_r"), col("img.mean_g").as("mean_g"),
              col("img.mean_b").as("mean_b"))
  }

  /** IMAGE PERCEPTUAL DEDUP — the dedup family crossed into the image
    * modality: cluster images by average-hash
    * ([[graft.plans.ImageAhash]] — decode, integer-luminance threshold
    * against the image mean, bit per pixel), the perceptual
    * fingerprint that survives uniform brightness shifts and
    * re-encoding, where byte-level md5 sees distinct files. One row
    * per DECODABLE image: (doc_id, ahash, cluster_id = min doc id
    * sharing the hash, n_cluster, is_keeper) — the exact-dedup ledger
    * shape (q54) keyed on the perceptual hash instead of the content
    * hash. Undecodable payloads are skipped, not fabricated
    * (the decode family's contract).
    *
    * Scale shape: hashing is a native expression inside whole-stage
    * codegen (pure map over the corpus); clustering is ONE keyed
    * groupBy(ahash) + a keyed join back — the q54 plan. At production
    * image sizes [[resizeImages]] precedes the hash (the aHash
    * recipe — q128 verifies the chain); the 4×4 synthetic path is the
    * oracle-verified core. */
  def imagePerceptualDedup(media: DataFrame): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    // memoized: the hashed frame feeds two subtrees (cluster groupBy +
    // join back), and without the barrier projection-collapse would
    // re-inline the decode into every reference (cacheOnce contract)
    val hashed = graft.queries.cacheOnce(media
      .select(col("doc_id"), call_function("image_ahash", col("media")).as("ahash"))
      .filter(col("ahash").isNotNull))
    val clusters = hashed.groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("cluster_id"), count(lit(1)).as("n_cluster"))
    hashed.join(clusters, Seq("ahash"))
      .select(col("doc_id"), col("ahash"), col("cluster_id"), col("n_cluster"),
              (col("doc_id") === col("cluster_id")).cast("long").as("is_keeper"))
  }

  /** IMAGE RESIZE — box-filter downsample as a media→media transform
    * ([[graft.plans.ImageResize]]): integer per-channel box means,
    * re-encoded as BMP bytes so the result feeds [[decodeImage]] /
    * [[imagePerceptualDedup]] unchanged (resize-then-hash is the aHash
    * recipe for production-size images). Pure map-side native
    * expression; undecodable or would-be-upscaled payloads null out
    * and downstream decode stages skip them. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    val resized = call_function("image_resize", col("media"), lit(w), lit(h))
    media.select(
      col("doc_id"),
      resized.as("media"),
      struct(
        col("meta.mime").as("mime"),
        length(resized).cast("long").as("n_bytes"),
        col("meta.n_frames").as("n_frames")).as("meta"))
  }

  /** AUDIO PERCEPTUAL DEDUP — the ledger's third modality: cluster
    * clips by the energy-contour fingerprint
    * ([[graft.plans.AudioEnergyFp]] — per-frame integer energy, delta
    * signs packed into a long), which survives volume scaling and
    * re-encoding where byte-level md5 sees distinct files. Same
    * (doc_id, fp, cluster_id, n_cluster, is_keeper) shape as
    * [[imagePerceptualDedup]]; same q54 plan: native-expression map +
    * one keyed groupBy + a keyed join back. */
  def audioPerceptualDedup(media: DataFrame, frameSamples: Int = 16): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    val hashed = graft.queries.cacheOnce(media
      .select(col("doc_id"),
              call_function("audio_energy_fp", col("media"), lit(frameSamples)).as("fp"))
      .filter(col("fp").isNotNull))
    val clusters = hashed.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("cluster_id"), count(lit(1)).as("n_cluster"))
    hashed.join(clusters, Seq("fp"))
      .select(col("doc_id"), col("fp"), col("cluster_id"), col("n_cluster"),
              (col("doc_id") === col("cluster_id")).cast("long").as("is_keeper"))
  }

  /** Synthesize a REAL video table: one multi-frame animated GIF per
    * input row ([[graft.plans.GenGif]] — the frame-sequence container
    * the JDK both writes and reads; exact-palette indexed frames make
    * the LZW encoding LOSSLESS, so decoded pixels are predictable
    * arithmetic). Frame f extends the BMP pixel formula along the time
    * axis (+17f). */
  def videoTable(docs: DataFrame, idCol: String, w: Int = 4, h: Int = 4,
                 nFrames: Int = 4): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val media = call_function("gen_gif", col(idCol), lit(w), lit(h), lit(nFrames))
    docs.select(
      col(idCol).as("doc_id"),
      media.as("media"),
      struct(
        lit("video/gif").as("mime"),
        length(media).cast("long").as("n_bytes"),
        lit(nFrames.toLong).as("n_frames")).as("meta"))
  }

  /** Synthesize a REAL AVI video table ([[graft.plans.GenAvi]]): one
    * RIFF/AVI container per row with uncompressed-DIB frames — the
    * industry container flavor next to [[videoTable]]'s GIF sequence,
    * decoded by the hand-written RIFF walker rather than an ImageIO
    * plugin. Same time-extended pixel formula (bit-exact DIB storage),
    * so the same arithmetic oracle replays every channel mean; width
    * 5 exercises the format's 4-byte row padding. */
  def videoTableAvi(docs: DataFrame, idCol: String, w: Int = 5, h: Int = 3,
                    nFrames: Int = 5): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val media = call_function("gen_avi", col(idCol), lit(w), lit(h), lit(nFrames))
    docs.select(
      col(idCol).as("doc_id"),
      media.as("media"),
      struct(
        lit("video/avi").as("mime"),
        length(media).cast("long").as("n_bytes"),
        lit(nFrames.toLong).as("n_frames")).as("meta"))
  }

  /** REAL video decode ([[graft.plans.DecodeVideo]]) — the modality's
    * declared stub, RETIRED: every stored frame decoded through the
    * JDK's GIF reader (or the AVI container walker — DIB and MJPEG
    * chunks) and reduced to per-channel means, exploded to
    * one row per (video, frame). Undecodable payloads are skipped, not
    * fabricated. Pure map-side: a native expression + explode, zero
    * shuffles at any corpus size. */
  def decodeVideo(media: DataFrame): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    media
      .select(col("doc_id"), col("meta.mime").as("mime"),
              explode(call_function("decode_video", col("media"))).as("fr"))
      .select(col("doc_id"), col("mime"),
              col("fr.frame_idx").as("frame_idx"),
              col("fr.width").as("width"), col("fr.height").as("height"),
              col("fr.mean_r").as("mean_r"), col("fr.mean_g").as("mean_g"),
              col("fr.mean_b").as("mean_b"))
  }

  /** AUDIO ACTIVITY SEGMENTATION — energy-gated VAD (the
    * silence-trimming primitive audio curation runs before training):
    * per-frame integer energies ([[graft.plans.AudioFrameEnergy]]),
    * frames above `threshold` grouped into contiguous ACTIVE segments
    * by gaps-and-islands. One row per active segment:
    * (doc_id, seg_idx, start_frame, end_frame, n_frames, e_sum) —
    * integer-exact end to end, so the oracle replays every segment.
    *
    * Scale shape: decode + explode is map-side; the islands windows
    * are keyed BY CLIP (frames-per-clip-sized — never global); one
    * keyed groupBy. */
  def audioActivitySegments(media: DataFrame, frameSamples: Int = 16,
                            threshold: Long = 5600000L): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    val en = media.select(col("doc_id"),
      posexplode(call_function("audio_frame_energy", col("media"), lit(frameSamples)))
        .as(Seq("frame", "e")))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    val segs = en.filter(col("e") > threshold)
      .withColumn("grp", col("frame") - row_number().over(w1))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("frame")).as("start_frame"), max(col("frame")).as("end_frame"),
           count(lit(1)).as("n_frames"), sum(col("e")).as("e_sum"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("start_frame"))
    segs.select(col("doc_id"), row_number().over(w2).cast("long").as("seg_idx"),
                col("start_frame").cast("long").as("start_frame"),
                col("end_frame").cast("long").as("end_frame"),
                col("n_frames"), col("e_sum"))
  }

  /** VIDEO TEMPORAL PROFILE — frame-to-frame change statistics over
    * [[decodeVideo]]'s per-frame means: the per-transition L1 delta of
    * the channel means and a cut flag at `cutThreshold` — the
    * scene-change signal a video curation pipeline keys frame
    * sampling on (sample densely around cuts, sparsely inside static
    * scenes). One row per (video, transition), frame_idx ≥ 1.
    *
    * Scale shape: decode is map-side; the lag window is keyed BY VIDEO
    * (frames-per-video-sized partitions — never a global window). The
    * means are exact k/(w·h) doubles, so deltas and the flag replay
    * exactly in any engine. */
  def videoSceneStats(media: DataFrame, cutThreshold: Double = 100.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    decodeVideo(media)
      .select(col("doc_id"), col("frame_idx"),
              col("mean_r"), col("mean_g"), col("mean_b"))
      .select(col("doc_id"), col("frame_idx"),
              (abs(col("mean_r") - lag(col("mean_r"), 1).over(w)) +
               abs(col("mean_g") - lag(col("mean_g"), 1).over(w)) +
               abs(col("mean_b") - lag(col("mean_b"), 1).over(w))).as("delta"))
      .filter(col("delta").isNotNull)
      .select(col("doc_id"), col("frame_idx"),
              round(col("delta"), 6).as("delta"),
              (col("delta") > cutThreshold).cast("long").as("scene_cut"))
  }

  /** VIDEO PERCEPTUAL DEDUP — the fourth modality of the ledger, and a
    * pure COMPOSITION: the fingerprint is the luminance-contour delta
    * signs over [[graft.plans.DecodeVideo]]'s frame array, computed
    * entirely with higher-order array functions on the decode output
    * (no new native code — the audio recipe applied to the frame
    * axis). Frame luminance = mean_r + mean_g + mean_b (exact k/(w·h)
    * doubles), bit k set iff lum(k+1) > lum(k); same
    * (doc_id, fp, cluster_id, n_cluster, is_keeper) ledger, same q54
    * plan. Videos with < 2 decodable frames (or undecodable bytes)
    * are skipped. */
  /** The video fingerprint as ONE column expression: luminance-contour
    * delta signs over decode_video's frame array (null for undecodable
    * payloads or < 2 frames). Shared by [[videoPerceptualDedup]] and
    * the streaming gate — being a pure per-row expression is exactly
    * what makes the gate append-mode streaming-safe. */
  def videoContourFpCol(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val lum = transform(call_function("decode_video", media), f =>
      f.getField("mean_r") + f.getField("mean_g") + f.getField("mean_b"))
    // bit budget: ≤ 65 frames ⇒ ≤ 64 transitions ⇒ bits 0..63. Beyond
    // that shiftleft wraps its shift amount mod 64 and distinct long
    // videos would alias onto the low bits (false dedup drops) — the
    // audio AudioEnergyFp contract mirrored onto the frame axis.
    // Longer videos should fingerprint per fixed-length window.
    //
    // r17 (guide §1.2 per-task work): the fold body is LET-BOUND over
    // the decoded array via transform(array(lum), l -> ...)[1].
    // Higher-order functions evaluate interpreted (no whole-stage
    // subexpression elimination inside the lambda), so the former
    // inline form re-evaluated `lum` — a FULL GIF decode — at every
    // element_at/size reference: ~2 decodes per fold step, ≥ 2(n−1)+2
    // decodes per row for an n-frame video. Binding `lum` to a lambda
    // variable decodes exactly once per row; the arithmetic (and the
    // fp bit pattern) is unchanged. Measured: q140 118.4 s → see
    // OPTIMIZATION_r17.md.
    element_at(
      transform(array(lum), l =>
        when(size(l).between(2, 65),
          aggregate(sequence(lit(1), size(l) - 1), lit(0L),
            (acc, k) => acc + when(element_at(l, k + 1) > element_at(l, k),
                                   call_function("shiftleft", lit(1L),
                                                 (k - 1).cast("int")))
                              .otherwise(lit(0L))))
          .otherwise(lit(null).cast("long"))),
      1)
  }

  def videoPerceptualDedup(media: DataFrame): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    val hashed = graft.queries.cacheOnce(media
      .select(col("doc_id"), videoContourFpCol(col("media")).as("fp"))
      .filter(col("fp").isNotNull))
    val clusters = hashed.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("cluster_id"), count(lit(1)).as("n_cluster"))
    hashed.join(clusters, Seq("fp"))
      .select(col("doc_id"), col("fp"), col("cluster_id"), col("n_cluster"),
              (col("doc_id") === col("cluster_id")).cast("long").as("is_keeper"))
  }

  /** NEAR-duplicate perceptual ledger over an arbitrary hashed
    * (doc_id, fp) frame — the point of a perceptual hash is the
    * Hamming NEIGHBORHOOD, not exact equality (r11 verdict gap #3: the
    * four exact ledgers cluster on fp equality; a re-encoded image one
    * luminance bit off escaped them). Pipeline: banded-Hamming
    * candidate pairs ([[TextDedup.fingerprintNearDupPairs]] — perfect
    * recall by pigeonhole, hash join never cross join) → connected
    * components ([[TextDedup.dupClusters]] — adaptive driver
    * union-find / distributed min-label propagation) → the familiar
    * (doc_id, fp, cluster_id, n_cluster, is_keeper) ledger, now with
    * cluster_id = min doc id REACHABLE within Hamming ≤ maxHamming
    * steps, not merely equal-fp. `widthBits` is the fingerprint's
    * significant bit count (image aHash 16, default audio contour 15,
    * an n-frame video contour n−1). */
  def perceptualNearDedup(hashed: DataFrame, widthBits: Int,
                          maxHamming: Int = 2): DataFrame = {
    val fps = graft.queries.cacheOnce(hashed.select(col("doc_id"), col("fp")))
    // Band, join, and cluster the DISTINCT-fingerprint graph, not the
    // asset graph: perceptual hashes collide heavily by design (that is
    // their point), so doc-level banding puts every copy of a popular
    // fingerprint in the same band bucket and the candidate join
    // squares the copy count — measured 15-18 s per modality at sf0.1
    // vs 0.3 s for the exact ledger, and quadratically worse as the
    // corpus grows. The distinct-fp frame is bounded by min(n,
    // 2^widthBits) rows — for the ≤16-bit perceptual hashes the ENTIRE
    // near-dup graph is hash-space-sized no matter the corpus — and
    // doc-level connectivity equals fp-level connectivity expanded
    // (equal fps are Hamming-0 neighbors, so every doc path maps to an
    // fp path and back). The fp value itself serves as the graph node
    // id; min-fp cluster labels then lift to min-doc-id cluster ids by
    // one keyed aggregation over the assets.
    val distinctFp = graft.queries.cacheOnce(fps.select(col("fp")).distinct())
    val pairs = TextDedup.fingerprintNearDupPairs(
      distinctFp.select(col("fp").as("fpid"), col("fp")), "fpid", "fp",
      widthBits, maxHamming)
    val fpClusters = TextDedup.dupClusters(
        distinctFp.select(col("fp").as("doc_id")), pairs)
      .select(col("doc_id").as("fp"), col("cluster").as("fpc"))
    // fp → component join is distinct-fp-sized (unhinted — AQE
    // broadcasts when it fits); per component the cluster id is the
    // min member doc and the size its population
    val withFpc = fps.join(fpClusters, Seq("fp"))
    val perCluster = withFpc.groupBy(col("fpc"))
      .agg(min(col("doc_id")).as("cluster_id"), count(lit(1)).as("n_cluster"))
    withFpc.join(perCluster, Seq("fpc"))
      .select(col("doc_id"), col("fp"), col("cluster_id"), col("n_cluster"),
              (col("doc_id") === col("cluster_id")).cast("long").as("is_keeper"))
  }

  /** Image near-dedup: [[perceptualNearDedup]] over the 16-bit aHash
    * (4×4 synthetic core; production images go through
    * [[resizeImages]] first, exactly as [[imagePerceptualDedup]]). */
  def imageNearDedup(media: DataFrame, maxHamming: Int = 2): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    perceptualNearDedup(
      media.select(col("doc_id"),
                   call_function("image_ahash", col("media")).as("fp"))
        .filter(col("fp").isNotNull),
      widthBits = 16, maxHamming = maxHamming)
  }

  /** Audio near-dedup: [[perceptualNearDedup]] over the energy-contour
    * fingerprint (nFrames − 1 delta-sign bits). */
  def audioNearDedup(media: DataFrame, frameSamples: Int = 16,
                     widthBits: Int = 15, maxHamming: Int = 2): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    perceptualNearDedup(
      media.select(col("doc_id"),
                   call_function("audio_energy_fp", col("media"),
                                 lit(frameSamples)).as("fp"))
        .filter(col("fp").isNotNull),
      widthBits = widthBits, maxHamming = maxHamming)
  }

  /** Video near-dedup: [[perceptualNearDedup]] over the
    * luminance-contour fingerprint ([[videoContourFpCol]], n − 1 bits
    * for n-frame videos — callers pass the frame budget they encoded
    * at). */
  def videoNearDedup(media: DataFrame, widthBits: Int,
                     maxHamming: Int = 2): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    perceptualNearDedup(
      media.select(col("doc_id"), videoContourFpCol(col("media")).as("fp"))
        .filter(col("fp").isNotNull),
      widthBits = widthBits, maxHamming = maxHamming)
  }

  /** PER-WINDOW luminance-contour fingerprints — the long-video path
    * the single-fp bit budget excludes (videos beyond 65 frames have
    * > 64 transitions, and [[videoContourFpCol]] correctly nulls them
    * rather than alias bits mod 64 — but nulling silently EXEMPTED
    * every long video from perceptual dedup, r12 verdict gap #2).
    * Frames split into fixed-length index-aligned windows of
    * `windowFrames` frames; each window with ≥ 2 frames fingerprints
    * its own delta-sign contour (≤ windowFrames − 1 ≤ 64 bits — back
    * inside the budget at ANY video length). One row per
    * (doc_id, win_idx, fp); trailing sub-2-frame windows and
    * undecodable payloads are skipped, not fabricated.
    *
    * Scale shape: decode + posexplode is map-side; the delta window is
    * keyed by (video, window) — partitions of ≤ windowFrames rows —
    * and one keyed groupBy folds the bits. */
  def videoWindowFps(media: DataFrame, windowFrames: Int = 33): DataFrame = {
    require(windowFrames >= 3 && windowFrames <= 65,
            s"windowFrames out of range: $windowFrames")
    GraftFunctions.register(media.sparkSession)
    val lum = transform(call_function("decode_video", col("media")), f =>
      f.getField("mean_r") + f.getField("mean_g") + f.getField("mean_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("win_idx")).orderBy(col("fidx"))
    media.select(col("doc_id"), posexplode(lum).as(Seq("fidx", "l")))
      .withColumn("win_idx", floor(col("fidx") / windowFrames).cast("long"))
      .withColumn("nxt", lead(col("l"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("doc_id"), col("win_idx"))
      .agg(sum(when(col("nxt") > col("l"),
                    call_function("shiftleft", lit(1L),
                                  pmod(col("fidx"), lit(windowFrames))
                                    .cast("int")))
               .otherwise(lit(0L))).as("fp"))
  }

  /** Long-video NEAR-dedup: two videos are near-duplicates iff ANY
    * index-aligned window pair agrees within Hamming ≤ `maxHamming`
    * (or shares a fingerprint exactly), connected components close the
    * relation transitively. Windows are fixed-length and
    * index-matched, so this catches re-encodes / quality variants of
    * arbitrarily long videos; a temporally CROPPED copy shifts the
    * window grid and is out of scope (documented contract — offset
    * robustness needs overlapping windows, a recall/cost knob this
    * operator deliberately doesn't spend). Plan shape in
    * [[windowNearDedupLedger]]. */
  def videoNearDedupWindows(media: DataFrame, windowFrames: Int = 33,
                            maxHamming: Int = 2): DataFrame =
    windowNearDedupLedger(videoWindowFps(media, windowFrames),
                          widthBits = windowFrames - 1, maxHamming)

  /** PER-WINDOW energy-contour fingerprints — the long-AUDIO path the
    * single-fp bit budget excludes ([[graft.plans.AudioEnergyFp]]
    * correctly nulls clips with > 64 frames rather than alias bits
    * mod 64 — but nulling silently EXEMPTED every long clip from
    * perceptual dedup, the exact class [[videoWindowFps]] closed for
    * video). Frames of `frameSamples` samples split into fixed-length
    * index-aligned windows of `windowFrames` frames; each window with
    * ≥ 2 frames fingerprints its own energy-delta sign contour
    * (≤ windowFrames − 1 ≤ 64 bits at ANY clip length). One row per
    * (doc_id, win_idx, fp); trailing sub-2-frame windows and
    * undecodable payloads are skipped, not fabricated.
    *
    * Scale shape: decode + posexplode is map-side; the delta window is
    * keyed by (clip, window) — partitions of ≤ windowFrames rows —
    * and one keyed groupBy folds the bits. */
  def audioWindowFps(media: DataFrame, frameSamples: Int = 16,
                     windowFrames: Int = 33): DataFrame = {
    require(windowFrames >= 3 && windowFrames <= 65,
            s"windowFrames out of range: $windowFrames")
    GraftFunctions.register(media.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("win_idx")).orderBy(col("fidx"))
    media.select(col("doc_id"),
        posexplode(call_function("audio_frame_energy", col("media"),
                                 lit(frameSamples))).as(Seq("fidx", "e")))
      .withColumn("win_idx", floor(col("fidx") / windowFrames).cast("long"))
      .withColumn("nxt", lead(col("e"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("doc_id"), col("win_idx"))
      .agg(sum(when(col("nxt") > col("e"),
                    call_function("shiftleft", lit(1L),
                                  pmod(col("fidx"), lit(windowFrames))
                                    .cast("int")))
               .otherwise(lit(0L))).as("fp"))
  }

  /** Long-audio NEAR-dedup: [[audioWindowFps]] fed through the same
    * any-window banded-Hamming agreement + transitive closure as
    * [[videoNearDedupWindows]] (index-aligned windows — re-encodes /
    * volume variants of arbitrarily long clips; a temporally cropped
    * copy shifts the window grid, same documented contract). */
  def audioNearDedupWindows(media: DataFrame, frameSamples: Int = 16,
                            windowFrames: Int = 33,
                            maxHamming: Int = 2): DataFrame =
    windowNearDedupLedger(audioWindowFps(media, frameSamples, windowFrames),
                          widthBits = windowFrames - 1, maxHamming)

  /** Shared long-media window-dedup core over a (doc_id, win_idx, fp)
    * frame — the q252 plan: representative per DISTINCT (win_idx, fp)
    * (banding the asset graph would square copy counts; the rep graph
    * is bounded by the distinct window-fingerprint population) →
    * banded-Hamming candidates over the reps
    * ([[TextDedup.fingerprintNearDupPairs]], perfect recall by
    * pigeonhole) filtered to SAME win_idx → media-level edges (near
    * pairs + member↔rep equality spokes) → components
    * ([[TextDedup.dupClusters]]) → ledger
    * (doc_id, n_windows, cluster_id, n_cluster, is_keeper).
    * Node ids pack (doc_id, win_idx) into one long (win_idx < 2²⁰,
    * leaving 43 bits of doc-id space; callers with wider ids remap
    * before packing). */
  private def windowNearDedupLedger(wfps0: DataFrame, widthBits: Int,
                                    maxHamming: Int): DataFrame = {
    val pack = 1L << 20
    val wfps = graft.queries.cacheOnce(wfps0)
    val packed = wfps.select(col("doc_id"), col("win_idx"), col("fp"),
      (col("doc_id") * pack + col("win_idx")).as("nid"))
    val reps = graft.queries.cacheOnce(
      packed.groupBy(col("win_idx"), col("fp")).agg(min(col("nid")).as("nid")))
    val rawPairs = TextDedup.fingerprintNearDupPairs(
      reps.select(col("nid").as("id"), col("fp")), "id", "fp",
      width = widthBits, maxHamming = maxHamming)
    val nearEdges = rawPairs
      .filter(pmod(col("da"), lit(pack)) === pmod(col("db"), lit(pack)))
      .select(expr(s"da div $pack").as("x"), expr(s"db div $pack").as("y"))
    val eqEdges = packed
      .join(reps.select(col("win_idx"), col("fp"), col("nid").as("rep_nid")),
            Seq("win_idx", "fp"))
      .filter(col("nid") =!= col("rep_nid"))
      .select(expr(s"nid div $pack").as("x"), expr(s"rep_nid div $pack").as("y"))
    val edges = nearEdges.unionByName(eqEdges)
      .select(least(col("x"), col("y")).as("da"),
              greatest(col("x"), col("y")).as("db"))
      .filter(col("da") =!= col("db")).distinct()
    val docs = wfps.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"))
    val clusters = TextDedup.dupClusters(docs.select(col("doc_id")), edges)
      .select(col("doc_id"), col("cluster").as("cluster_id"))
    val sizes = clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cluster"))
    docs.join(clusters, Seq("doc_id")).join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("n_windows"), col("cluster_id"),
              col("n_cluster"),
              (col("doc_id") === col("cluster_id")).cast("long").as("is_keeper"))
  }

  /** Synthesize a REAL audio table: one 16-bit PCM mono WAV per input
    * row ([[graft.plans.GenWav]]), sample t of clip `id` carrying
    * `((id·31 + t·7919) mod 2048) − 1024` — genuine codec bytes
    * generated distributively, so audio decode is exercised and
    * ORACLE-CHECKED at any corpus size (sums are integer-exact; mean
    * and RMS one IEEE op away). */
  def audioTable(docs: DataFrame, idCol: String,
                 nSamples: Int = 256, sampleRate: Int = 8000): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val media = call_function("gen_wav", col(idCol), lit(nSamples), lit(sampleRate))
    docs.select(
      col(idCol).as("doc_id"),
      media.as("media"),
      struct(
        lit("audio/wav").as("mime"),
        length(media).cast("long").as("n_bytes"),
        lit(1L).as("n_frames")).as("meta"))
  }

  /** REAL audio decode ([[graft.plans.DecodeAudio]]): PCM frames out of
    * the binary payload via the JDK audio registry, reduced per row to
    * (sample_rate, channels, n_samples, mean/RMS amplitude, zero
    * crossings). Undecodable payloads yield null stats — skipped, not
    * fabricated. Pure map-side, inside whole-stage codegen. */
  def decodeAudio(media: DataFrame): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    media
      .select(col("doc_id"), col("meta.mime").as("mime"),
              call_function("decode_audio", col("media")).as("au"))
      .select(col("doc_id"), col("mime"),
              col("au.sample_rate").as("sample_rate"),
              col("au.channels").as("channels"),
              col("au.n_samples").as("n_samples"),
              col("au.mean_amp").as("mean_amp"),
              col("au.rms_amp").as("rms_amp"),
              col("au.zero_cross").as("zero_cross"))
  }

}
