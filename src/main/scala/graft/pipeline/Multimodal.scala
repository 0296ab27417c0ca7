package graft.pipeline

import graft.plans.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star op; SURVEY §7.4).
  *
  * Media (image/audio/video) are opaque `binary` columns with a typed
  * metadata struct. The Spark-side machinery — schema, frame sampling,
  * per-frame features, batch shape — is real and tested; the actual
  * codec decode is STUBBED (no image/audio libraries in this
  * environment) behind [[decodeStub]], which produces deterministic
  * fake features with the same schema a real decoder would emit.
  *
  * Scale: media rows never leave executors; frame sampling is a
  * flatMap (`explode(sequence(...))`) and features are codegen'd
  * expressions ([[graft.plans.ByteSum]]), so a 100 TB media corpus
  * streams through scan → explode → project with zero shuffles.
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

  /** STUB decoder: where a real pipeline would decode pixels/samples
    * (e.g. via a vectorized UDF batching binary payloads), we emit a
    * deterministic fake "feature vector" derived from byte statistics.
    * The schema and batch shape match what a real decoder would return. */
  def decodeStub(media: DataFrame, dim: Int = 8): DataFrame = {
    GraftFunctions.register(media.sparkSession)
    val feats = transform(sequence(lit(0), lit(dim - 1)),
      i => (call_function("byte_sum", col("media")) * (i + 1) % 997).cast("double") / 997.0)
    media.select(col("doc_id"), feats.as("features"),
                 col("meta.mime").as("mime"))
  }
}
