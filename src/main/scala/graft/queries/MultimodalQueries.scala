package graft.queries

import graft.QueryDef
import graft.pipeline.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing over the documents table (text
  * bytes stand in for media payloads; the decode step is stubbed, the
  * Spark machinery is real). Oracles exploit ASCII payloads: byte sums
  * equal codepoint sums, so DuckDB can verify the native byte_sum
  * expression exactly. */
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

  /** q63 — stubbed decode: deterministic fake feature vectors with the
    * real schema/batch shape (no oracle — the stub marks where a codec
    * would run; rows-only check). */
  private def q63(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeStub(
        Multimodal.mediaTable(t(s, dir, "documents"), "doc_id", "text"))
      .select(col("doc_id"), col("mime"),
              round(element_at(col("features"), 1), 6).as("f0"),
              round(element_at(col("features"), 8), 6).as("f7"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q61_media_meta", q61, Some(q61Sql)),
    QueryDef("q62_frame_features", q62, Some(q62Sql)),
    QueryDef("q63_decode_stub", q63, None)
  )
}
