package graft.ts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-index normalization — the reference's signature ops (SURVEY §2.3).
  *
  * Reference behavior: `/root/reference/temporal_retriever/core.py:6-59`
  * (`reset_time_index`) and `app.py:70-93` (`prepare_dataset`): parse
  * ISO8601 → UTC-naive, fall back to "mixed" format on failure, then
  * bucket the time index to the requested grain.
  *
  * Spark-first design decisions:
  *   - Parsing is per-VALUE, not per-column: `try_to_timestamp` returns
  *     null instead of raising, so the reference's try/except column-level
  *     fallback (`app.py:79-87`) becomes a single `coalesce` chain. A
  *     column mixing ISO and `dd-MM-yyyy HH:mm` values parses row-by-row —
  *     a strict improvement, documented divergence.
  *   - Buckets use the period-START convention internally (`date_trunc`),
  *     which is shuffle/window friendly and identical to Structured
  *     Streaming's `window(ds, …).start`. The reference's pandas
  *     period-END labels (`core.py:42-53`, `.end_time`) are rendered only
  *     at output via [[bucketEnd]] / [[periodEndLabel]].
  *   - All functions return `Column`s: they compose into any plan and stay
  *     inside whole-stage codegen (no UDFs).
  */
object TimeOps {

  /** Ordered fallback formats after native ISO8601 parsing. The reference
    * relies on pandas `format="mixed"` inference (`app.py:85`); we pin an
    * explicit, deterministic list (first match wins). `dd-MM-yyyy HH:mm`
    * is the format of `electricity_demand.json`. */
  val FallbackFormats: Seq[String] = Seq(
    "dd-MM-yyyy HH:mm",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "MM/dd/yyyy HH:mm"
  )

  /** T1 + T2: parse a string column to timestamp; ISO8601 first, then the
    * fallback formats. Session time zone must be UTC (the reference
    * normalizes `utc=True` then drops tz, `core.py:37`, `app.py:428`). */
  def parseTimestamp(c: Column): Column =
    coalesce(try_to_timestamp(c) +: FallbackFormats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** Grain spellings accepted by the request layer. The reference's enum
    * says "min" (`app.py:39`) but its implementation matches "m"
    * (`core.py:56`) — a crash (`core.py:59`) we deliberately do not
    * reproduce: both spellings (and pandas' "T") normalize to minute. */
  def normalizeGrain(grain: String): String = grain match {
    case "D" | "day"            => "D"
    case "W" | "week"           => "W"
    case "M" | "month"          => "M"
    case "H" | "hour"           => "H"
    case "m" | "min" | "T" | "minute" => "m"
    case g => throw new IllegalArgumentException(s"Unsupported granularity: $g")
  }

  /** T3: bucket `ds` to the period START of the grain (None = identity,
    * `core.py:36-37`). */
  def bucket(ds: Column, grain: Option[String]): Column = grain match {
    case None => ds
    case Some(g) => normalizeGrain(g) match {
      case "D" => date_trunc("day", ds)
      case "W" => date_trunc("week", ds) // ISO week start (Monday), like pandas to_period("W")
      case "M" => date_trunc("month", ds)
      case "H" => date_trunc("hour", ds)
      case "m" => date_trunc("minute", ds)
    }
  }

  /** Exclusive end of the bucket containing `ds` (= next period start).
    * Equivalent to Structured Streaming's `window(ds, …).end`. */
  def bucketEnd(ds: Column, grain: String): Column = normalizeGrain(grain) match {
    case "D" => date_trunc("day", ds) + expr("INTERVAL 1 DAY")
    case "W" => date_trunc("week", ds) + expr("INTERVAL 7 DAY")
    case "M" => add_months(date_trunc("month", ds).cast("date"), 1).cast("timestamp")
    case "H" => date_trunc("hour", ds) + expr("INTERVAL 1 HOUR")
    case "m" => date_trunc("minute", ds) + expr("INTERVAL 1 MINUTE")
  }

  /** Inclusive period-end label at second resolution — the rendering of
    * pandas `.end_time` (last instant of the period, `core.py:42-53`)
    * without its nanosecond convention. Month = `last_day`. */
  def periodEndLabel(ds: Column, grain: String): Column =
    bucketEnd(ds, grain) - expr("INTERVAL 1 SECOND")
}
