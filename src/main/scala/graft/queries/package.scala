package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One driver-contract query: a Spark plan plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. See SparkEntry. */
case class QueryDef(name: String,
                    fn: (SparkSession, String) => DataFrame,
                    oracle: Option[String])

package object queries {

  /** Read one driver table (TESTDATA.md). Parquet scan → column pruning
    * and predicate pushdown apply to everything built on top.
    *
    * The events table stores TIMESTAMP(NANOS) which Spark 4 rejects
    * unless nanos are read as raw longs; we normalize back to a real
    * (microsecond) TimestampType column with exact integer division, so
    * downstream plans are format-agnostic. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      .getOrElse(df)
  }

  /** Exact integer cents: the oracle-parity workhorse. Floating sums are
    * summation-order-dependent (Spark partials vs DuckDB), so any
    * aggregate the driver hash-compares is computed on
    * `round(x*100)::long`. The per-row double product/round is identical
    * IEEE arithmetic in both engines → bit-stable hashes at any scale. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Derived mean with deterministic float: exact-int sum / 100.0 / n,
    * rounded — single-expression IEEE math on identical inputs. */
  def meanFromCents(sumCents: Column, n: Column): Column =
    round(sumCents / 100.0 / n, 6)

  /** Day bucket as DATE (DuckDB `date_trunc('day', ts)` yields DATE;
    * Spark yields TIMESTAMP — cast for parity). Named to avoid shadowing
    * clashes with `functions.day` (wildcard imports outrank package-object
    * members from other files in Scala 2 precedence). */
  def dayBucket(c: Column): Column = to_date(date_trunc("day", c))

  /** Second-truncated timestamp: events carry nanoseconds, which Spark
    * truncates to micros on read but DuckDB preserves — raw `ts` values
    * must never be emitted by an oracle-checked query. */
  def toSecond(c: Column): Column = date_trunc("second", c)

  /** Idempotent cache: repeated pipeline invocations produce the same
    * canonicalized plan, and calling `.cache()` on it again makes the
    * CacheManager log "already cached" warnings. `storageLevel` is the
    * public probe for an existing entry.
    *
    * Lifecycle contract: the CALLER owns release. Each distinct
    * input/param combination is a distinct canonicalized plan and
    * therefore a distinct CacheManager entry for the session's lifetime;
    * pipelines that cache request-scoped frames must expose an
    * unpersist path (AnalyzePipeline → `AnalyzeResult.close()`,
    * TextQueries → per-session memo eviction, Similarity index frames →
    * one entry per (input, params), reused across calls — a service
    * cycling many distinct corpora should `unpersist()` retired ones). */
  def cacheOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.cache() else df
}
