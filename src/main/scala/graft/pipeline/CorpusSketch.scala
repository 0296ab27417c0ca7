package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sketch-based corpus statistics: fixed-size, mergeable summaries for the
  * questions a 100 TB curation run asks constantly — "how many distinct
  * pages per domain?", "what are the hottest tokens?", "what does the
  * length distribution look like?" — without paying the exact answer's
  * shuffle.
  *
  * Why sketches and not the exact operators Spark already has:
  *   - `count(DISTINCT x)` shuffles every distinct VALUE; HyperLogLog
  *     ([[hllSketch]]) shuffles at most 2^p = 1024 (group, bucket, rho)
  *     rows per group regardless of cardinality, and two corpora's
  *     register frames merge by `max` — the partial-aggregate shape Spark's
  *     map-side combine already exploits.
  *   - exact global token counts shuffle the full vocabulary; a count-min
  *     matrix ([[cmsCounters]]) is d·w integers TOTAL (fixed at build
  *     time), mergeable by `+`, and answers point queries with a
  *     one-sided error bound (never under-counts, over-counts by at most
  *     εN with ε = e/w at probability 1 − (1/e)^d).
  *   - Spark's exact `percentile` collects a per-group map of every
  *     distinct value on a single reducer; a fixed-bin histogram
  *     ([[histogramQuantiles]]) is bounded by the value range / binWidth,
  *     mergeable by `+`, and its quantile estimate is off by at most one
  *     bin width.
  *
  * Every number emitted here is either an exact integer (register
  * digests, counter cells, bin ranks) or a double produced by the same
  * IEEE expression order on both engines, so the driver's DuckDB oracles
  * replay the full algorithms hash-exactly (the house rule established by
  * q79/q89: make the sketch arithmetic itself checkable, not just the
  * row counts).
  *
  * Streaming posture: [[hllRegisters]] and [[cmsCounters]] are a
  * stateless projection plus a bounded groupBy, so the same calls run
  * unchanged on a `readStream` frame in complete/update mode — the
  * streaming STATE is the sketch itself (2^p registers per group / d·w
  * cells, fixed forever), where a streaming `COUNT(DISTINCT)` would
  * grow state with cardinality. Estimates are a batch read of the sink
  * table (StreamOpsSpec pins stream ≡ batch for both).
  *
  * Reference behavior note: the reference engine (see SURVEY §2) exposes
  * exact aggregation only; this module is part of the beyond-reference
  * training-data tier the brief asks for.
  */
object CorpusSketch {

  /** 60-bit deterministic hash: first 15 hex chars of md5(salt || value)
    * as an unsigned value in a signed long. 15 chars (not 16) keeps the
    * value positive on both engines; the same parse is SQL-expressible
    * (DuckDB replays it digit-by-digit with a 4-bit shift per hex char —
    * `pow(16, 14)` exceeds 2^53 so the oracle must shift, not multiply). */
  def h60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c)), 1, 15), 16, 10).cast("long")

  /** 32-bit variant (8 hex chars) for modulo bucketing, matching the
    * deterministic-split idiom ([[TextAnalysis.deterministicSplit]]). */
  def h32(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c)), 1, 8), 16, 10).cast("long")

  // ---------------------------------------------------------------- HLL

  /** HyperLogLog register frame: (group, bucket, rho) with
    * bucket = top p bits of the 60-bit hash, rho = 1 + leading zeros of
    * the remaining q = 60 − p bits (q + 1 when they are all zero).
    * `groupBy(bucket).max(rho)` IS the sketch — at most 2^p rows per
    * group survive the shuffle however many values went in, and the
    * registers of a union of corpora are the element-wise max of their
    * register frames ([[hllMerge]]).
    *
    * rho is computed from `length(bin(rem))` — exact integer string
    * arithmetic, identical in Spark and DuckDB (both print minimal-width
    * binary) — never from floating log2, whose ulp error at power-of-two
    * boundaries would flip a register. */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
                   p: Int = 10, salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p outside [4,16]")
    val q = 60 - p
    val h = h60(col(valueCol), salt)
    val rem = h.bitwiseAND(lit((1L << q) - 1))
    df.select(col(groupCol),
              shiftright(h, q).as("bucket"),
              when(rem === 0, lit(q + 1))
                .otherwise(lit(q + 1) - length(bin(rem))).as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max("rho").as("rho"))
  }

  /** Merge two register frames over the same (group, bucket) space:
    * element-wise max. Distributivity of max is the whole mergeability
    * story — sketch each shard where it lives, union the (tiny) register
    * frames, re-max. */
  def hllMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol), col("bucket"))
      .agg(max("rho").as("rho"))

  /** Cardinality estimate per group from a register frame.
    *
    * Emits the exact-integer digest of the registers next to the
    * estimate: `v_empty` (registers never touched) and `sum_scaled`
    * (Σ 2^(q+1−rho) over all m registers, empty ones contributing
    * 2^(q+1) — the HLL harmonic denominator scaled by 2^(q+1) so it is
    * an exact BIGINT). The estimate itself is the standard
    * α_m·m²/Z with the linear-counting small-range correction
    * m·ln(m/V) when the raw estimate ≤ 2.5m and V > 0; no large-range
    * correction is needed at a 60-bit hash. Both engines compute the
    * double with the same literal expression order, and `round(.., 2)`
    * absorbs any last-ulp `ln` divergence. */
  def hllEstimate(registers: DataFrame, groupCol: String, p: Int = 10): DataFrame = {
    val q = 60 - p
    val m = 1L << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)   // m >= 128 constant
    val scale = math.pow(2.0, q + 1)          // 2^(q+1), exact power of two
    val agg = registers.groupBy(col(groupCol))
      .agg(count(lit(1)).as("occupied"),
           sum(pow(lit(2.0), lit(q + 1) - col("rho")).cast("long")).as("occ_scaled"))
      .withColumn("v_empty", lit(m) - col("occupied"))
      .withColumn("sum_scaled",
                  col("occ_scaled") + col("v_empty") * lit(scale).cast("long"))
    val estRaw = lit(alpha) * lit(m.toDouble * m.toDouble) * lit(scale) / col("sum_scaled")
    agg.withColumn("est",
        round(when(estRaw <= lit(2.5 * m) && col("v_empty") > 0,
                   lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty")))
                .otherwise(estRaw), 2))
      .select(col(groupCol), col("v_empty"), col("sum_scaled"), col("est"))
  }

  /** Rolling distinct-over-time — THE mergeability payoff: exact
    * rolling distincts need every raw value re-scanned per window
    * position (no distributive decomposition exists), but HLL
    * registers merge by max, so a trailing window is one register
    * frame + a per-bucket running-max window. Cost is
    * days × m register rows total, independent of corpus size; the
    * window partitions by BUCKET (m = 2^p partitions) over the day
    * axis.
    *
    * Shape: per-day registers → dense (day × bucket) grid (so a
    * bucket seen only on day d still serves days d..d+w−1) → max
    * over the trailing RANGE frame → [[hllEstimate]] per day.
    * Output: (dayCol, v_empty, sum_scaled, est) — est ≈ distinct
    * values in the trailing `windowDays` ending that day. */
  def hllRollingDistinct(df: DataFrame, dayCol: String, valueCol: String,
                         windowDays: Int, p: Int = 10,
                         salt: String = "hll"): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val m = 1L << p
    val withDi = df.withColumn("di",
      datediff(col(dayCol), to_date(lit("1970-01-01"))).cast("long"))
    val regs = hllRegisters(withDi, "di", valueCol, p, salt)
    val days = withDi.select(col("di")).distinct()
    val grid = days.select(col("di"),
      explode(sequence(lit(0L), lit(m - 1))).as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("di"))
      .rangeBetween(-(windowDays - 1).toLong, 0)
    val rolled = grid.join(regs, Seq("di", "bucket"), "left")
      .withColumn("roll_rho", max(col("rho")).over(w))
      .filter(col("roll_rho").isNotNull)
      .select(col("di"), col("bucket"), col("roll_rho").as("rho"))
    hllEstimate(rolled, "di", p)
      .withColumn(dayCol,
        date_add(to_date(lit("1970-01-01")), col("di").cast("int")))
      .select(col(dayCol), col("v_empty"), col("sum_scaled"), col("est"))
  }

  /** One-call sketch: values → per-group (v_empty, sum_scaled, est). */
  def hllSketch(df: DataFrame, groupCol: String, valueCol: String,
                p: Int = 10, salt: String = "hll"): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, valueCol, p, salt), groupCol, p)

  // ---------------------------------------------------------- count-min

  /** Count-min counter matrix over a value column: d independent hash
    * rows of w buckets, cell (j, b) = how many input rows hashed to b
    * under salt j. At most d·w rows exist regardless of vocabulary size
    * — the shuffle is bounded at build time, map-side partial sums do
    * almost all the work, and two corpora's matrices merge by adding
    * cells. */
  def cmsCounters(df: DataFrame, valueCol: String,
                  d: Int = 4, w: Int = 1024, salt: String = "cms"): DataFrame = {
    require(d >= 1 && w >= 2)
    val cells = (0 until d).map { j =>
      struct(lit(j).as("j"), (h32(col(valueCol), s"$salt$j:") % w).as("bucket"))
    }
    df.select(explode(array(cells: _*)).as("cell"))
      .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for a set of candidate values: min over the d rows
    * of the counters each candidate hashes into. Never under-counts;
    * over-counts only by colliding mass. `candidates` must carry
    * `valueCol`; the counter matrix is small enough to broadcast, so the
    * estimate join never shuffles the candidate side. */
  def cmsEstimate(candidates: DataFrame, counters: DataFrame, valueCol: String,
                  d: Int = 4, w: Int = 1024, salt: String = "cms"): DataFrame = {
    val cells = (0 until d).map { j =>
      struct(lit(j).as("j"), (h32(col(valueCol), s"$salt$j:") % w).as("bucket"))
    }
    candidates
      .withColumn("cell", explode(array(cells: _*)))
      .select(col("*"), col("cell.j").as("j"), col("cell.bucket").as("bucket"))
      .drop("cell")
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(candidates.columns.toIndexedSeq.map(col): _*)
      .agg(min("c").as("cms_c"))
  }

  /** Heavy hitters with the sketch's answer next to the exact one: the
    * exact top-k tokens (deterministic order: count desc, token asc) and
    * their count-min estimates. The exact pass exists to make the sketch
    * CHECKABLE (the oracle hash-compares both); production reads the
    * counter matrix alone against an externally supplied candidate set
    * (the whole point is not to shuffle the vocabulary). */
  def cmsHeavyHitters(df: DataFrame, valueCol: String,
                      d: Int = 4, w: Int = 1024, k: Int = 20,
                      salt: String = "cms"): DataFrame = {
    val counters = cmsCounters(df, valueCol, d, w, salt)
    val exact = df.groupBy(col(valueCol)).agg(count(lit(1)).as("exact_c"))
      .orderBy(col("exact_c").desc, col(valueCol).asc)
      .limit(k)
    cmsEstimate(exact, counters, valueCol, d, w, salt)
  }

  // ------------------------------------------------- stratified sampling

  /** Deterministic per-stratum sampling: keep a row iff
    * h32(salt || stratum || '|' || key) mod 1e6 < ppm(stratum).
    * Zero shuffle (a pure filter), reproducible across runs and engines,
    * and growth-stable: a row's keep/drop never changes when other rows
    * arrive — the property that lets a 100 TB corpus be re-sampled
    * incrementally. This is the per-stratum generalization of
    * [[TextAnalysis.deterministicSplit]]: the use case is rebalancing a
    * skewed corpus (e.g. downsample the dominant language) with exact,
    * auditable rates rather than `sample()`'s seed-and-pray. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       ppm: Map[String, Long], defaultPpm: Long,
                       salt: String = "strat"): DataFrame = {
    require((ppm.values ++ Seq(defaultPpm)).forall(v => v >= 0 && v <= 1000000L),
            "rates are parts-per-million in [0, 1e6]")
    val point = h32(concat(col(stratumCol), lit("|"), col(keyCol)), salt) % 1000000L
    val rate = ppm.foldRight(lit(defaultPpm): Column) {
      case ((s, v), acc) => when(col(stratumCol) === s, lit(v)).otherwise(acc)
    }
    df.filter(point < rate)
  }

  /** Deterministic EXACT-SIZE sample: the k rows per stratum with the
    * smallest hash point (same point function as [[stratifiedSample]],
    * so the k-sample is a refinement of the fraction sample: top-k rows
    * all satisfy `point < t` whenever ≥ k rows do). Content-keyed like
    * everything here: membership survives reruns, engines, and corpus
    * growth only changes ranks below the new rows' points.
    *
    * Scale shape: the window sort ranks each stratum — a full sort of
    * the corpus when unfiltered. `prefilterPpm` bounds it: filtering
    * `point < t` FIRST is a pure projection that keeps exactly a PREFIX
    * of the (point, key) order, so the top-k of the survivors equals
    * the top-k of the stratum whenever the stratum keeps ≥ k survivors
    * — pick t with margin (E[survivors] ≈ n·t/1e6 ≥ 4k) and the window
    * sorts ~t/1e6 of the data instead of all of it. Ties on point
    * (1e6 buckets) break by key; keys must be unique per stratum. */
  def stratumTopK(df: DataFrame, stratumCol: String, keyCol: String, k: Int,
                  prefilterPpm: Option[Long] = None,
                  salt: String = "strat"): DataFrame = {
    require(k >= 1)
    val point = h32(concat(col(stratumCol), lit("|"), col(keyCol)), salt) % 1000000L
    val base = df.withColumn("point", point)
    val pre = prefilterPpm.map(t => base.filter(col("point") < t)).getOrElse(base)
    val w = Window.partitionBy(stratumCol).orderBy(col("point"), col(keyCol))
    pre.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Sequential Poisson sampling (Ohlsson 1998): a deterministic
    * WEIGHTED exact-size sample — the k rows per stratum with the
    * smallest priority u/w, where u is the content-keyed hash point
    * and w the row's weight (importance ∝ w, e.g. document length or
    * a quality score: a row with twice the weight is ~twice as likely
    * to make the sample). Priorities stay on an exact integer grid —
    * `((point+1) · 1e9) div w` — so ordering is engine-identical;
    * ties (grid collisions) break by key. Weights must be positive
    * and ≤ ~9e9 (grid headroom: (1e6 · 1e9) stays far under 2^63).
    *
    * Same scale posture as [[stratumTopK]]: a per-stratum rank
    * window; `prefilterE3` keeps only rows with priority below a
    * threshold (per-mille of the max-priority grid 1e9·1e6) before
    * ranking — a pure projection prefix of the priority order, exact
    * whenever ≥ k rows survive per stratum. */
  def seqPoissonSample(df: DataFrame, stratumCol: String, keyCol: String,
                       weightCol: String, k: Int,
                       prefilterE3: Option[Long] = None,
                       salt: String = "seqpois"): DataFrame = {
    require(k >= 1)
    val point = h32(concat(col(stratumCol), lit("|"), col(keyCol)), salt) % 1000000L
    val base = df
      .filter(col(weightCol) > 0)
      .withColumn("point", point)
      .withColumn("priority",
        expr(s"((point + 1) * 1000000000) div CAST($weightCol AS BIGINT)"))
      .drop("point")
    // threshold per-mille of the 1e6·1e9 max-priority grid, exact longs
    val pre = prefilterE3
      .map(t => base.filter(col("priority") < lit(t * 1000000000000L)))
      .getOrElse(base)
    val w = Window.partitionBy(stratumCol).orderBy(col("priority"), col(keyCol))
    pre.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** EXACT per-group percentiles via the value-grid decomposition:
    * group → distinct (value, count) grid → cumulative counts over
    * the grid → value at rank ceil(q·n/100) (integer arithmetic,
    * (n·q + 99) div 100 — the q97 rank rule without the binning
    * error). The window sorts GRID rows (distinct values per group),
    * never corpus rows — for a length-like column that is thousands
    * of rows at any corpus size; [[histogramQuantiles]] remains the
    * knob when even the distinct-value grid is too wide. Output:
    * (group, q_pct, n, exact) — long format, one row per requested
    * percentile. */
  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       qPcts: Seq[Int]): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(v => v > 0 && v <= 100))
    val grid = df
      .select(col(groupCol), col(valueCol).cast("long").as("v"))
      .groupBy(col(groupCol), col("v")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val cum = grid
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    cum
      .withColumn("q_pct", explode(array(qPcts.map(q => lit(q.toLong)): _*)))
      .filter(col("cum") - col("c") < expr("(n * q_pct + 99) div 100") &&
              expr("(n * q_pct + 99) div 100") <= col("cum"))
      .select(col(groupCol), col("q_pct"), col("n").cast("long").as("n"),
        col("v").as("exact"))
  }

  /** WEIGHTED lower median per group over the value grid — the
    * volume-aware center a pricing or mixture audit wants ("the
    * median DOLLAR was spent at price X", not "the median ORDER LINE
    * had price X"). Definition: the smallest value v whose cumulative
    * weight (ordered by value) reaches half the total —
    * 2·cum ≥ tot on exact longs, the weighted analogue of
    * [[exactPercentiles]]' rank rule; with unit weights it reduces to
    * the classic lower median. Output: (group, n_rows, tot_w,
    * wmedian).
    *
    * Scale shape: identical to [[exactPercentiles]] — one keyed grid
    * aggregate, two grid-sized keyed windows, a cover filter. The
    * window never sees corpus rows, only the distinct-value grid. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    val grid = df
      .select(col(groupCol), col(valueCol).cast("long").as("v"),
              col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .groupBy(col(groupCol), col("v"))
      .agg(sum(col("w")).as("wg"), count(lit(1)).as("c"))
    val wCum = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    grid
      .withColumn("cum", sum(col("wg")).over(wCum))
      .withColumn("tot", sum(col("wg")).over(wAll))
      .withColumn("n", sum(col("c")).over(wAll))
      .filter(col("cum") * 2 >= col("tot") &&
              (col("cum") - col("wg")) * 2 < col("tot"))
      .select(col(groupCol), col("n").as("n_rows"), col("tot").as("tot_w"),
              col("v").as("wmedian"))
  }

  // ------------------------------------------------- histogram quantiles

  /** Fixed-bin histogram quantiles per group, long format:
    * (group, q_pct, n, est) where est is the LOWER EDGE of the first bin
    * whose cumulative count reaches rank = ceil(q·n/100) — computed with
    * pure integer arithmetic ((n·q + 99) div 100), so the oracle replay
    * is exact. Error vs the true q-quantile is bounded by binWidth.
    * Values must be non-negative (integer div truncates toward zero;
    * DuckDB's // floors — identical only on non-negatives, which is what
    * a length/size column is). */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         binWidth: Long, qPcts: Seq[Int]): DataFrame = {
    require(binWidth > 0 && qPcts.nonEmpty && qPcts.forall(v => v > 0 && v <= 100))
    val bins = df
      .select(col(groupCol), expr(s"CAST($valueCol AS BIGINT) div $binWidth").as("bin"))
      .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(groupCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val cum = bins
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
    cum
      .withColumn("q_pct", explode(array(qPcts.map(v => lit(v)): _*)))
      .withColumn("rank", expr("(n * q_pct + 99) div 100"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col(groupCol), col("q_pct"), col("n"))
      .agg((min("bin") * binWidth).as("est"))
  }

  // ------------------------------------------------------- bloom filter

  /** BLOOM FILTER — the sketch family's MEMBERSHIP member (HLL answers
    * "how many distinct", CMS "how often", Bloom "have we seen THIS"):
    * the O(1)-memory seen-set every ingest gate consults before paying
    * for exact index probes. The filter is a frame of SET BIT
    * positions — at most `mBits` rows however many keys went in, and
    * the filter of a union of corpora is the DISTINCT UNION of their
    * bit frames (mergeable like the other sketches). k bit positions
    * per key from the salted-md5 hash-point family
    * (`h32(key, "salt|j|") mod m`), so any engine replays the exact
    * bits. Standard guarantees: NO false negatives ever (an inserted
    * key's bits are all set by construction); false positives at rate
    * ≈ (1 − e^(−kn/m))^k — size m for the corpus (bits-per-key ≈ 10
    * gives ~1% at k = 3). */
  def bloomBits(df: DataFrame, keyCol: String, mBits: Int = 4096, k: Int = 3,
                salt: String = "bloom"): DataFrame = {
    require(mBits >= 2 && k >= 1, "need mBits >= 2 and k >= 1")
    val hs = (0 until k).map(j =>
      pmod(h32(col(keyCol), s"$salt|$j|"), lit(mBits.toLong)))
    df.select(explode(array(hs: _*)).as("b")).distinct()
  }

  /** Pack a [[bloomBits]] frame into the word array a zero-shuffle
    * serving probe embeds as a plan literal: mBits/64 longs (2^18 bits
    * = 4 KB) REGARDLESS of how many keys built the filter — the whole
    * point of serving membership from a sketch instead of the index.
    * The collect is bounded by mBits, not the corpus. */
  def packBloomBits(bits: DataFrame, mBits: Int): Seq[Long] = {
    require(mBits >= 64 && mBits % 64 == 0,
            "mBits must be a positive multiple of 64")
    val words = new Array[Long](mBits / 64)
    bits.select(col("b")).collect().foreach { r =>
      val b = r.getLong(0)
      words((b / 64).toInt) |= (1L << (b % 64).toInt)
    }
    words.toSeq
  }

  /** Probe keys against a built filter: every input row returns with
    * its hit count and `maybe_seen` = 1 iff ALL k positions are set
    * (duplicate positions from intra-key hash collisions count
    * per-hash on both the set and unset branches, so the conjunction
    * is exact). GENUINELY stateless — k hash projections + k broadcast
    * left joins against the ≤ mBits-row bit frame, NO aggregation
    * (an explode + per-key groupBy would be a streaming aggregation,
    * unsupported in append mode) — so the same call routes a STREAM
    * against a static filter (batch parity test-pinned), the
    * ingest-gate composition ([[graft.pipeline.TextDedup
    * .incrementalDedup]] stays the exact authority behind it; the
    * bloom answer is "definitely new" or "maybe seen", never
    * "definitely seen"). */
  def bloomProbe(df: DataFrame, idCol: String, keyCol: String,
                 bits: DataFrame, mBits: Int = 4096, k: Int = 3,
                 salt: String = "bloom",
                 passthrough: Seq[String] = Nil): DataFrame = {
    require(mBits >= 2 && k >= 1, "need mBits >= 2 and k >= 1")
    val keep = col(idCol) +: passthrough.map(col)
    // the key column may itself be passed through (the ingest gate
    // forwards the text it probed) — don't select it twice
    val base =
      if (passthrough.contains(keyCol)) df.select(keep: _*)
      else df.select(keep :+ col(keyCol): _*)
    val withBits = (0 until k).foldLeft(base) {
      (acc, j) =>
        acc.withColumn(s"__b$j", pmod(h32(col(keyCol), s"$salt|$j|"),
                                      lit(mBits.toLong)))
    }
    val joined = (0 until k).foldLeft(withBits) { (acc, j) =>
      acc.join(broadcast(bits.select(col("b").as(s"__b$j"),
                                     lit(1L).as(s"__hit$j"))),
               Seq(s"__b$j"), "left")
    }
    joined.select(keep :+
        (0 until k).map(j => coalesce(col(s"__hit$j"), lit(0L)))
          .reduce(_ + _).as("n_hits"): _*)
      .withColumn("maybe_seen", (col("n_hits") === k).cast("long"))
  }
}
