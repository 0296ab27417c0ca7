package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-statistics invariants on real Spark plans:
  *  - HLL: error bound at raw-estimate scale (n ≫ m), near-exactness in
  *    linear-counting range (n ≪ m), and mergeability (sketch of a union
  *    ≡ max-merge of the shards' sketches — exact frame equality, not a
  *    tolerance);
  *  - count-min: one-sided error (never under-counts) plus the εN upper
  *    bound with margin, and counter-matrix size fixed at d·w;
  *  - stratified sampling: determinism, growth-stability (a row's verdict
  *    is independent of every other row), and rate concentration;
  *  - histogram quantiles: |estimate − exact percentile| ≤ binWidth at
  *    every requested q.
  */
class CorpusSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hll: raw-range accuracy within 4 standard errors at n=50k, m=1024") {
    // 50_000 distinct values in one group: n >> 2.5m so the RAW branch runs.
    val df = spark.range(50000).select(lit("g").as("g"),
                                       concat(lit("v"), col("id")).as("v"))
    val est = CorpusSketch.hllSketch(df, "g", "v")
      .select("est").as[Double].head()
    // standard error 1.04/sqrt(1024) ≈ 3.25%; allow 4σ = 13%
    assert(math.abs(est - 50000.0) / 50000.0 < 0.13,
           s"hll est $est too far from 50000")
  }

  test("hll: linear-counting range within 2% at n=100") {
    val df = spark.range(100).select(lit("g").as("g"),
                                     concat(lit("x"), col("id")).as("v"))
    val est = CorpusSketch.hllSketch(df, "g", "v")
      .select("est").as[Double].head()
    assert(math.abs(est - 100.0) / 100.0 < 0.02, s"linear-count est $est")
  }

  test("hll: merge of shard registers equals whole-corpus registers exactly") {
    val all = spark.range(5000).select(lit("g").as("g"),
                                       concat(lit("m"), col("id")).as("v"))
    val lo = all.filter(col("v") < "m25")   // lexicographic split — uneven, fine
    val hi = all.filter(col("v") >= "m25")
    val merged = CorpusSketch.hllMerge(
      CorpusSketch.hllRegisters(lo, "g", "v"),
      CorpusSketch.hllRegisters(hi, "g", "v"), "g")
    val whole = CorpusSketch.hllRegisters(all, "g", "v")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
           "merged registers differ from whole-corpus registers")
  }

  test("hll: duplicate values do not move the registers") {
    val once = spark.range(1000).select(lit("g").as("g"),
                                        concat(lit("d"), col("id")).as("v"))
    val thrice = once.unionAll(once).unionAll(once)
    val a = CorpusSketch.hllRegisters(once, "g", "v")
    val b = CorpusSketch.hllRegisters(thrice, "g", "v")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("cms: never under-counts, over-counts within 2eN/w, matrix bounded by d*w") {
    // zipfian-ish: token t_i appears (200 - i) times for i in 0..99
    val rows = (0 until 100).flatMap(i => Seq.fill(200 - i)(s"t$i"))
    val df = rows.toDF("v")
    val d = 4; val w = 256
    val counters = CorpusSketch.cmsCounters(df, "v", d, w)
    assert(counters.count() <= d.toLong * w, "counter matrix exceeds d*w")
    val exact = df.groupBy("v").agg(count(lit(1)).as("exact_c"))
    val est = CorpusSketch.cmsEstimate(exact, counters, "v", d, w)
      .select("exact_c", "cms_c").as[(Long, Long)].collect()
    val n = rows.size.toLong
    assert(est.forall { case (e, c) => c >= e }, "cms under-counted")
    val bound = 2.0 * math.E * n / w
    assert(est.forall { case (e, c) => c - e <= bound },
           s"cms over-count beyond 2eN/w = $bound")
  }

  test("cms: merged shard counters equal whole-corpus counters") {
    val rows = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"w$i"))
    val df = rows.toDF("v")
    val (lo, hi) = (df.filter(length(col("v")) === 2),
                    df.filter(length(col("v")) =!= 2))
    val merged = CorpusSketch.cmsCounters(lo, "v")
      .unionByName(CorpusSketch.cmsCounters(hi, "v"))
      .groupBy("j", "bucket").agg(sum("c").as("c"))
    val whole = CorpusSketch.cmsCounters(df, "v")
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("stratified sample: deterministic, growth-stable, rate-concentrated") {
    val df = spark.range(20000).select(
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("c").as("s"),
      col("id"))
    val ppm = Map("a" -> 250000L, "b" -> 750000L)
    val kept = CorpusSketch.stratifiedSample(df, "s", "id", ppm, 500000L)
    val again = CorpusSketch.stratifiedSample(df, "s", "id", ppm, 500000L)
    assert(kept.exceptAll(again).isEmpty, "sampling not deterministic")
    // growth-stability: sampling HALF the corpus keeps exactly the
    // intersection — no row's verdict depends on the others
    val half = df.filter(col("id") < 10000)
    val keptHalf = CorpusSketch.stratifiedSample(half, "s", "id", ppm, 500000L)
    assert(keptHalf.exceptAll(kept.filter(col("id") < 10000)).isEmpty,
           "row verdict changed when corpus shrank")
    val rates = kept.groupBy("s").agg(count(lit(1)).as("k"))
      .join(df.groupBy("s").agg(count(lit(1)).as("n")), "s")
      .select(col("s"), col("k") / col("n"))
      .as[(String, Double)].collect().toMap
    // ~6667 rows/stratum: 4σ of a Bernoulli rate ≈ 4·sqrt(p(1−p)/n) < 0.025
    assert(math.abs(rates("a") - 0.25) < 0.025, s"rate a ${rates("a")}")
    assert(math.abs(rates("b") - 0.75) < 0.025, s"rate b ${rates("b")}")
    assert(math.abs(rates("c") - 0.50) < 0.025, s"rate c ${rates("c")}")
  }

  test("stratumTopK: exact k per stratum; prefilter provably changes nothing; refines the fraction sample") {
    val df = spark.range(5000).select(
      when(col("id") % 2 === 0, "x").otherwise("y").as("s"), col("id"))
    val k = 25
    val full = CorpusSketch.stratumTopK(df, "s", "id", k)
    val pre = CorpusSketch.stratumTopK(df, "s", "id", k, Some(100000L))
    // E[survivors] = 250 per stratum >> k, so the prefilter is invisible
    assert(full.exceptAll(pre).isEmpty && pre.exceptAll(full).isEmpty,
           "prefiltered top-k differs from unfiltered")
    val sizes = full.groupBy("s").agg(count(lit(1))).as[(String, Long)].collect().toMap
    assert(sizes == Map("x" -> k.toLong, "y" -> k.toLong))
    // refinement: every top-k row is inside the same-threshold fraction sample
    val frac = CorpusSketch.stratifiedSample(df, "s", "id", Map.empty, 100000L)
    assert(pre.select("s", "id").exceptAll(frac.select("s", "id")
             .join(pre.select("s", "id"), Seq("s", "id"))).isEmpty)
  }

  test("exactPercentiles: grid ranks equal sorted-order percentiles exactly") {
    import spark.implicits._
    // group u: values 1..100 (each once): p50 = 50, p90 = 90, p99 = 99
    // group d: value 7 x10 (all percentiles = 7)
    val df = ((1 to 100).map(i => ("u", i.toLong)) ++
      Seq.fill(10)(("d", 7L))).toDF("g", "x")
    val got = CorpusSketch.exactPercentiles(df, "g", "x", Seq(50, 90, 99))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(
      ("u", 50L) -> 50L, ("u", 90L) -> 90L, ("u", 99L) -> 99L,
      ("d", 50L) -> 7L, ("d", 90L) -> 7L, ("d", 99L) -> 7L))
  }

  test("hllRollingDistinct: trailing window unions registers, old days age out") {
    import java.sql.Date
    // three days of DISJOINT 100-user cohorts; window 2 days:
    // day1 ~ 100, day2 ~ 200, day3 ~ 200 (day1 aged out)
    val rows = for (day <- 1 to 3; u <- 1 to 100)
      yield (Date.valueOf(f"2024-01-0$day"), (day * 1000 + u).toLong)
    val df = spark.createDataFrame(rows).toDF("d", "user_id")
    val got = CorpusSketch.hllRollingDistinct(df, "d", "user_id", windowDays = 2)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(3)).toMap
    assert(math.abs(got("2024-01-01") - 100) < 10, s"day1 ${got("2024-01-01")}")
    assert(math.abs(got("2024-01-02") - 200) < 15, s"day2 ${got("2024-01-02")}")
    assert(math.abs(got("2024-01-03") - 200) < 15, s"day3 ${got("2024-01-03")}")
  }

  test("seqPoissonSample: exact k, deterministic, weight-biased, prefilter-invariant") {
    val df = spark.range(8000).select(
      when(col("id") % 2 === 0, "x").otherwise("y").as("s"), col("id"),
      // weights 1..4000: heavier rows should be overrepresented
      (col("id") / 2 + 1).cast("long").as("w"))
    val k = 50
    val a = CorpusSketch.seqPoissonSample(df, "s", "id", "w", k)
    val b = CorpusSketch.seqPoissonSample(df, "s", "id", "w", k)
    assert(a.exceptAll(b).isEmpty, "weighted sampling not deterministic")
    val sizes = a.groupBy("s").agg(count(lit(1))).as[(String, Long)].collect().toMap
    assert(sizes == Map("x" -> k.toLong, "y" -> k.toLong))
    // weight bias: mean sampled weight well above the population mean
    // (~2000); sequential Poisson with w~U(1,4000) concentrates around
    // E[w²]/E[w] ≈ 2667
    val meanW = a.agg(avg(col("w"))).as[Double].collect().head
    assert(meanW > 2200, s"sample mean weight $meanW not weight-biased")
    // prefilter keeps the result exact while bounding the ranked set:
    // priorities ~ Uniform(0, 1e15)/w; survivors at 200‰ >> 2k rows
    val pre = CorpusSketch.seqPoissonSample(df, "s", "id", "w", k, Some(200L))
    assert(a.exceptAll(pre).isEmpty && pre.exceptAll(a).isEmpty,
           "prefiltered weighted sample differs")
  }

  test("histogram quantiles: within one binWidth of the exact percentile") {
    // two groups with different shapes: uniform 0..999 and squares
    val df = spark.range(1000).select(lit("u").as("g"), col("id").as("x"))
      .unionAll(spark.range(1000).select(lit("q").as("g"),
                                         (col("id") * col("id") / 1000).as("x")))
    val binW = 50L
    val qs = Seq(50, 90, 99)
    val hist = CorpusSketch.histogramQuantiles(df, "g", "x", binW, qs)
      .select("g", "q_pct", "est").as[(String, Int, Long)].collect()
      .map { case (g, q, e) => (g, q) -> e }.toMap
    val exact = df.groupBy("g")
      .agg(expr("percentile(x, array(0.50, 0.90, 0.99))").as("p"))
      .select(col("g"), col("p")).as[(String, Seq[Double])].collect()
      .flatMap { case (g, ps) => qs.zip(ps).map { case (q, p) => (g, q) -> p } }
      .toMap
    for (((g, q), e) <- hist) {
      val p = exact((g, q))
      assert(math.abs(e - p) <= binW,
             s"group $g q$q: hist $e vs exact $p beyond binWidth $binW")
    }
    assert(hist.size == 6, s"expected 2 groups x 3 quantiles, got ${hist.size}")
  }

  test("bloom: zero false negatives, FP rate within theory, bit-frame merge is union") {
    import spark.implicits._
    val inserted = (1 to 300).map(i => s"key-$i").toDF("k")
    val bits = CorpusSketch.bloomBits(inserted, "k", mBits = 4096, k = 3)
    val nBits = bits.count()
    assert(nBits <= 900 && nBits <= 4096, s"at most k*n distinct bits: $nBits")
    // no false negatives EVER: every inserted key probes maybe_seen
    val self = CorpusSketch.bloomProbe(
        inserted.withColumn("id", monotonically_increasing_id()), "id", "k", bits)
      .agg(sum(col("maybe_seen"))).head().getLong(0)
    assert(self == 300L, s"inserted keys must all probe seen: $self")
    // fresh keys: FP rate ~ (1 - e^(-kn/m))^k ≈ 0.9% here; allow 5%
    val fresh = (1 to 1000).map(i => s"other-$i").toDF("k")
      .withColumn("id", monotonically_increasing_id())
    val fp = CorpusSketch.bloomProbe(fresh, "id", "k", bits)
      .agg(sum(col("maybe_seen"))).head().getLong(0)
    assert(fp <= 50L, s"false-positive rate blew past 5%: $fp/1000")
    // mergeability: filter of the union == distinct union of the filters
    val more = (301 to 400).map(i => s"key-$i").toDF("k")
    val merged = bits.unionByName(CorpusSketch.bloomBits(more, "k", mBits = 4096, k = 3))
      .distinct()
    val whole = CorpusSketch.bloomBits(inserted.unionByName(more), "k",
                                       mBits = 4096, k = 3)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
           "union-of-filters must equal filter-of-union")
  }

  test("weightedMedian: weighted lower median, unit-weight reduction, group independence") {
    import spark.implicits._
    // group g1: values 1(w1), 2(w1), 100(w3): tot=5, half reached at 100
    // group g2: unit weights over 1..5 -> classic lower median 3
    // group g3: even total, tie at boundary -> smallest v with 2cum>=tot
    val df = Seq(
      ("g1", 1L, 1L), ("g1", 2L, 1L), ("g1", 100L, 3L),
      ("g2", 1L, 1L), ("g2", 2L, 1L), ("g2", 3L, 1L), ("g2", 4L, 1L),
      ("g2", 5L, 1L),
      ("g3", 10L, 2L), ("g3", 20L, 2L),
      ("g4", 7L, 5L), ("g4", 9L, 0L)) // zero weights drop
      .toDF("g", "v", "w")
    val got = CorpusSketch.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("g1") == ((3L, 5L, 100L)))
    assert(got("g2") == ((5L, 5L, 3L)))
    assert(got("g3") == ((2L, 4L, 10L)))
    assert(got("g4") == ((1L, 5L, 7L)))
  }
}
