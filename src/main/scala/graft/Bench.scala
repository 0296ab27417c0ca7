package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query timed at the target
  * scale factor; one JSON line on stdout. A warmup pass (scan + tiny
  * aggregate of each table) is excluded from timings so the numbers
  * measure query execution, not JVM/codegen/file-index warmup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every available core (the brief's local[32] posture);
    // SPARK_GRAFT_CPUS overrides for controlled runs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once (file listing, footer reads)
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach { t =>
        try graft.queries.t(spark, sfDir, t).limit(1).count()
        catch { case _: Throwable => }
      }
    // Materialization: a `.count()` action lets Catalyst prune the very
    // projection expressions many text queries exist to measure (column
    // pruning collapses a Project under Aggregate(count(1)), so q50-q53/
    // q61/q67/q69 timed a near-empty scan+count through round 5). The
    // noop datasource sink evaluates EVERY output column of the optimized
    // plan and discards the rows — full-materialization cost without
    // write-side I/O. Numbers from round 6 on are therefore honestly
    // higher for the pure-projection family than earlier rounds'.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // JMH-style warmup: run every query once at the smallest SF so the
    // timed pass measures steady-state execution rather than first-run
    // codegen compilation + JIT. The warmup reads DIFFERENT parquet
    // paths, so no result cache carries into the timed runs; whatever
    // was cached is dropped before timing.
    val warmDir = "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.valuesIterator.foreach { fn =>
        try materialize(fn(spark, warmDir)) catch { case _: Throwable => }
      }
    spark.catalog.clearCache()
    // Median-of-3 per query, reps INTERLEAVED across full suite passes:
    // single-shot timings on a shared box swing far beyond the real
    // signal (BENCH_r03 measured 2x the reproducible total under host
    // contention), and back-to-back reps of one query all sit inside the
    // same multi-second contention window, so a per-query median-of-3
    // cannot reject it (BENCH_r04's q10/q11 medians were ~10x their
    // reproducible cost for exactly that reason). Running the whole
    // suite `reps` times and taking each query's median ACROSS passes
    // costs the same wall-clock but decorrelates the noise: a window
    // that inflates pass 1's q10 leaves passes 2-3 untouched. Failures
    // are NAMED on stderr and reported in the JSON instead of silently
    // becoming a fast "-1" that would improve the total.
    // Semantics: STEADY-STATE medians. Queries whose design includes a
    // once-per-(session,dir) materialized index (near-dup pair memo,
    // ANN bucket/IVF indexes) pay the build in pass 1 and read the index
    // in passes 2-3, so their median reports amortized per-query cost —
    // the served-workload number; the build cost itself is what
    // ScaleProbe measures.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // No demoted queries: every registered query is timed (q76, the
    // 16-bucket-band SimHash that was the one bench exclusion, was
    // RETIRED in r14 — q77/q85 carry the operator at scale-safe
    // widths).
    val excluded = Set.empty[String]
    // SPARK_GRAFT_BENCH_ONLY=q78_dup_clusters_pj,q82_curate_corpus
    // restricts the suite to a comma-separated subset — a dev loop for
    // timing one query's optimization without paying the full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = (SparkEntry.queries.keySet -- excluded).toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val timesByQuery = scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        materialize(fn(spark, sfDir))
        timesByQuery(name) = ((System.nanoTime() - t0) / 1e9) :: timesByQuery.getOrElse(name, Nil)
      } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name pass $pass: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    var failed = List.empty[String]
    val results = names.map { name =>
      val times = timesByQuery.getOrElse(name, Nil)
      if (times.isEmpty) { failed ::= name; name -> -1.0 }
      else name -> times.sorted.apply(times.size / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // capture-proofing: the driver records only the LAST 2000 chars of
    // stdout, and at 140+ registered queries the full per-query map is
    // ~7 KB — BENCH_r11's tail capture cut the line's head off and its
    // `parsed` field came back null. The FULL json goes to the file
    // (canonical round-over-round record, committed in-repo); stdout
    // gets a compact line guaranteed to fit the tail window: headline
    // total + failures + as many per-query entries as a 1700-byte
    // budget allows, SLOWEST FIRST (the regression-relevant tail),
    // values rounded to ms. `queries_omitted` names the truncation —
    // no silent cap.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch {
      case e: Exception =>
        System.err.println(s"BENCH: could not write $outPath: $e (stdout line is canonical)")
    }
    val bySlowest = results.sortBy { case (_, v) => -v }
      .map { case (k, v) => s"\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
    val budget = 1700
    val fixedHead = s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","failed":$failedJson,"n_queries":${results.size},"full":"$outPath","queries_omitted":000,"queries":{"""
    var used = fixedHead.length + 2
    val kept = bySlowest.takeWhile { e =>
      val fits = used + e.length + 1 <= budget
      if (fits) used += e.length + 1
      fits
    }
    val compact = fixedHead.replace("\"queries_omitted\":000",
      s"\"queries_omitted\":${results.size - kept.size}") +
      kept.mkString(",") + "}}"
    println(compact)
    spark.stop()
  }
}
