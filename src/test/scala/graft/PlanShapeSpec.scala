package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.{BaseLimitExec, CollectLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/** Optimizer-shape regression tests: the physical plans the 100 TB
  * posture depends on must not silently degrade. Each assertion encodes
  * a property checked once by hand via `.explain("formatted")`
  * (ExplainAll) and pinned here:
  *   - dimension joins broadcast (no sort-merge of small sides),
  *   - scans carry pushed filters and pruned schemas,
  *   - no plan contains a cartesian product,
  *   - pair generation in dedup/ANN is a join on a key, never a cross.
  * Runs on sf0.001 — plan shape, not data volume, is under test. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("TPC-H shapes broadcast their dimension sides") {
    for (q <- Seq("q14_tpch_q3_shape", "q15_tpch_q5_shape")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product!\n$p")
    }
  }

  /** Parquet tables a subtree scans *without* an intervening
    * cardinality bound. Aggregates and limits cut the recursion: anything
    * below them is bounded by grouping keys / k, not by fact row count
    * (e.g. the splice queries broadcast daily aggregates of `events` —
    * thousands of rows at any SF — which is the intended shape). */
  private def unboundedScans(p: SparkPlan): Seq[String] = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec | _: BaseLimitExec | _: CollectLimitExec => Nil
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.map(_.getName.stripSuffix(".parquet"))
    case other => other.children.flatMap(unboundedScans)
  }

  /** Tables a *hint-forced* broadcast would materialize, in full, on the
    * driver. Plans with autoBroadcastJoinThreshold=-1 so size-estimated
    * broadcasts (safe: they track actual data volume, and AQE re-checks at
    * runtime) drop out and only explicit `broadcast()` hints remain, then
    * walks each broadcast build side down to its unbounded parquet scans. */
  private def forcedBroadcastTables(name: String): Set[String] = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val df: DataFrame = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.sparkPlan.collect {
        case b: BroadcastHashJoinExec =>
          unboundedScans(if (b.buildSide == BuildLeft) b.left else b.right)
        case b: BroadcastNestedLoopJoinExec =>
          unboundedScans(if (b.buildSide == BuildLeft) b.left else b.right)
      }.flatten.toSet
    } finally spark.conf.set(key, saved)
  }

  test("no fact table is ever a forced, unaggregated broadcast build side") {
    // A hint-forced broadcast of a raw fact slice (orders/lineitem/events/
    // documents/embeddings) plans fine at test SF but OOMs at 100 TB.
    val facts = Set("orders", "lineitem", "events", "documents", "embeddings")
    // q59 is the exact-ANN baseline: its broadcast side is the QUERY set
    // (queryPred-bounded by contract, a handful of vectors), scanned from
    // the embeddings table — small by construction, not by aggregation.
    // q171 embeds that same baseline as rankEval's ground-truth side
    // (eval always runs over a bounded query sample — producing truth is
    // a brute-force pass, so an unbounded query set is impossible by
    // construction, not just by hint).
    // q262 is the same cosineTopK baseline run once per truncation rung
    // (its broadcast side is the 8-vector query set, bounded by the
    // queryPred contract exactly like q59's).
    val exempt = Set("q59_cosine_topk", "q171_rank_eval",
                     "q262_matryoshka_eval")
    for (q <- SparkEntry.all if q.oracle.isDefined && !exempt(q.name)) {
      val hit = forcedBroadcastTables(q.name).intersect(facts)
      assert(hit.isEmpty, s"${q.name} force-broadcasts fact table(s): $hit")
    }
  }

  test("TPC-H dims are the only broadcast sides in q14/q15") {
    val dims = Set("customer", "supplier", "nation", "region")
    assert(forcedBroadcastTables("q14_tpch_q3_shape").subsetOf(dims))
    assert(forcedBroadcastTables("q15_tpch_q5_shape").subsetOf(dims))
    assert(forcedBroadcastTables("q15_tpch_q5_shape").nonEmpty)
  }

  test("fact scans push filters and prune columns") {
    val p = planOf("q14_tpch_q3_shape")
    assert(p.contains("PushedFilters: ["), s"no pushed filters\n$p")
    // lineitem is ~16 columns; the query needs 4 — a full-width
    // ReadSchema would mean pruning broke
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(_.split(",").length <= 8),
           s"scan reads too many columns:\n$readSchemas")
  }

  test("no registered relational query plans a cartesian product") {
    // forecast/diagnostic queries exit to flatMapGroups (no join risk);
    // check every oracle-backed query — these are pure relational plans
    for (q <- SparkEntry.all if q.oracle.isDefined) {
      val p = planOf(q.name)
      assert(!p.contains("CartesianProduct"),
             s"${q.name} plans a cartesian product")
    }
  }

  test("near-dup pair joins are never hint-forced broadcasts") {
    // The candidate-pair frame ends in distinct() — an aggregate — so
    // forcedBroadcastTables' recursion cut can't see through it and the
    // fact-table test above is blind here. Pin the property directly on
    // the operator composition (bypassing the q56 memo, whose plan is
    // frozen under whatever config was live at first touch): with
    // size-estimated broadcasts disabled, NO join on the doc-id pair
    // keys (da/db) may remain a broadcast join. Pairs grow ~linearly
    // with corpus size, so a hint-forced pair broadcast (which ignores
    // autoBroadcastJoinThreshold) would OOM the driver at the 100 TB
    // posture. Hinted broadcasts of genuinely bounded frames (the 1-row
    // doc count, the frequent-shingle set) join on other keys and are
    // unaffected.
    import graft.pipeline.TextDedup
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val docs = graft.queries.t(spark, dir, "documents")
      val sh = TextDedup.bigramShingles(docs, "doc_id", "text")
      val sig = TextDedup.minhashSignature(
        TextDedup.pruneFrequentShingles(sh, 0.1), 16)
      val pairs = TextDedup.filterBySignatureAgreement(
        TextDedup.candidatePairs(TextDedup.lshBands(sig, 16, 2)), sig, 16, 4)
      val confirmed = TextDedup.jaccard(sh, pairs)
      val pairKeyed = confirmed.queryExecution.sparkPlan.collect {
        case b: BroadcastHashJoinExec
          if (b.leftKeys ++ b.rightKeys).flatMap(_.references)
            .exists(a => a.name == "da" || a.name == "db") => b
      }
      assert(pairKeyed.isEmpty,
             s"near-dup path hint-forces a broadcast of the candidate-pair frame:\n${pairKeyed.mkString("\n")}")
    } finally spark.conf.set(key, saved)
  }

  test("as-of join is one partitioned sort, not a range join explosion") {
    val p = planOf("q22_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
           s"as-of degenerated to a product join:\n$p")
    assert(p.contains("Window"), s"expected running-last window\n$p")
  }

  test("single-aggregation queries stay at exactly one shuffle") {
    // the canonical group-by queries are one partial-agg -> exchange ->
    // final-agg pipeline; a second Exchange would mean a plan regression
    // (lost map-side combine or an accidental repartition). At this SF a
    // single-partition scan can satisfy the distribution outright, so
    // the budget is AT MOST one.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val oneShuffle = Seq("q01_pricing_summary", "q02_bucket_hour",
                         "q03_bucket_week_mean", "q04_bucket_month_minmax",
                         "q54_dedup_exact", "q73_chunk_dedup")
    for (q <- oneShuffle) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.sparkPlan
      val n = plan.collect { case e: ShuffleExchangeExec => e }.size
      assert(n <= 1, s"$q plans $n shuffles (expected <= 1):\n$plan")
    }
  }

  test("per-row ingest queries are zero-shuffle map-only plans") {
    // the 100 TB posture for ingest-side pipelines: scan →
    // generate/decode/fingerprint → project, nothing wide. A shuffle
    // appearing here would mean the path stopped streaming through
    // executors (e.g. an accidental repartition or an expression forced
    // out of the projection). q61-q63/q71 are the media ops, q72 the
    // CDC chunker, q55 the native per-row minhash signature (its
    // exclude-list aggregation is a separate tiny job at build time,
    // not part of the signature plan).
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    for (q <- Seq("q61_media_meta", "q62_frame_features",
                  "q63_image_decode", "q71_audio_decode", "q72_cdc_chunks",
                  "q55_minhash_signature", "q58_simhash", "q75_dataset_split",
                  "q177_script_profile")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.sparkPlan
      val n = plan.collect { case e: ShuffleExchangeExec => e }.size
      assert(n == 0, s"$q plans $n shuffles (expected 0):\n$plan")
    }
  }

  test("resample broadcasts the rate table; packing windows are sharded, PII is zero-shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // q102: pure projection — the ingest posture
    val pii = SparkEntry.queries("q102_pii_redaction")(spark, dir).queryExecution.sparkPlan
    assert(pii.collect { case e: ShuffleExchangeExec => e }.isEmpty,
           s"PII redaction must not shuffle:\n$pii")
    // q103: the per-group rate table must reach the corpus scan as a
    // broadcast — a shuffle join here would shuffle the corpus to join
    // a ~20-row frame
    val mix = SparkEntry.queries("q103_mixture_resample")(spark, dir).queryExecution.sparkPlan
    assert(mix.toString.contains("BroadcastHashJoin"),
           s"rate table must broadcast onto the scan:\n$mix")
    // q104: every window partitions by (bucket, shard) — a global or
    // bucket-only window would funnel the corpus through ~6 reducers
    import org.apache.spark.sql.execution.window.WindowExec
    val pack = SparkEntry.queries("q104_sequence_packing")(spark, dir).queryExecution.sparkPlan
    val wins = pack.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.size == 2),
           s"packing windows must partition by (bucket, shard):\n$pack")
  }

  test("curation-family shapes: bounded tables broadcast, shard windows partition") {
    import org.apache.spark.sql.execution.window.WindowExec
    // q115: the nBuckets-row score table must reach the gram scan as a
    // broadcast — a shuffle join here would shuffle the corpus grams to
    // meet a ≤1024-row frame
    val dsir = SparkEntry.queries("q115_dsir_weights")(spark, dir).queryExecution.sparkPlan
    assert(dsir.toString.contains("BroadcastHashJoin"),
           s"DSIR score table must broadcast onto the gram scan:\n$dsir")
    // q113: the top-K vocabulary joins the token scan as a broadcast
    val enc = SparkEntry.queries("q113_encode_tokens")(spark, dir).queryExecution.sparkPlan
    assert(enc.toString.contains("BroadcastHashJoin"),
           s"vocabulary must broadcast onto the token scan:\n$enc")
    // q111: the ONLY window partitions by shard — a global window would
    // funnel the whole export through one reducer
    val sh = SparkEntry.queries("q111_shuffle_shards")(spark, dir).queryExecution.sparkPlan
    val wins = sh.collect { case w: WindowExec => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
           s"shuffle-shard ranking must be a per-shard window:\n$sh")
    // q112: the vocabulary-bounded surprisal table broadcasts back onto
    // the token scan (the swap-in-a-reference-LM production shape)
    val lm = SparkEntry.queries("q112_lm_surprisal")(spark, dir).queryExecution.sparkPlan
    assert(lm.toString.contains("BroadcastHashJoin"),
           s"surprisal table must broadcast onto the token scan:\n$lm")
  }

  test("LSH near-dup pair generation joins on the band key") {
    val df: DataFrame = SparkEntry.queries("q56_lsh_near_dup")(spark, dir)
    // sparkPlan, not executedPlan: AQE's wrapper node hides its subtree
    // from collect(), and plan SHAPE (not runtime re-planning) is what
    // is under test here
    val plan = df.queryExecution.sparkPlan
    assert(!plan.toString.contains("CartesianProduct"),
           s"pair generation must be a keyed join:\n$plan")
    // a nested-loop join is acceptable ONLY as the scalar-subquery shape
    // (the skew guard's 1-row doc-count side); a BNLJ over an unbounded
    // scan would be the quadratic pair blowup this test exists to catch
    val nlj = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
    nlj.foreach { b =>
      val build = if (b.buildSide == BuildLeft) b.left else b.right
      assert(unboundedScans(build).isEmpty,
             s"nested-loop join over unbounded side:\n$b")
    }
  }
}
