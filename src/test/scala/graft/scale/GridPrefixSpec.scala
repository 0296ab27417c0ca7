package graft.scale

import graft.SparkTestSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[GridPrefix.prefixSums]] — the two-level distributed prefix must
  * equal the single-window reference on every grid shape, and its
  * plan must contain NO unpartitioned window. */
class GridPrefixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def reference(vals: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    var acc = 0L
    vals.sortBy(_._1).map { case (v, c) =>
      val before = acc; acc += c; v -> ((before + c, before))
    }.toMap
  }

  private def check(vals: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val got = GridPrefix.prefixSums(vals.toDF("v", "c"), "v", "c")
      .select("v", "cum", "cum_before").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == reference(vals))
  }

  test("matches the single-window reference on a small grid") {
    check(Seq((5L, 2L), (1L, 3L), (9L, 1L), (3L, 4L)))
  }

  test("grid wider than the shuffle-partition count (multi-bucket)") {
    // 4096 distinct values over 32 shuffle partitions: every bucket
    // holds >1 value and >1 bucket is non-empty, so both levels of
    // the decomposition (in-bucket window + cross-bucket offsets)
    // are exercised
    val vals = (1L to 4096L).map(v => (v * 7 % 4099, v % 5 + 1))
    check(vals)
  }

  test("single-row and single-bucket grids") {
    check(Seq((42L, 7L)))
    check(Seq((1L, 1L), (2L, 1L)))
  }

  test("plan contains no unpartitioned WindowExec") {
    import spark.implicits._
    val grid = (1L to 1000L).map(v => (v, 1L)).toDF("v", "c")
    val out = GridPrefix.prefixSums(grid, "v", "c")
    out.collect()
    val plan = out.queryExecution.executedPlan
    val inner = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bad = inner.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned window in:\n$inner")
  }

  // ---- groupedPrefixSums ----

  private def refGrouped(rows: Seq[(String, Long, Long)])
      : Map[(String, Long), (Long, Long)] =
    rows.groupBy(_._1).flatMap { case (g, vs) =>
      var acc = 0L
      vs.sortBy(_._2).map { case (_, v, c) =>
        val before = acc; acc += c; (g, v) -> ((before + c, before))
      }
    }

  private def checkGrouped(rows: Seq[(String, Long, Long)],
                           cols: Seq[String] = Seq("c")): Unit = {
    import spark.implicits._
    val got = GridPrefix
      .groupedPrefixSums(rows.toDF("g", "v", "c"), "g", "v", cols)
      .select(col("g"), col("v"), col("cum_c"), col("cum_before_c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == refGrouped(rows))
  }

  test("grouped: matches per-group reference, small mixed groups") {
    checkGrouped(Seq(("a", 5L, 2L), ("a", 1L, 3L), ("b", 9L, 1L),
                     ("b", 3L, 4L), ("b", 5L, 2L), ("c", 7L, 7L)))
  }

  test("grouped: ONE group wider than the shuffle-partition count") {
    // the scale case that motivates the grouped variant: a single
    // group whose value grid spans many range buckets
    val wide = (1L to 3000L).map(v => ("w", v * 13 % 3001, v % 4 + 1))
    val narrow = Seq(("n", 1L, 5L), ("n", 2L, 5L))
    checkGrouped(scala.util.Random.shuffle(wide ++ narrow))
  }

  test("grouped: many single-row groups") {
    checkGrouped((1 to 200).map(i => (s"g$i", i.toLong, 2L)))
  }

  test("grouped: multiple weight columns in one pass") {
    import spark.implicits._
    val rows = Seq(("a", 1L, 2L, 10L), ("a", 3L, 5L, 20L),
                   ("b", 2L, 1L, 30L), ("a", 2L, 7L, 40L))
    val out = GridPrefix
      .groupedPrefixSums(rows.toDF("g", "v", "ca", "cb"), "g", "v",
        Seq("ca", "cb"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("v")) ->
        ((r.getAs[Long]("cum_ca"), r.getAs[Long]("cum_cb")))).toMap
    assert(out(("a", 1L)) == ((2L, 10L)))
    assert(out(("a", 2L)) == ((9L, 50L)))
    assert(out(("a", 3L)) == ((14L, 70L)))
    assert(out(("b", 2L)) == ((1L, 30L)))
  }

  test("grouped: literal-bounds path ≡ legacy range-exchange path") {
    import spark.implicits._
    // wide + narrow groups, adversarial order: both decompositions
    // must agree cell-for-cell (the r16 rewrite's safety net)
    val rows = scala.util.Random.shuffle(
      (1L to 3000L).map(v => ("w", v * 13 % 3001, v % 4 + 1)) ++
        Seq(("n", 1L, 5L), ("n", 2L, 5L), ("z", 7L, 1L)))
    val df = rows.toDF("g", "v", "c")
    val neu = GridPrefix.groupedPrefixSums(df, "g", "v", Seq("c"))
      .select("g", "v", "c", "cum_c", "cum_before_c")
    val old = GridPrefix.legacyPrefix(df, Seq("g"), "v", Seq("c"))
      .select("g", "v", "c", "cum_c", "cum_before_c")
    assert(neu.exceptAll(old).count() == 0 && old.exceptAll(neu).count() == 0)
  }

  test("grouped: two-level bucketed path forced (small-grid gate off) ≡ reference") {
    // r17: grouped grids under spark.graft.prefix.smallGrid rows take a
    // single keyed window; forcing the gate to 0 keeps the bucketed
    // machinery itself covered on small fixtures. Conf goes on a CLONED
    // session (own SQLConf, shared context) so parallel suites on the
    // shared session never observe it.
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.prefix.smallGrid", "0")
    def checkG(rows: Seq[(String, Long, Long)]): Unit = {
      val got = GridPrefix
        .groupedPrefixSums(s2.createDataFrame(rows).toDF("g", "v", "c"),
                           "g", "v", Seq("c"))
        .select(col("g"), col("v"), col("cum_c"), col("cum_before_c"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      assert(got == refGrouped(rows))
    }
    checkG(Seq(("a", 5L, 2L), ("a", 1L, 3L), ("b", 9L, 1L),
               ("b", 3L, 4L), ("b", 5L, 2L), ("c", 7L, 7L)))
    val wide = (1L to 3000L).map(v => ("w", v * 13 % 3001, v % 4 + 1))
    checkG(scala.util.Random.shuffle(wide))
  }

  test("binary-search bucket path (boundaries > 256) ≡ reference") {
    // r16 verdict scale risk (b): above maxLiteralBounds boundaries the
    // literal when() tree is replaced by a broadcast sorted-array
    // binary search. Force it with a production-like shuffle-partition
    // count and enough sampled input partitions (16 × 20 samples ≥ 257
    // boundaries), gate off so the two-level path runs. Confs live on a
    // CLONED session — parallel suites never observe them.
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.prefix.smallGrid", "0")
    s2.conf.set("spark.sql.shuffle.partitions", "300")
    val rows = (1L to 6000L).map(v => (s"g${v % 3}", v, v % 5 + 1))
    val df = s2.createDataFrame(rows).toDF("g", "v", "c").repartition(16)
    val got = GridPrefix.groupedPrefixSums(df, "g", "v", Seq("c"))
      .select(col("g"), col("v"), col("cum_c"), col("cum_before_c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == refGrouped(rows))
  }

  test("null values sort first (nulls-first window order preserved)") {
    import spark.implicits._
    val df = Seq[(String, Option[Long], Long)](
      ("a", Some(5L), 2L), ("a", None, 3L), ("a", Some(1L), 4L),
      ("b", None, 7L), ("b", Some(2L), 1L))
      .toDF("g", "v", "c")
    def check(frame: org.apache.spark.sql.DataFrame): Unit = {
      val got = GridPrefix.groupedPrefixSums(frame, "g", "v", Seq("c"))
        .collect().map(r => (r.getString(0), Option(r.get(1))) ->
          ((r.getLong(3), r.getLong(4)))).toMap
      assert(got(("a", None)) == ((3L, 0L)))
      assert(got(("a", Some(1L))) == ((7L, 3L)))
      assert(got(("a", Some(5L))) == ((9L, 7L)))
      assert(got(("b", None)) == ((7L, 0L)))
      assert(got(("b", Some(2L))) == ((8L, 7L)))
    }
    check(df) // small-grid gate path (single keyed window)
    // bucketed literal-bounds path, gate off on a CLONED session
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.prefix.smallGrid", "0")
    import scala.jdk.CollectionConverters._
    check(s2.createDataFrame(df.collect().toSeq.asJava, df.schema))
  }

  test("unsupported key type falls back to the legacy path") {
    import spark.implicits._
    // array-typed value column: not orderable by the literal-bounds
    // sampler — must still produce correct sums via legacyPrefix
    val df = Seq(("a", Seq(1L), 2L), ("a", Seq(2L), 3L), ("b", Seq(1L), 5L))
      .toDF("g", "v", "c")
    val got = GridPrefix.groupedPrefixSums(df, "g", "v", Seq("c"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", Seq(1L))) == ((2L, 0L)))
    assert(got(("a", Seq(2L))) == ((5L, 2L)))
    assert(got(("b", Seq(1L))) == ((5L, 0L)))
  }

  test("struct-valued grid takes the literal-bounds path (liftTable key)") {
    import spark.implicits._
    val df = Seq((3L, "b", 1L), (1L, "a", 2L), (3L, "a", 4L), (2L, "z", 8L))
      .toDF("s", "id", "c")
      .select(struct(col("s"), col("id")).as("v"), col("c"))
    val got = GridPrefix.prefixSums(df, "v", "c")
      .select(col("v.s"), col("v.id"), col("cum"), col("cum_before"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got((1L, "a")) == ((2L, 0L)))
    assert(got((2L, "z")) == ((10L, 2L)))
    assert(got((3L, "a")) == ((14L, 10L)))
    assert(got((3L, "b")) == ((15L, 14L)))
  }

  test("ungrouped unsupported type falls back to the legacy collect path") {
    import spark.implicits._
    val df = Seq((Seq(2L), 3L), (Seq(1L), 5L), (Seq(3L), 1L))
      .toDF("v", "c")
    val got = GridPrefix.prefixSums(df, "v", "c")
      .collect().map(r => r.getSeq[Long](0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(Seq(1L)) == ((5L, 0L)))
    assert(got(Seq(2L)) == ((8L, 5L)))
    assert(got(Seq(3L)) == ((9L, 8L)))
  }

  test("grouped: plan contains no unpartitioned WindowExec") {
    import spark.implicits._
    val grid = (1L to 2000L).map(v => ("g", v, 1L)).toDF("g", "v", "c")
    val out = GridPrefix.groupedPrefixSums(grid, "g", "v", Seq("c"))
    out.collect()
    val inner = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bad = inner.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned window in:\n$inner")
  }
}
