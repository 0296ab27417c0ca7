package graft.forecast

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class ForecasterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val day = 86400000L
  private val base = Timestamp.valueOf("2023-01-02 00:00:00").getTime // a Monday

  private def mkDaily(n: Int, f: Int => Double, series: String = "s1") =
    (0 until n).map(i => (series, new Timestamp(base + i.toLong * day), f(i)))

  test("linear trend recovery: noise-free line extrapolates") {
    val hist = mkDaily(60, i => 2.0 + 3.0 * i).toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "D", 10)
    val out = Forecaster.forecast(hist, fut, StructuralTS.FitSpec(uncertaintySamples = 50))
    val rows = out.orderBy("ds").collect()
    assert(rows.length == 70)
    val futRows = rows.filter(_.getAs[String]("segment") == "future")
    assert(futRows.length == 10)
    // future continuation of the line: i = 60..69 → y = 2 + 3i
    futRows.zipWithIndex.foreach { case (r, k) =>
      val expect = 2.0 + 3.0 * (60 + k)
      val yhat = r.getAs[Double]("yhat")
      assert(math.abs(yhat - expect) < 0.5, s"future yhat $yhat vs $expect")
    }
    // trend ≈ yhat for a pure-trend series
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("yhat") - r.getAs[Double]("trend")) < 0.6)
    }
  }

  test("weekly seasonality recovery") {
    val hist = mkDaily(112, i => 20.0 + 6.0 * math.sin(2 * math.Pi * i / 7.0))
      .toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "D", 14)
    val out = Forecaster.forecast(hist, fut, StructuralTS.FitSpec(uncertaintySamples = 50))
    val futRows = out.filter(col("segment") === "future").orderBy("ds").collect()
    futRows.zipWithIndex.foreach { case (r, k) =>
      val i = 112 + k
      val expect = 20.0 + 6.0 * math.sin(2 * math.Pi * i / 7.0)
      assert(math.abs(r.getAs[Double]("yhat") - expect) < 1.2,
        s"day $i: ${r.getAs[Double]("yhat")} vs $expect")
    }
    // additive seasonal component carries the oscillation
    val addRange = futRows.map(_.getAs[Double]("additive_terms"))
    assert(addRange.max - addRange.min > 8.0)
  }

  test("daily seasonality recovery on hourly data (Prophet auto-daily)") {
    // 14 days hourly with a clean 24h cycle; Prophet auto-enables daily
    // seasonality for sub-daily data — the next-day forecast must track
    // the cycle, not flatten to its mean
    val hour = 3600000L
    val hist = (0 until 14 * 24)
      .map(i => ("s1", new Timestamp(base + i.toLong * hour),
                 100.0 + 20.0 * math.sin(2 * math.Pi * (i % 24) / 24.0)))
      .toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "H", 24)
    val out = Forecaster.forecast(hist, fut, StructuralTS.FitSpec(uncertaintySamples = 30))
    val futRows = out.filter(col("segment") === "future").orderBy("ds").collect()
    assert(futRows.length == 24)
    futRows.zipWithIndex.foreach { case (r, k) =>
      val i = 14 * 24 + k
      val expect = 100.0 + 20.0 * math.sin(2 * math.Pi * (i % 24) / 24.0)
      assert(math.abs(r.getAs[Double]("yhat") - expect) < 3.0,
        s"hour $i: ${r.getAs[Double]("yhat")} vs $expect")
    }
    // the cycle lives in the additive (seasonal) component
    val add = futRows.map(_.getAs[Double]("additive_terms"))
    assert(add.max - add.min > 30.0, s"daily cycle amplitude ${add.max - add.min}")
  }

  test("logistic growth respects floor and cap everywhere") {
    val cap = 100.0
    val hist = mkDaily(80, i => cap / (1 + math.exp(-(i - 40) / 8.0)) + 0.5)
      .toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "D", 30)
    val spec = StructuralTS.FitSpec(growth = "logistic", floor = 0.0, cap = 110.0,
                                    uncertaintySamples = 50)
    val out = Forecaster.forecast(hist, fut, spec).collect()
    out.foreach { r =>
      for (c <- Seq("yhat", "yhat_lower", "yhat_upper", "trend")) {
        val v = r.getAs[Double](c)
        assert(v >= 0.0 - 1e-9 && v <= 110.0 + 1e-9, s"$c=$v outside [floor,cap]")
      }
    }
    // saturation: late future approaches cap region, never explodes
    val lastYhat = out.filter(_.getAs[String]("segment") == "future")
      .maxBy(_.getAs[Timestamp]("ds").getTime).getAs[Double]("yhat")
    assert(lastYhat > 80.0 && lastYhat <= 110.0)
  }

  test("regressor coefficient recovery (C4/C7)") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(90)(rnd.nextDouble() * 10)
    val t = Array.tabulate(90)(i => base / 1000.0 + i * 86400.0)
    val y = Array.tabulate(90)(i => 1.0 + 2.0 * xs(i) + 0.01 * i)
    val m = StructuralTS.fit(t, y, Some(xs), StructuralTS.FitSpec(hasRegressor = true))
    val Some((coef, lo, hi, center)) = StructuralTS.regressorCoefficient(m)
    assert(math.abs(coef - 2.0) < 0.1, s"coef $coef")
    assert(lo < coef && coef < hi)
    assert(math.abs(center - xs.sum / 90) < 1e-9)
  }

  test("outputs are deterministic (closed-form intervals, no RNG)") {
    val hist = mkDaily(50, i => 5.0 + i + 3 * math.sin(i / 3.0)).toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "D", 7)
    val spec = StructuralTS.FitSpec(uncertaintySamples = 100)
    val a = Forecaster.forecast(hist, fut, spec).orderBy("ds").collect().map(_.toString)
    val b = Forecaster.forecast(hist, fut, spec).orderBy("ds").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("interval bounds: bracket yhat, collapse to ±q·σ on history, widen with horizon") {
    val rnd = new scala.util.Random(11)
    val hist = mkDaily(80, i => 10.0 + 0.7 * i + rnd.nextGaussian()).toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "D", 20)
    val rows = Forecaster.forecast(hist, fut, StructuralTS.FitSpec())
      .orderBy("ds").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("yhat_lower") <= r.getAs[Double]("yhat") + 1e-9)
      assert(r.getAs[Double]("yhat") <= r.getAs[Double]("yhat_upper") + 1e-9)
      assert(r.getAs[Double]("trend_lower") <= r.getAs[Double]("trend") + 1e-9)
      assert(r.getAs[Double]("trend") <= r.getAs[Double]("trend_upper") + 1e-9)
    }
    // historical rows: no trend-continuation variance -> trend bounds
    // equal trend, yhat width constant (2·|q|·σ)
    val histRows = rows.filter(_.getAs[String]("segment") == "historical")
    histRows.foreach { r =>
      assert(r.getAs[Double]("trend_lower") == r.getAs[Double]("trend"))
      assert(r.getAs[Double]("trend_upper") == r.getAs[Double]("trend"))
    }
    val histWidths = histRows.map(r => r.getAs[Double]("yhat_upper") - r.getAs[Double]("yhat_lower"))
    assert(histWidths.max - histWidths.min < 1e-9)
    // future rows: V(τ) = λ·2b²·(τ−1)³/3 grows with τ, so widths are
    // strictly increasing with horizon
    val futWidths = rows.filter(_.getAs[String]("segment") == "future")
      .map(r => r.getAs[Double]("yhat_upper") - r.getAs[Double]("yhat_lower"))
    assert(futWidths.length == 20)
    assert(futWidths.sliding(2).forall(p => p(0) < p(1)),
           s"future widths not increasing: ${futWidths.take(5).mkString(",")}")
    assert(futWidths.head >= histWidths.max - 1e-9)
  }

  test("quantile forecasts are monotone and bracket yhat (C10)") {
    val hist = mkDaily(80, i => 50.0 + 0.5 * i + 4 * math.sin(i / 5.0)).toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "D", 10)
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    val out = Forecaster.forecast(hist, fut,
      StructuralTS.FitSpec(uncertaintySamples = 300, quantiles = qs)).collect()
    out.foreach { r =>
      val qv = r.getSeq[Double](r.fieldIndex("quantile_values"))
      assert(qv.length == 5)
      assert(qv.sliding(2).forall(p => p(0) <= p(1)), s"not monotone: $qv")
      val yhat = r.getAs[Double]("yhat")
      assert(qv.head <= yhat + 1e-9 && yhat <= qv.last + 1e-9)
      // median should track yhat closely
      assert(math.abs(qv(2) - yhat) < 3.0, s"median ${qv(2)} vs yhat $yhat")
    }
  }

  test("futureGrid: per-series horizon at grain spacing") {
    val hist = (mkDaily(5, _.toDouble, "a") ++ mkDaily(8, _.toDouble, "b"))
      .toDF("series", "ds", "y")
    val grid = Forecaster.futureGrid(hist, "D", 3).collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).groupBy(_._1)
    assert(grid("a").length == 3 && grid("b").length == 3)
    val aDs = grid("a").map(_._2.getTime).sorted
    assert(aDs.head == base + 5L * day && aDs.last == base + 7L * day)
    val bDs = grid("b").map(_._2.getTime).sorted
    assert(bDs.head == base + 8L * day)
  }

  test("degenerate series: 1-point series skipped, 2-point series fits") {
    val hist = (mkDaily(1, _ => 5.0, "one") ++ mkDaily(2, i => 5.0 + i, "two"))
      .toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "D", 3)
    val out = Forecaster.forecast(hist, fut, StructuralTS.FitSpec(uncertaintySamples = 10))
      .collect()
    assert(!out.exists(_.getString(0) == "one"), "1-point series should be skipped")
    val two = out.filter(_.getString(0) == "two")
    assert(two.length == 5) // 2 history + 3 future
    assert(two.forall(r => !r.getAs[Double]("yhat").isNaN))
  }

  test("multiple series fit independently in one pass") {
    val hist = (mkDaily(40, i => 1.0 + 2.0 * i, "up") ++
                mkDaily(40, i => 100.0 - 2.0 * i, "down")).toDF("series", "ds", "y")
    val fut = Forecaster.futureGrid(hist, "D", 5)
    val out = Forecaster.forecast(hist, fut, StructuralTS.FitSpec(uncertaintySamples = 20))
      .filter(col("segment") === "future").collect()
    val up = out.filter(_.getString(0) == "up").map(_.getAs[Double]("yhat"))
    val down = out.filter(_.getString(0) == "down").map(_.getAs[Double]("yhat"))
    assert(up.forall(_ > 75), s"up future ${up.mkString(",")}")
    assert(down.forall(_ < 30), s"down future ${down.mkString(",")}")
  }
}
