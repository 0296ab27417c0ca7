package graft.api

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end fidelity: a request shaped like the reference's
  * `example-timestamp.json` fixture (nested observations, dotted index
  * paths, ISO dates with Z) flows parse → analyze → response JSON. */
class ApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def obs(day: Int, total: Double, cost: Double): String =
    s"""{"date": "2024-03-${f"$day%02d"}T23:59:59Z",
       | "data": {"summary": {"totalWithTax": $total, "shippingCost": $cost},
       |          "currency": "USD"}}""".stripMargin

  private lazy val requestJson = {
    val sales = (1 to 28).map(d => obs(d, 1000 + 40.0 * d + (d % 7) * 25.0, 10 + d % 3))
      .mkString("[", ",", "]")
    val purchasing = (1 to 28).map(d => obs(d, 500 + 20.0 * d, 5))
      .mkString("[", ",", "]")
    s"""{
       |  "documents": {
       |    "sales_order": {"description": "sales", "data": $sales},
       |    "purchasing_order": {"description": null, "data": $purchasing}
       |  },
       |  "analyticsOptions": {"correlations": [{
       |    "id": "corr1", "type": "prophet",
       |    "fromData": "purchasing_order", "fromIndex": "data.summary.totalWithTax",
       |    "toData": "sales_order", "toIndex": "data.summary.totalWithTax",
       |    "dataSetGranularity": "D", "dataAggregationType": "sum",
       |    "unitsToForecast": 7
       |  }]}
       |}""".stripMargin
  }

  test("request parse: documents keep nested structs, specs mapped") {
    val parsed = RequestParser.parse(spark, requestJson)
    assert(parsed.documents.keySet == Set("sales_order", "purchasing_order"))
    val sales = parsed.documents("sales_order")
    assert(sales.count() == 28)
    assert(sales.select("data.summary.totalWithTax").count() == 28)
    val c = parsed.correlations.head
    assert(c.id == "corr1" && c.grain.contains("D") && c.unitsToForecast.contains(7))
  }

  test("full analyze: forecasts, diagnostics, coefficients, response JSON") {
    val parsed = RequestParser.parse(spark, requestJson)
    val specs = parsed.correlations.map(_.copy(uncertaintySamples = 50))
    val result = AnalyzePipeline.analyze(parsed.documents, specs)

    val fc = result.targetForecasts.collect()
    assert(fc.count(_.getAs[String]("segment") == "historical") == 28)
    assert(fc.count(_.getAs[String]("segment") == "future") == 7)
    // rough signal: forecasts should continue the upward trend
    val futYhat = fc.filter(_.getAs[String]("segment") == "future").map(_.getAs[Double]("yhat"))
    assert(futYhat.forall(_ > 1500), futYhat.mkString(","))

    val diag = result.diagnostics.collect()
    assert(diag.exists(r => r.getString(0) == "corr1" && r.getString(4) == "from"))
    assert(diag.exists(r => r.getString(0) == "corr1" && r.getString(4) == "to"))
    // lag-0 autocorrelation is 1 by definition
    assert(diag.filter(_.getInt(1) == 0).forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-12))

    val json = ResponseAssembly.toJson(result)
    assert(json.contains("\"corr1\""))
    assert(json.contains("historicalForecasts"))
    assert(json.contains("futureForecasts"))
    assert(json.contains("prediction_lower_bound"))
    assert(json.contains("autocorrelations"))
    // balanced braces → structurally sound JSON
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("all correlations are processed (the reference's first-only bug is fixed)") {
    val parsed = RequestParser.parse(spark, requestJson)
    val two = parsed.correlations ++ parsed.correlations.map(_.copy(id = "corr2"))
    val result = AnalyzePipeline.analyze(parsed.documents, two.map(_.copy(uncertaintySamples = 20)))
    val series = result.targetForecasts.select("series").distinct().collect().map(_.getString(0)).toSet
    assert(series == Set("corr1", "corr2"))
  }
}
