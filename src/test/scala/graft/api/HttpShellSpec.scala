package graft.api

import graft.SparkTestSession
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite

/** S1/S4 end-to-end over real HTTP: the dev shell serves the
  * reference's routes with its status/body conventions. */
class HttpShellSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private lazy val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET().build(),
                HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
                  .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
                HttpResponse.BodyHandlers.ofString())

  private val request = {
    val rows = (1 to 20).map(d =>
      s"""{"date": "2024-03-${f"$d%02d"}T00:00:00Z", "v": ${100.0 + 3 * d}}""")
      .mkString("[", ",", "]")
    s"""{"documents": {"m": {"description": null, "data": $rows}},
       |  "analyticsOptions": {"correlations": [{
       |    "id": "c1", "type": "prophet",
       |    "fromData": "m", "fromIndex": "v", "toData": "m", "toIndex": "v",
       |    "dataSetGranularity": "D", "unitsToForecast": 3}]}}""".stripMargin
  }

  test("health + analyze + saturating single + 422 on garbage, over HTTP") {
    val server = HttpShell.start(spark, 0) // ephemeral port
    try {
      val port = server.getAddress.getPort

      val health = get(port, "/health")
      assert(health.statusCode() == 200 && health.body() == "null")
      assert(get(port, "/analyze").statusCode() == 405) // GET on a POST route

      val analyzed = post(port, "/analyze", request)
      assert(analyzed.statusCode() == 200, analyzed.body().take(200))
      assert(analyzed.body().contains("\"c1\"") &&
             analyzed.body().contains("futureForecasts") &&
             analyzed.body().contains("autocorrelations"))

      val single = post(port, "/saturating-growth/single", request)
      assert(single.statusCode() == 200, single.body().take(200))
      assert(single.body().contains("\"growth\": \"linear\"") &&
             single.body().contains("\"bounds\""))

      // §3.2 pair route: nested ForecastingOptions defaults -> logistic
      // (an empty toIndex struct would be pruned by schema inference —
      // carry one real field so ForecastingOptions survives the parse)
      val pair = post(port, "/saturating-growth",
        request.replace("\"unitsToForecast\": 3",
          "\"unitsToForecast\": 3, " +
          "\"ForecastingOptions\": {\"toIndex\": {\"changepointPriorScale\": 0.5}}"))
      assert(pair.statusCode() == 200, pair.body().take(200))
      assert(pair.body().contains("\"growth\": \"logistic\""))

      assert(post(port, "/analyze", "{not json").statusCode() == 422)
      val missing = post(port, "/analyze", request.replace("\"toData\": \"m\", ", ""))
      assert(missing.statusCode() == 422 && missing.body().contains("toData"))
    } finally server.stop(0)
  }
}
