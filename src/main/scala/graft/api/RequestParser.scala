package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S1 + S2: parse the reference's request envelope (FIXTURES.md §1)
  * Spark-natively — `spark.read.json` does the schema inference the
  * reference delegates to pydantic + `pd.DataFrame(list[dict])`
  * (`app.py:65-67`, `app.py:78`). Each named document becomes a
  * DataFrame (nested observation fields stay as nested structs, so
  * dotted `fromIndex` paths resolve as qualified column references). */
object RequestParser {

  case class ParsedRequest(documents: Map[String, DataFrame],
                           correlations: Seq[CorrelationSpec])

  def parse(spark: SparkSession, requestJson: String): ParsedRequest = {
    import spark.implicits._
    val env = spark.read.option("multiLine", "true").json(Seq(requestJson).toDS())

    val docsType = env.schema("documents").dataType.asInstanceOf[StructType]
    val documents = docsType.fieldNames.map { name =>
      name -> env.select(explode(col(s"documents.`$name`.data")).as("r")).select("r.*")
    }.toMap

    val corrRows = env.select(explode(col("analyticsOptions.correlations")).as("c"))
      .select("c.*")
    val fields = corrRows.columns.toSet
    def strOpt(r: org.apache.spark.sql.Row, name: String): Option[String] =
      if (fields(name) && !r.isNullAt(r.fieldIndex(name))) Some(r.getAs[Any](name).toString)
      else None
    val correlations = corrRows.collect().toSeq.map { r =>
      CorrelationSpec(
        id = strOpt(r, "id").getOrElse("c0"),
        fromData = strOpt(r, "fromData").get,
        fromIndex = strOpt(r, "fromIndex").get,
        toData = strOpt(r, "toData").get,
        toIndex = strOpt(r, "toIndex").get,
        // the reference's pydantic default is grain "D" (app.py:39-43):
        // a request without dataSetGranularity still daily-buckets
        grain = strOpt(r, "dataSetGranularity").orElse(Some("D")),
        aggregation = strOpt(r, "dataAggregationType").getOrElse("sum"),
        unitsToForecast = strOpt(r, "unitsToForecast").map(_.toDouble.toInt),
        changePointPriorScale = strOpt(r, "ChangePointPriorScale").map(_.toDouble).getOrElse(0.8),
        // saturating-growth options (§3.2/§3.3 ForecastingOptions,
        // app.py:253-272), accepted flat on the correlation spec
        growth = strOpt(r, "growth").getOrElse("linear"),
        floor = strOpt(r, "floor").map(_.toDouble).getOrElse(0.0),
        ceiling = strOpt(r, "ceiling").map(_.toDouble))
    }
    ParsedRequest(documents, correlations)
  }
}
