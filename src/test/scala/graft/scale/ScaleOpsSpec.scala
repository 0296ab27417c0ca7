package graft.scale

import graft.SparkTestSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i", i * 1.0))
      .toDF("k", "name", "v")
    val dims = (0 until 50).map(i => (i.toLong, s"dim$i")).toDF("k", "label")
    ScaleOps.writeBucketed(facts, "graft_b_fact", "k", 8)
    ScaleOps.writeBucketed(dims, "graft_b_dim", "k", 8)
    // disable broadcast so the join strategy must rely on bucketing
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = ScaleOps.readTable(spark, "graft_b_fact")
        .join(ScaleOps.readTable(spark, "graft_b_dim"), Seq("k"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan
      val inner = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = inner.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected bucketed co-located join, got:\n$inner")
    }
  }

  test("salted join returns exactly the plain-join result") {
    // heavy skew: 90% of facts share one key
    val facts = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i))
      .toDF("k", "id")
    val dims = (0L to 9L).map(k => (k, s"d$k")).toDF("k", "label")
    val plain = facts.join(dims, Seq("k")).select("id", "label")
      .collect().map(_.toString).sorted
    val salted = ScaleOps.saltedJoin(facts, dims, "k", salts = 8).select("id", "label")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
    // deterministic column-derived salt: same result, reproducible spread
    val saltedDet = ScaleOps.saltedJoin(facts, dims, "k", salts = 8,
        saltSrc = Some("id")).select("id", "label")
      .collect().map(_.toString).sorted
    assert(saltedDet.sameElements(plain))
  }

  test("salted join with a NON-NUMERIC salt source drops no rows") {
    // regression: casting a string column to long yields NULL salts,
    // which silently dropped every fact row from the inner join
    val facts = (1 to 500).map(i => (0L, s"name$i")).toDF("k", "nm")
    val dims = Seq((0L, "d0")).toDF("k", "label")
    val salted = ScaleOps.saltedJoin(facts, dims, "k", salts = 8,
        saltSrc = Some("nm"))
    assert(salted.count() == 500)
    // and the salt genuinely spreads the skewed key across buckets
    val spread = facts
      .withColumn("s", pmod(hash(col("nm")), lit(8)))
      .select("s").distinct().count()
    assert(spread > 1)
  }

  private def withConf(kv: (String, String))(body: => Unit): Unit = {
    val old = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try body
    finally old match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }
}
