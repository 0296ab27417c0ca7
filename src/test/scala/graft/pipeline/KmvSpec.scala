package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("small set: sketch is the set, estimate exact") {
    val df = (1 to 100).map(i => ("a", s"m$i")).toDF("s", "m")
    val est = Kmv.estimate(Kmv.sketch(df, "s", "m", k = 256), k = 256)
      .collect().head
    assert(est.getAs[Long]("n_sketch") == 100L)
    assert(est.getAs[Double]("est") == 100.0)
  }

  test("two-level min-k equals the naive per-set rank") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"m$i")).toDF("s", "m")
    val got = Kmv.sketch(df, "s", "m", k = 64)
      .orderBy("s", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val naive = df
      .select(col("s"), CorpusSketch.h60(col("m").cast("string"), "kmv")
        .as("h")).distinct()
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("s")).orderBy(col("h")))
          .cast("long"))
      .filter(col("rk") <= 64)
      .orderBy("s", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == naive)
  }

  test("estimate within 15% on a 5000-member set at k=256") {
    val df = (1 to 5000).map(i => ("a", s"member_$i")).toDF("s", "m")
    val est = Kmv.estimate(Kmv.sketch(df, "s", "m", k = 256), k = 256)
      .collect().head.getAs[Double]("est")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"est=$est")
  }

  test("pairOverlap: planted 50% overlap estimates Jaccard ~ 1/3") {
    // A = 1..4000, B = 2001..6000: |A∩B|=2000, |A∪B|=6000, J=1/3
    val a = (1 to 4000).map(i => ("A", s"u$i"))
    val b = (2001 to 6000).map(i => ("B", s"u$i"))
    val sk = Kmv.sketch((a ++ b).toDF("s", "m"), "s", "m", k = 256)
    val r = Kmv.pairOverlap(sk, k = 256).collect().head
    val j = r.getAs[Long]("jaccard_e6") / 1e6
    assert(math.abs(j - 1.0 / 3.0) < 0.08, s"j=$j")
    val inter = r.getAs[Double]("inter_est")
    assert(math.abs(inter - 2000.0) / 2000.0 < 0.2, s"inter=$inter")
  }

  test("pairOverlap: disjoint sets report zero matches, sane union") {
    val a = (1 to 500).map(i => ("A", s"x$i"))
    val b = (1 to 500).map(i => ("B", s"y$i"))
    val sk = Kmv.sketch((a ++ b).toDF("s", "m"), "s", "m", k = 256)
    val r = Kmv.pairOverlap(sk, k = 256).collect().head
    assert(r.getAs[Long]("matches") == 0L)
    assert(r.getAs[Long]("jaccard_e6") == 0L)
    assert(r.getAs[Double]("union_est") > 500.0)
  }
}
