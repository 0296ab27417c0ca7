package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StumpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("perfectly separable feature finds the exact threshold") {
    // y = 1 iff x >= 10; best split is x <= 9 (pure sides)
    val df = ((1 to 9).map(x => (x.toLong, 0L, x.toLong % 3)) ++
              (10 to 20).map(x => (x.toLong, 1L, x.toLong % 3)))
      .toDF("x", "y", "z")
    val got = Stump.bestSplits(df, Seq("x"), "y").collect().head
    assert(got.getAs[Long]("threshold") == 9L)
    assert(got.getAs[Long]("n_left") == 9L)
    assert(got.getAs[Long]("n_right") == 11L)
    // pure sides: score = nL + nR = n -> 20e6
    assert(got.getAs[Long]("score_e6") == 20000000L)
  }

  test("uninformative feature scores the parent purity everywhere") {
    // y independent of z: every split of z has the same class mix
    // (z alternates, y alternates in phase with x only)
    val df = (0 until 40).map(i => (i.toLong, (i % 2).toLong,
      (i / 20).toLong)).toDF("x", "y", "z")
    val splits = Stump.bestSplits(df, Seq("x", "z"), "y")
      .collect().map(r => r.getAs[String]("feature") ->
        r.getAs[Long]("score_e6")).toMap
    // x separates nothing here either (alternating), but z <= 0 is a
    // 50/50 split both sides: score = 10+10 = 20 -> parent-level
    assert(splits("z") == 20000000L)
  }

  test("hand-computed two-sided impurity") {
    // x: 1 1 2 2, y: 1 0 0 0. split x<=1: L(1,1) R(0,2)
    // score = (1+1)/2 + (0+4)/2 = 1 + 2 = 3 -> 3e6
    val df = Seq((1L, 1L), (1L, 0L), (2L, 0L), (2L, 0L)).toDF("x", "y")
    val got = Stump.bestSplits(df, Seq("x"), "y").collect().head
    assert(got.getAs[Long]("threshold") == 1L)
    assert(got.getAs[Long]("score_e6") == 3000000L)
  }

  test("ties break toward the smallest threshold") {
    // constant y: every split scores the same; expect smallest v
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("x", "y")
    val got = Stump.bestSplits(df, Seq("x"), "y").collect().head
    assert(got.getAs[Long]("threshold") == 1L)
  }
}
