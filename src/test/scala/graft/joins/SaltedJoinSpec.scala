package graft.joins

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[SaltedJoin.saltedEquiJoin]] — result-identity with the plain
  * join, and the salt spread actually partitions a hot key. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted join ≡ plain join, row-exactly") {
    import spark.implicits._
    val fact = (1L to 200L).map(i => (i, if (i % 10 == 0) "cold" else "hot", i * 3))
      .toDF("id", "k", "v")
    val dim = Seq(("hot", 1L), ("cold", 2L)).toDF("k", "attr")
    val got = SaltedJoin.saltedEquiJoin(fact, dim, Seq("k"), "id", salts = 7)
      .select("id", "k", "v", "attr").collect().map(_.toSeq).toSet
    val want = fact.join(dim, Seq("k")).select("id", "k", "v", "attr")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.size == 200)
  }

  test("each fact row matches its dim row exactly once (no fan-out)") {
    import spark.implicits._
    val fact = (1L to 50L).map(i => (i, "only")).toDF("id", "k")
    val dim = Seq(("only", 9L)).toDF("k", "attr")
    val n = SaltedJoin.saltedEquiJoin(fact, dim, Seq("k"), "id", salts = 16).count()
    assert(n == 50L)
  }
}
