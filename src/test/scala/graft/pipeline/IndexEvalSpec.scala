package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 index-quality additions: the retrieval-eval scorecard
  * (recall@k / MRR / NDCG@k) and the IVF cell-health diagnostics. */
class IndexEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranked(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "neighbor_id", "rn")

  // ---- rankEval --------------------------------------------------------

  test("perfect retrieval scores 1.0 on all three metrics") {
    val truth = ranked((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val out = Similarity.rankEval(truth, truth, 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
  }

  test("missing the true nearest zeroes MRR; recall/NDCG follow the hand computation") {
    val truth  = ranked((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val approx = ranked((1L, 11L, 1L), (1L, 12L, 2L), (1L, 99L, 3L))
    val r = Similarity.rankEval(truth, approx, 3).collect().head
    def lg2(x: Double) = math.log(x) / math.log(2)
    val dcg  = 1 / lg2(2) + 1 / lg2(3)             // hits at approx ranks 1, 2
    val idcg = 1 / lg2(2) + 1 / lg2(3) + 1 / lg2(4)
    assert(r.getDouble(1) == BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == BigDecimal(dcg / idcg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("short truth lists (corpus < k) normalize to 1.0 when fully retrieved") {
    val truth  = ranked((7L, 10L, 1L), (7L, 11L, 2L))   // only 2 true neighbors
    val approx = ranked((7L, 10L, 1L), (7L, 11L, 2L), (7L, 99L, 3L))
    val r = Similarity.rankEval(truth, approx, 5).collect().head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
  }

  test("rows beyond k are ignored on both sides") {
    val truth  = ranked((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 9L))
    val approx = ranked((1L, 10L, 1L), (1L, 12L, 2L), (1L, 11L, 9L))
    // at k=2: truth = {10@1, 11@2}, approx = {10@1, 12@2} -> one hit
    val r = Similarity.rankEval(truth, approx, 2).collect().head
    assert(r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 1.0) // true nearest found at approx rank 1
  }

  // ---- ivfCellStats ----------------------------------------------------

  test("cell stats: populations, load ratios, zero distortion at the centroid, empty cells kept") {
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0), 2 -> Seq(-1.0, 0.0))
    val emb = Seq(
      (10L, Seq(2.0, 0.0)),  // cell 0, cos 1
      (11L, Seq(3.0, 0.0)),  // cell 0, cos 1
      (12L, Seq(0.0, 5.0))   // cell 1, cos 1
    ).toDF("vec_id", "v")
    val out = Similarity.ivfCellStats(emb, cents).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
                                  if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(0L) == ((2L, 2.0, Some(0.0))))   // 2 * 3 cells / 3 vecs
    assert(out(1L) == ((1L, 1.0, Some(0.0))))
    assert(out(2L) == ((0L, 0.0, None)))        // dead cell surfaces, not vanishes
  }

  test("distortion reflects the round-4 assignment cosine") {
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    // 45-degree vector: assigned to cell 0 (tie on cos -> lower cell id),
    // cos = round(sqrt(0.5), 4) = 0.7071
    val emb = Seq((10L, Seq(1.0, 1.0))).toDF("vec_id", "v")
    val out = Similarity.ivfCellStats(emb, cents).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(1) == 1L)
    assert(out(0L).getDouble(3) == BigDecimal(1.0 - 0.7071).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1L).getLong(1) == 0L)
  }
}
