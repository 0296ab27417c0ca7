package graft.pipeline

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based invariants for the dedup family, run against real
  * Spark plans on generated corpora:
  *  - exact duplicates always share minhash signatures AND are found
  *    by the LSH pipeline with Jaccard exactly 1.0 (no false negative
  *    for identical docs — bands of equal signatures always collide);
  *  - every confirmed Jaccard lies in (0, 1];
  *  - SimHash is word-order invariant (it hashes the token multiset).
  */
object DedupPropertiesSpec extends Properties("graft.dedup") {

  private lazy val spark = SparkTestSession.spark

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november")

  private val doc: Gen[String] =
    Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("identical docs: same signature, LSH finds them, jaccard = 1") =
    Prop.forAll(Gen.listOfN(4, doc)) { texts =>
      import spark.implicits._
      // duplicate every doc once: ids (i, i+100) are exact pairs
      val rows = texts.zipWithIndex.flatMap { case (t, i) =>
        Seq((i.toLong, t), (i.toLong + 100, t))
      }
      val df = rows.toDF("doc_id", "text")
      val sh = TextDedup.bigramShingles(df, "doc_id", "text")
      val sig = TextDedup.minhashSignature(sh, 4)
      val sigMap = sig.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val sigsMatch = texts.indices.forall { i =>
        // docs of <2 words have no bigrams (absent from sig) — skip
        !sigMap.contains(i.toLong) || sigMap(i.toLong) == sigMap(i.toLong + 100)
      }
      val jac = TextDedup.jaccard(sh,
          TextDedup.candidatePairs(TextDedup.lshBands(sig, 4, 2)))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val dupsFound = texts.indices.forall { i =>
        !sigMap.contains(i.toLong) || jac.get((i.toLong, i.toLong + 100)).contains(1.0)
      }
      val range = jac.values.forall(j => j > 0.0 && j <= 1.0)
      sigsMatch && dupsFound && range
    }

  property("frequent-shingle prune bounds boilerplate candidate blowup") =
    Prop.forAll(Gen.choose(40, 60)) { n =>
      import spark.implicits._
      // every doc shares the same boilerplate sentence, plus unique
      // content: unpruned, the boilerplate bigrams dominate most minhash
      // slices and band buckets go quadratic in n; pruned (df > 10%), no
      // doc pair shares ANY remaining bigram, so candidates vanish. The
      // corpus is deterministic per n (md5 is fixed), so no flake.
      val boiler = "terms of service apply to all content on this site"
      val docs = (0 until n).map { i =>
        (i.toLong, s"$boiler unique$i content$i words$i body$i text$i")
      }.toDF("doc_id", "text")
      val sh = TextDedup.bigramShingles(docs, "doc_id", "text")
      val unpruned = TextDedup.candidatePairs(
        TextDedup.lshBands(TextDedup.minhashSignature(sh, 16), 16, 2)).count()
      val pruned = TextDedup.candidatePairs(
        TextDedup.lshBands(
          TextDedup.minhashSignature(
            TextDedup.pruneFrequentShingles(sh, 0.1), 16), 16, 2)).count()
      // super-linear blowup without the guard; zero candidates with it
      unpruned >= n.toLong && pruned == 0L
    }

  property("simhash is word-order invariant") =
    Prop.forAll(doc) { text =>
      import spark.implicits._
      val shuffled = scala.util.Random.shuffle(text.split(" ").toList).mkString(" ")
      val df = Seq((1L, text), (2L, shuffled)).toDF("doc_id", "text")
      val sh = TextDedup.simhash16(df, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      sh(1L) == sh(2L)
    }
}
