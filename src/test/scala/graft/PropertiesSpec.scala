package graft

import graft.operators.{Hits, Normalize, Salsa}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2(4)) over random small
  * graphs: norms, rescale invariance. Uses ScalaCheck generators with
  * fixed seeds (no scalatest bridge artifact in the offline cache). */
class PropertiesSpec extends SparkSuite {

  private val genEdges: Gen[List[(String, String, Double)]] = for {
    n <- Gen.choose(3, 8)
    m <- Gen.choose(2, 14)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0, n - 1)
      d <- Gen.choose(0, n - 1)
      w <- Gen.choose(1, 9)
    } yield (s"n$s", s"n$d", w.toDouble))
  } yield edges

  private def samples(k: Int): Seq[List[(String, String, Double)]] =
    (1 to k).flatMap(i => genEdges.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("HITS: post-run L2 norms are 1; SALSA simplified: L1 mass is 1") {
    samples(6).foreach { edges =>
      val g = graph(edges)
      val h = Hits.run(g, numIter = 2)
      val n2 = h.hubs.agg(sum(col("score") * col("score"))).head.getDouble(0)
      assert(math.abs(n2 - 1.0) < 1e-9, s"edges=$edges")
      val s = Salsa.runSimplified(g.edges)
      val l1 = s.auths.agg(sum(col("score"))).head.getDouble(0)
      assert(math.abs(l1 - 1.0) < 1e-9, s"edges=$edges")
    }
  }

  test("normalize: rescaling input leaves normalized output unchanged") {
    import spark.implicits._
    samples(4).foreach { edges =>
      val scores = edges.map(e => (e._1, e._3)).distinct.toDF("id", "score")
      val a = scoresMap(Normalize.l2(scores))
      val b = scoresMap(Normalize.l2(
        scores.select(col("id"), (col("score") * 7.5).as("score"))))
      a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9) }
    }
  }
}
