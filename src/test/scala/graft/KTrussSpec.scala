package graft

import graft.operators.{KTruss, Triangles}

class KTrussSpec extends SparkSuite {

  private def edgesDf(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  /** Reference peel over in-memory sets: support = triangles per edge,
    * drop < k-2, repeat to fixed point. */
  private def bruteTruss(edges: Seq[(String, String)],
      k: Int): Map[(String, String), Int] = {
    var e = edges.map { case (x, y) =>
      if (x < y) (x, y) else (y, x)
    }.filter(p => p._1 != p._2).toSet
    var done = false
    var sup = Map.empty[(String, String), Int]
    while (!done) {
      val adj = e.toSeq.flatMap(p => Seq(p, p.swap))
        .groupBy(_._1).map { case (n, ps) => n -> ps.map(_._2).toSet }
      sup = e.toSeq.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size
      }.toMap
      val next = e.filter(p => sup(p) >= k - 2)
      done = next == e
      e = next
    }
    sup.filter { case (p, _) => e(p) }
  }

  private def collectTruss(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2).toInt).toMap

  test("K4 is its own 4-truss; a pendant triangle is peeled") {
    // K4 on a..d (every edge closes 2 triangles) plus triangle d-e-f
    // (support 1 edges) and pendant edge f-g (support 0).
    val e = edgesDf(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("d", "e"), ("e", "f"), ("d", "f"), ("f", "g"))
    val got = collectTruss(KTruss.run(e, 4))
    assert(got == Map(
      ("a", "b") -> 2, ("a", "c") -> 2, ("a", "d") -> 2,
      ("b", "c") -> 2, ("b", "d") -> 2, ("c", "d") -> 2))
    // k=3 keeps both triangles but still drops the pendant edge
    val k3 = collectTruss(KTruss.run(e, 3))
    assert(k3.keySet.contains(("d", "e")) && k3.keySet.contains(("e", "f")))
    assert(!k3.keySet.contains(("f", "g")) && k3.size == 9)
  }

  test("triangle strip cascades to empty at k=4; partial peel refused") {
    // Strip: triangle i = {v_i, v_i+1, v_i+2}, consecutive triangles
    // sharing a side. Diagonals (v_i, v_i+2) close one triangle each
    // (support 1) and drop in round 1; that leaves the path edges
    // triangle-free, so round 2 empties the truss — two shrinking
    // rounds, and maxRounds=1 must refuse the partial peel loudly
    // rather than return the post-round-1 edge set.
    val strip = (0 until 10).flatMap(i =>
      Seq((s"v${i}", s"v${i + 1}"), (s"v${i}", s"v${i + 2}")))
    val df = edgesDf((strip :+ ("v10", "v11")): _*)
    assert(KTruss.run(df, 4).count() == 0L)
    val ex = intercept[IllegalArgumentException] {
      KTruss.run(df, 4, maxRounds = 1).count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("triangle-free and empty graphs yield empty trusses, no crash") {
    assert(KTruss.run(edgesDf(("a", "b"), ("b", "c")), 4).count() == 0L)
    assert(KTruss.run(edgesDf(), 4).count() == 0L)
  }

  test("matches the brute-force peel on random graphs, k=3..5") {
    val rnd = new scala.util.Random(11)
    (0 until 3).foreach { _ =>
      val es = (0 until 120).map(_ =>
        (s"n${rnd.nextInt(18)}", s"n${rnd.nextInt(18)}"))
      val df = edgesDf(es: _*)
      (3 to 5).foreach { k =>
        assert(collectTruss(KTruss.run(df, k)) == bruteTruss(es, k),
          s"k=$k mismatch")
      }
    }
  }

  test("runOn over the prebuilt projection is bit-equal to run") {
    val rnd = new scala.util.Random(5)
    val es = (0 until 80).map(_ =>
      (s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}"))
    val df = edgesDf(es: _*)
    val a = collectTruss(KTruss.run(df, 4))
    val b = collectTruss(KTruss.runOn(Triangles.undirected(df), 4))
    assert(a == b)
  }
}
