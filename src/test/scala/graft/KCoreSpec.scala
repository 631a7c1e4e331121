package graft

import graft.operators.KCore

class KCoreSpec extends SparkSuite {

  private def edges(rows: (String, String)*) = {
    import spark.implicits._
    rows.map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "weight")
  }

  private def run(df: org.apache.spark.sql.DataFrame, k: Int,
      maxRounds: Int = 24): Map[String, Long] =
    KCore.run(df, k, maxRounds).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Reference implementation: sequential peel over collected edges. */
  private def brute(rows: Seq[(String, String)], k: Int)
      : Map[String, Long] = {
    var und = rows.collect { case (s, d) if s != d =>
      if (s < d) (s, d) else (d, s)
    }.distinct
    var changed = true
    while (changed) {
      val deg = (und.map(_._1) ++ und.map(_._2))
        .groupBy(identity).map { case (id, o) => id -> o.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = und.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != und.size
      und = next
    }
    (und.map(_._1) ++ und.map(_._2)).groupBy(identity)
      .map { case (id, o) => id -> o.size.toLong }
  }

  test("K4 survives the 3-core; a pendant chain peels away") {
    val k4 = Seq("a", "b", "c", "d").combinations(2).toSeq
      .map { case Seq(x, y) => (x, y) }
    val got = run(edges(k4 ++ Seq(("a", "p1"), ("p1", "p2")): _*), 3)
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("cascading peel: a path graph's 2-core is empty") {
    val path = (1 until 8).map(i => (s"n$i", s"n${i + 1}"))
    assert(run(edges(path: _*), 2).isEmpty)
    // ...but closing it into a cycle makes every node 2-core deg 2
    val cyc = run(edges(path :+ (("n8", "n1")): _*), 2)
    assert(cyc.values.forall(_ == 2L) && cyc.size == 8)
  }

  test("k=1 keeps the whole simple projection") {
    val got = run(edges(("a", "b"), ("b", "c"), ("a", "a")), 1)
    assert(got == Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
  }

  test("unconverged peel within maxRounds fails loudly") {
    // A 12-node path at k=2 needs 6 peel rounds; cap at 3.
    val path = (1 until 12).map(i => (s"n$i", s"n${i + 1}"))
    val ex = intercept[IllegalArgumentException](
      run(edges(path: _*), 2, maxRounds = 3))
    assert(ex.getMessage.contains("did not converge"))
  }

  test("cores nest: the (k+1)-core's nodes are a subset of the k-core's") {
    val rnd = new scala.util.Random(59)
    val rows = (0 until 140).map(_ =>
      (s"n${rnd.nextInt(26)}", s"n${rnd.nextInt(26)}"))
    val e = edges(rows: _*)
    val byK = (1 to 5).map(k => k -> run(e, k).keySet)
    byK.sliding(2).foreach { case Seq((k, lo), (_, hi)) =>
      assert(hi.subsetOf(lo), s"${k + 1}-core ⊄ $k-core")
    }
  }

  test("random graphs match the sequential peel (k = 2, 3, 4)") {
    val rnd = new scala.util.Random(53)
    (0 until 3).foreach { _ =>
      val rows = (0 until 110).map(_ =>
        (s"n${rnd.nextInt(24)}", s"n${rnd.nextInt(24)}"))
      (2 to 4).foreach { k =>
        assert(run(edges(rows: _*), k) == brute(rows, k), s"k=$k")
      }
    }
  }

  test("weighted peel matches a sequential weighted peel; unit weights " +
      "degenerate to the unweighted core") {
    import spark.implicits._
    // unit weights on a SIMPLE graph (no parallel/reversed duplicates —
    // the weighted projection SUMS parallel weights while the
    // unweighted one collapses them, so degeneracy needs simplicity):
    // surviving nodes and strengths equal run(k)'s core_degree
    val rows = (0 until 110).map { i =>
      (s"n${i % 17}", s"n${(i * 5 + 2) % 17}")
    }.map { case (s, d) => if (s < d) (s, d) else (d, s) }
      .distinct.filter { case (s, d) => s != d }
    val unit = KCore.runWeighted(edges(rows: _*), 2.0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(unit.view.mapValues(_.toLong).toMap == run(edges(rows: _*), 2))
    // fractional weights vs a sequential micro-unit peel
    val rnd = new scala.util.Random(67)
    val wrows = (0 until 100).map(_ =>
      (s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}",
        math.rint(rnd.nextDouble() * 500) / 100.0))
    val thr = 6.0
    val got = KCore.runWeighted(wrows.toDF("src", "dst", "weight"), thr)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    var undW = wrows.collect { case (s, d, w) if s != d =>
      (if (s < d) (s, d) else (d, s)) -> math.round(w * 1e6)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }.toSeq
    val kMicro = math.round(thr * 1e6)
    var changed = true
    while (changed) {
      val wd = (undW.map { case ((a, _), w) => a -> w } ++
        undW.map { case ((_, b), w) => b -> w })
        .groupBy(_._1).map { case (id, o) => id -> o.map(_._2).sum }
      val keep = wd.filter(_._2 >= kMicro).keySet
      val next = undW.filter { case ((a, b), _) => keep(a) && keep(b) }
      changed = next.size != undW.size
      undW = next
    }
    val expected = (undW.map { case ((a, _), w) => a -> w } ++
      undW.map { case ((_, b), w) => b -> w })
      .groupBy(_._1).map { case (id, o) => id -> o.map(_._2).sum / 1e6 }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (n, s) =>
      assert(math.abs(got(n) - s) < 1e-6, s"strength mismatch at $n")
    }
  }
}
