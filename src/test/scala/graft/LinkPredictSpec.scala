package graft

import graft.operators.LinkPredict

class LinkPredictSpec extends SparkSuite {

  private def edges(rows: (String, String)*) = {
    import spark.implicits._
    rows.map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "weight")
  }

  private def top(df: org.apache.spark.sql.DataFrame, k: Int = 20,
      cap: Long = 64) =
    LinkPredict.topCandidates(df, k, cap).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

  /** Brute-force twin: all wedge pairs through capped centers, adjacency
    * excluded, same rounding and ordering. */
  private def brute(rows: Seq[(String, String)], cap: Long)
      : Seq[(String, String, Long, Double)] = {
    val und = rows.collect { case (s, d) if s != d =>
      if (s < d) (s, d) else (d, s)
    }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, v) => n -> v.map(_._2).toSet }
    val undSet = und.toSet
    val cand = adj.toSeq.filter(_._2.size <= cap).flatMap { case (c, nbrs) =>
      nbrs.toSeq.sorted.combinations(2).map { case Seq(x, y) =>
        ((x, y), 1.0 / math.log(adj(c).size.toDouble))
      }
    }
    cand.groupBy(_._1).toSeq
      .collect { case ((x, y), terms) if !undSet.contains((x, y)) =>
        val aa = BigDecimal(terms.map(_._2).sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (x, y, terms.size.toLong, aa)
      }
      .sortBy { case (x, y, cn, aa) => (-cn, -aa, x, y) }
  }

  test("square with one diagonal: the other diagonal is the top candidate") {
    // Cycle a-b-c-d plus diagonal a-c: candidate {b,d} has common
    // neighbors a (deg 3) and c (deg 3); adjacent pairs are excluded.
    val got = top(edges(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c")))
    val aa = BigDecimal(2.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(("b", "d", 2L, aa)))
  }

  test("already-adjacent pairs never appear") {
    val got = top(edges(("a", "b"), ("b", "c"), ("a", "c")))
    assert(got.isEmpty) // every 2-hop pair is also an edge
  }

  test("center-degree cap removes hub-mediated pairs only") {
    // Hub h connects l1..l5 (deg 5); side chain l1-m-l2 (m deg 2).
    // {h,m} is mediated by l1 AND l2 (both deg 2); leaf pairs only by h.
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val g = edges((1 to 5).map(i => (s"l$i", "h")) ++
      Seq(("l1", "m"), ("m", "l2")): _*)
    val capped = top(g, cap = 4) // hub excluded as a CENTER
    assert(capped.toSeq == Seq(
      ("h", "m", 2L, r6(2.0 / math.log(2.0))),
      ("l1", "l2", 1L, r6(1.0 / math.log(2.0)))))
    val full = top(g, cap = 64)
    // hub admitted: l1-l2 gains h as a second mediator; the other
    // C(5,2)-1 = 9 leaf pairs appear with one
    assert(full.length == 11)
    assert(full(0) == (("h", "m", 2L, r6(2.0 / math.log(2.0)))))
    assert(full(1) == (("l1", "l2", 2L,
      r6(1.0 / math.log(5.0) + 1.0 / math.log(2.0)))))
  }

  test("raising the center cap never loses evidence: counts are monotone") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 100).map(_ =>
      (s"n${rnd.nextInt(18)}", s"n${rnd.nextInt(18)}"))
    val e = edges(rows: _*)
    // compare FULL candidate maps (k large enough to keep everything)
    def all(cap: Long) = top(e, 10000, cap)
      .map(t => (t._1, t._2) -> t._3).toMap
    val caps = Seq(2L, 4L, 8L, 64L).map(all)
    caps.sliding(2).foreach { case Seq(lo, hi) =>
      lo.foreach { case (pair, cn) =>
        assert(hi.getOrElse(pair, 0L) >= cn, s"pair $pair lost evidence")
      }
    }
  }

  test("random graphs match brute force (both cap regimes)") {
    val rnd = new scala.util.Random(29)
    (0 until 3).foreach { _ =>
      val rows = (0 until 90).map(_ =>
        (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      Seq(3L, 64L).foreach { cap =>
        val want = brute(rows, cap).take(20)
        assert(top(edges(rows: _*), 20, cap).toSeq == want,
          s"cap=$cap")
      }
    }
  }

  test("weighted: bottleneck strength ranks a strongly-wired pair above " +
      "a weakly-wired one with more mediators") {
    import spark.implicits._
    // Pair {x,y} wired through ONE strong center s (both edges weight
    // 10 -> min 10); pair {u,v} through TWO weak centers w1, w2 (all
    // edges weight 1 -> Σ min = 2). Unweighted CN would rank {u,v}
    // first (2 > 1); the weighted rank inverts.
    val e = Seq(
      ("x", "s", 10.0), ("s", "y", 10.0),
      ("u", "w1", 1.0), ("w1", "v", 1.0),
      ("u", "w2", 1.0), ("w2", "v", 1.0)).toDF("src", "dst", "weight")
    val got = LinkPredict.topCandidatesWeighted(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.head == (("x", "y", 1L, 10.0)))
    assert(got(1) == (("u", "v", 2L, 2.0)))
    // unweighted operator on the same graph ranks the pairs the other
    // way — the two scores answer different questions
    val unw = LinkPredict.topCandidates(e).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(unw.head == (("u", "v")))
  }

  test("weighted: same candidate set and counts as unweighted (the cap " +
      "and adjacency exclusion are topological), strength >= count " +
      "under unit weights") {
    val rnd = new scala.util.Random(47)
    val rows = (0 until 80).map(_ =>
      (s"n${rnd.nextInt(16)}", s"n${rnd.nextInt(16)}"))
    val e = edges(rows: _*) // all weights 1.0
    // k large enough to keep every candidate: the two operators rank
    // differently but must emit the SAME (src, dst, count) set — the
    // pair space is a function of topology only
    val unw = top(e, k = 10000).map(t => (t._1, t._2, t._3)).toSet
    val w = LinkPredict.topCandidatesWeighted(e, k = 10000).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(w.map(t => (t._1, t._2, t._3)).toSet == unw)
    // unit weights, but parallel/reversed duplicates SUM into the
    // collapsed edge strength, so each mediator's min is >= 1 unit
    assert(w.forall(t => t._4 >= t._3.toDouble),
      "strength below count under unit weights — min() lost mass")
    // adjacency exclusion holds
    val undSet = rows.collect { case (s, d) if s != d =>
      if (s < d) (s, d) else (d, s) }.toSet
    assert(w.forall(t => !undSet.contains((t._1, t._2))))
  }
}
