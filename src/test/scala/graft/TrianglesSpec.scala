package graft

import graft.operators.Triangles

class TrianglesSpec extends SparkSuite {

  private def edges(rows: (String, String)*) = {
    import spark.implicits._
    rows.map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "weight")
  }

  private def result(df: org.apache.spark.sql.DataFrame) =
    Triangles.perNode(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  /** Reference implementation: brute-force triangle enumeration over the
    * collected undirected simple edge set. */
  private def brute(rows: Seq[(String, String)])
      : Map[String, (Long, Double)] = {
    val und = rows.collect { case (s, d) if s != d =>
      if (s < d) (s, d) else (d, s)
    }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    nodes.map { n =>
      val nbrs = adj(n)
      val t = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      val d = nbrs.size
      val cc = if (d >= 2) BigDecimal(2.0 * t / (d.toDouble * (d - 1)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
      n -> ((t.toLong, cc))
    }.toMap
  }

  test("K4: every node in 3 triangles, clustering 1.0") {
    val k4 = for {
      Seq(a, b) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (a, b)
    val got = result(edges(k4: _*))
    assert(got == Map("a" -> ((3L, 1.0)), "b" -> ((3L, 1.0)),
      "c" -> ((3L, 1.0)), "d" -> ((3L, 1.0))))
  }

  test("triangle-free path: zero counts, zero clustering, all nodes kept") {
    val got = result(edges(("a", "b"), ("b", "c"), ("c", "d")))
    assert(got == Map("a" -> ((0L, 0.0)), "b" -> ((0L, 0.0)),
      "c" -> ((0L, 0.0)), "d" -> ((0L, 0.0))))
  }

  test("self-loops, parallel and reversed duplicates do not change counts") {
    val clean = result(edges(("a", "b"), ("b", "c"), ("a", "c")))
    val noisy = result(edges(("a", "b"), ("b", "a"), ("a", "b"),
      ("b", "c"), ("a", "c"), ("c", "a"), ("a", "a"), ("b", "b")))
    assert(clean == Map("a" -> ((1L, 1.0)), "b" -> ((1L, 1.0)),
      "c" -> ((1L, 1.0))))
    assert(noisy == clean)
  }

  test("hub star plus one rim edge: only the closed wedge counts") {
    // Hub h fans out to 6 leaves; a single rim edge closes one triangle.
    // The degree orientation sends every spoke leaf->hub, so the hub
    // emits NO wedges — the skew defense the operator exists for.
    val spokes = (1 to 6).map(i => (s"l$i", "h"))
    val got = result(edges(spokes :+ (("l1", "l2")): _*))
    assert(got("h") == ((1L, BigDecimal(2.0 / 30)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("l1") == ((1L, 1.0)) && got("l2") == ((1L, 1.0)))
    assert((3 to 6).forall(i => got(s"l$i") == ((0L, 0.0))))
  }

  test("random graphs match brute-force enumeration") {
    val rnd = new scala.util.Random(17)
    (0 until 3).foreach { _ =>
      val rows = (0 until 120).map(_ =>
        (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
      assert(result(edges(rows: _*)) == brute(rows))
    }
  }

  test("triangle total is invariant to input partitioning") {
    val rows = (0 until 80).map { i =>
      (s"n${i % 13}", s"n${(i * 7 + 3) % 13}")
    }
    val base = result(edges(rows: _*))
    val repart = result(edges(rows: _*).repartition(7))
    assert(repart == base)
  }

  test("approxCount: p=1000 degenerates to the exact count; sampled " +
      "estimate lands within the DOULION variance band on K20") {
    import spark.implicits._
    // complete graph on 20 nodes: C(20,3) = 1140 triangles
    val k20 = (for {
      Seq(a, b) <- (0 until 20).map(i => f"n$i%02d").combinations(2).toSeq
    } yield (a, b, 1.0)).toDF("src", "dst", "weight")
    val exactRow = Triangles.approxCount(k20, pPermille = 1000).head()
    assert(exactRow.getLong(1) == 190L)   // all edges survive
    assert(exactRow.getLong(2) == 1140L)  // the exact count
    assert(exactRow.getDouble(3) == 1140.0)
    // half-sample: estimator is unbiased with relative sd
    // ~sqrt(1/p^3 / T) ≈ 8%; assert a generous ±50% band so the test
    // checks the SCALING, not the coin flips of one seed
    val half = Triangles.approxCount(k20, pPermille = 500).head()
    assert(half.getLong(1) < 190L, "half-sample kept every edge")
    val est = half.getDouble(3)
    assert(est > 1140 * 0.5 && est < 1140 * 1.5,
      s"estimate $est implausible for true 1140")
    // determinism: the hash gate makes repeated runs identical
    assert(Triangles.approxCount(k20, pPermille = 500).head() == half)
    // derived default (pPermille <= 0): K20's 190 edges sit far below
    // baseEdges, so the derivation picks p = 1000 — the exact count
    val derived = Triangles.approxCount(k20).head()
    assert(derived.getInt(0) == 1000)
    assert(derived == exactRow)
  }

  test("autoPPermille: p halves per 8x edge growth past baseEdges, " +
      "clamped to [1, 1000] — expected sampled triangles stay put") {
    import graft.operators.Triangles.autoPPermille
    assert(autoPPermille(11259) == 1000)   // sf0.001: at/below base
    assert(autoPPermille(16384) == 1000)   // boundary inclusive
    assert(autoPPermille(16385) == 500)    // first threshold passed
    assert(autoPPermille(119383) == 500)   // sf0.01
    assert(autoPPermille(1201843) == 125)  // sf0.1: three thresholds
    assert(autoPPermille(Long.MaxValue / 2) == 1) // floor, never 0
    // the invariant the rule encodes: m·p³ roughly constant — one 8×
    // growth step multiplies m by 8 and divides p³ by 8
    val m0 = 20000L
    val p0 = autoPPermille(m0)
    val p1 = autoPPermille(m0 * 8)
    assert(p1 * 2 == p0)
  }

  test("weighted strength: counts match perNode; strength matches " +
      "brute-force sums; parallel/reversed weights combine") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 120).map(_ =>
      (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}",
        math.rint(rnd.nextDouble() * 1000) / 100.0)) // 2-decimal weights
    val df = rows.toDF("src", "dst", "weight")
    val got = Triangles.perNodeWeighted(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // counts must equal the unweighted operator's (identical topology)
    val counts = Triangles.perNode(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap == counts)
    // brute force: collapsed undirected weights (sum both directions +
    // parallels), then per-node sums of the three edge weights over
    // every triangle containing the node
    val undW = rows.collect { case (s, d, w) if s != d =>
      (if (s < d) (s, d) else (d, s)) -> math.round(w * 1e6)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val adj = (undW.keys.toSeq ++ undW.keys.toSeq.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def w(x: String, y: String) = undW(if (x < y) (x, y) else (y, x))
    val expected = adj.keys.map { n =>
      val tris = adj(n).toSeq.sorted.combinations(2).collect {
        case Seq(x, y) if adj(x).contains(y) => w(n, x) + w(n, y) + w(x, y)
      }.toSeq
      n -> ((tris.size.toLong, BigDecimal(tris.sum) / BigDecimal(1000000)))
    }.toMap
    expected.foreach { case (n, (t, s)) =>
      assert(got(n)._1 == t, s"count mismatch at $n")
      assert(math.abs(got(n)._2 - s.toDouble) < 1e-6,
        s"strength mismatch at $n: ${got(n)._2} vs $s")
    }
  }
}
