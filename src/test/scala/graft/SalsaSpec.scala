package graft

import graft.operators.Salsa
import org.apache.spark.sql.functions._

class SalsaSpec extends SparkSuite {

  /** G2: u1→v1, u1→v2, u2→v1, u3→v1. */
  private def g2 = graph(Seq(("u1", "v1", 1.0), ("u1", "v2", 1.0),
    ("u2", "v1", 1.0), ("u3", "v1", 1.0)))

  test("G2 simplified SALSA = degree/Σdegree exactly") {
    val r = Salsa.runSimplified(g2.edges)
    assertApprox(scoresMap(r.hubs),
      Map("u1" -> 0.5, "u2" -> 0.25, "u3" -> 0.25), 1e-15)
    assertApprox(scoresMap(r.auths),
      Map("v1" -> 0.75, "v2" -> 0.25), 1e-15)
    // min score = 1/|E| — the invariant that recovered the reference's
    // edge count (BASELINE.md).
    assert(scoresMap(r.hubs).values.min == 0.25)
  }

  test("G5 weighted simplified SALSA") {
    val g = graph(Seq(("u1", "v1", 2.0), ("u1", "v2", 1.0),
      ("u2", "v1", 1.0), ("u3", "v1", 4.0)))
    val r = Salsa.runWeightedSimplified(g.edges)
    assertApprox(scoresMap(r.hubs),
      Map("u1" -> 3.0 / 8, "u2" -> 1.0 / 8, "u3" -> 4.0 / 8), 1e-15)
    assertApprox(scoresMap(r.auths),
      Map("v1" -> 7.0 / 8, "v2" -> 1.0 / 8), 1e-15)
  }

  test("iterative SALSA is L1-normalized each iteration and " +
      "rank-agrees with simplified on a bipartite graph") {
    val r = Salsa.run(g2, numIter = 8)
    Seq(r.hubs, r.auths).foreach { v =>
      val s = v.agg(sum(col("score"))).head.getDouble(0)
      assert(math.abs(s - 1.0) < 1e-12)
    }
    // reference claims rank-equivalence to simplified SALSA
    // (`src/base_salsa_2.py:1-2`)
    val hubs = scoresMap(r.hubs)
    assert(hubs("u1") > hubs("u2") && math.abs(hubs("u2") - hubs("u3")) < 1e-12)
  }

  test("topic-specific SALSA: non-topic nodes start at zero") {
    val labels = Map("u1" -> "t", "u2" -> "x", "u3" -> "x",
      "v1" -> "t", "v2" -> "x")
    val g = graph(Seq(("u1", "v1", 1.0), ("u1", "v2", 1.0),
      ("u2", "v1", 1.0), ("u3", "v1", 1.0)), labels)
    val r = Salsa.runTopicSpecific(g, "t", 0.8, 1)
    // hub update: score(a) = Σ auth(dst)/indeg(dst); only v1 had nonzero
    // init (1/(2*2)); u1,u2,u3 all point at v1 → all get mass; then
    // topic teleport boosts u1 only.
    val hubs = scoresMap(r.hubs)
    assert(hubs("u1") > hubs("u2"))
    assert(math.abs(hubs("u2") - hubs("u3")) < 1e-15)
  }

  test("teleport SALSA keeps L1 norm 1 and boosts uniformly") {
    val r = Salsa.runTeleport(g2, 0.8, 4)
    val s = r.hubs.agg(sum(col("score"))).head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-12)
  }

  test("runConverged stops early and matches the fixed-iteration kernel " +
      "at the same depth") {
    val fp = Salsa.runConverged(g2, tol = 1e-9, maxIter = 40)
    val (r, iters) = (fp.result, fp.iterations)
    assert(iters < 40 && fp.converged)
    val fixed = Salsa.run(g2, numIter = iters)
    assertApprox(scoresMap(r.auths), scoresMap(fixed.auths), 1e-12)
    assertApprox(scoresMap(r.hubs), scoresMap(fixed.hubs), 1e-12)
    // converged vectors are L1-normalized
    Seq(r.hubs, r.auths).foreach { v =>
      val s = v.agg(sum(col("score"))).head.getDouble(0)
      assert(math.abs(s - 1.0) < 1e-12)
    }
  }

  test("runConverged on an empty graph converges immediately, no crash") {
    val fp = Salsa.runConverged(graph(Seq.empty), maxIter = 5)
    assert(fp.result.hubs.count() == 0L && fp.result.auths.count() == 0L)
    assert(fp.iterations <= 3 && fp.converged)
  }
}
