package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Closed-form PageRank checks on micro-graphs (same fixtures style as
  * HitsSpec). */
class PageRankSpec extends SparkSuite {

  /** a→b, b→a: symmetric 2-cycle — uniform is the fixed point. */
  test("2-cycle fixed point stays uniform at any damping") {
    val g = graph(Seq(("a", "b", 1.0), ("b", "a", 1.0)))
    val p = scoresMap(PageRank.run(g, damping = 0.85, numIter = 8))
    assertApprox(p, Map("a" -> 0.5, "b" -> 0.5))
  }

  test("one iteration closed form with a dangling node") {
    // a→b, a→c, b→c; c dangles (its mass leaks, per the documented
    // simplification). Init 1/3 each, d = 0.5:
    // p(a) = (1-d)/3                      = 1/6
    // p(b) = (1-d)/3 + d*(1/3)/2          = 1/6 + 1/12 = 0.25
    // p(c) = (1-d)/3 + d*((1/3)/2 + 1/3)  = 1/6 + 1/4  = 5/12
    val g = graph(Seq(("a", "b", 1.0), ("a", "c", 1.0), ("b", "c", 1.0)))
    val p = scoresMap(PageRank.run(g, damping = 0.5, numIter = 1))
    assertApprox(p, Map("a" -> 1.0 / 6, "b" -> 0.25, "c" -> 5.0 / 12))
  }

  test("every node keeps the (1-d)/N floor and ranks follow in-links") {
    val g = graph(Seq(("a", "c", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)))
    val p = scoresMap(PageRank.run(g, numIter = 8))
    assert(p.keySet == Set("a", "b", "c", "d")) // no dropout
    val floor = (1.0 - 0.85) / 4
    assert(p.values.forall(_ >= floor - 1e-12))
    assert(p("c") > p("a") && p("d") > p("a")) // in-linked beat sources
  }

  test("runPersonalized: teleport mass concentrates on the seed set") {
    // a,b labeled t (seeds); c unlabeled. a→c, b→c, c→a. d = 0.5,
    // seeds get t = 1/2 each, c gets 0. p0 = (1/2, 1/2, 0).
    // iter 1: p(a) = 0.5*0.5 + 0.5*(p0(c)/1) = 0.25
    //         p(b) = 0.25
    //         p(c) = 0      + 0.5*(p0(a)/1 + p0(b)/1) = 0.5
    val g = graph(Seq(("a", "c", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)),
      Map("a" -> "t", "b" -> "t", "c" -> "other"))
    val p1 = scoresMap(PageRank.runPersonalized(g, "t", damping = 0.5,
      numIter = 1))
    assertApprox(p1, Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.5))
    // Deep run: non-seed, non-reachable mass decays to exactly 0 —
    // teleport never revives a node outside the seed-reachable set.
    val g2 = graph(Seq(("a", "b", 1.0), ("x", "y", 1.0)),
      Map("a" -> "t", "b" -> "other", "x" -> "other", "y" -> "other"))
    val p2 = scoresMap(PageRank.runPersonalized(g2, "t", numIter = 8))
    assert(p2("x") == 0.0 && p2("y") == 0.0)
    assert(p2("a") > 0.0 && p2("b") > 0.0)
  }

  test("runConverged stops early and matches the fixed-iteration kernel " +
      "at the same depth") {
    // 2-cycle: uniform init IS the fixed point — converges on the
    // second iteration (the first delta compares against init).
    val g = graph(Seq(("a", "b", 1.0), ("b", "a", 1.0)))
    // checkEvery=1/firstCheck=1 reproduces the per-iteration check;
    // the default batched schedule is covered separately below.
    val fp = PageRank.runConverged(g, tol = 1e-9, maxIter = 40,
      checkEvery = 1, firstCheck = 1)
    val (p, iters) = (fp.result, fp.iterations)
    assert(iters <= 2, s"2-cycle took $iters iterations")
    assert(fp.converged, "early stop must report converged = true")
    assertApprox(scoresMap(p), Map("a" -> 0.5, "b" -> 0.5))
    // a structured graph: converged result == fixed run at that depth.
    // Micro-graphs contract at the damping rate (~d^k — no dangling
    // leak to speed it up), so use d=0.5 to keep the loop short.
    val g2 = graph(Seq(("a", "c", 1.0), ("b", "c", 1.0), ("c", "d", 1.0),
      ("d", "a", 1.0)))
    val fp2 = PageRank.runConverged(g2, damping = 0.5,
      tol = 1e-9, maxIter = 60)
    val (p2, it2) = (fp2.result, fp2.iterations)
    assert(it2 < 60 && fp2.converged)
    assertApprox(scoresMap(p2),
      scoresMap(PageRank.run(g2, damping = 0.5, numIter = it2)), 1e-12)
  }

  test("runConverged on an empty graph converges immediately, no crash") {
    val fp = PageRank.runConverged(graph(Seq.empty), maxIter = 5)
    assert(fp.result.count() == 0L)
    assert(fp.iterations <= 3) // first scheduled check (default firstCheck=3)
    assert(fp.converged)
  }

  test("batched delta checks stop on the schedule and report actual N") {
    // The 2-cycle's fixed point is reached at iteration 2, but with the
    // default schedule the first check runs at iteration 3 — the kernel
    // overruns by one no-op refinement, reports 3, and the vector still
    // equals the fixed-iteration kernel at that depth.
    val g = graph(Seq(("a", "b", 1.0), ("b", "a", 1.0)))
    val fp = PageRank.runConverged(g, tol = 1e-9, maxIter = 40)
    val (p, iters) = (fp.result, fp.iterations)
    assert(iters == 3, s"expected the first scheduled check, got $iters")
    assertApprox(scoresMap(p), Map("a" -> 0.5, "b" -> 0.5))
    // a misaligned schedule overruns by < checkEvery, never more
    val fp5 = PageRank.runConverged(g, tol = 1e-9, maxIter = 40,
      checkEvery = 5, firstCheck = 4)
    val (p5, it5) = (fp5.result, fp5.iterations)
    assert(it5 == 4, s"expected the firstCheck iteration, got $it5")
    assertApprox(scoresMap(p5),
      scoresMap(PageRank.run(g, numIter = it5)), 1e-12)
    // a cap too tight for the contraction rate must SAY un-converged
    // (not leave callers comparing the count against the cap)
    val gSlow = graph(Seq(("a", "c", 1.0), ("b", "c", 1.0),
      ("c", "d", 1.0), ("d", "a", 1.0)))
    val capped = PageRank.runConverged(gSlow, damping = 0.99,
      tol = 1e-15, maxIter = 4, checkEvery = 1, firstCheck = 1)
    assert(capped.iterations == 4 && !capped.converged,
      "expected a capped, un-converged run; got " +
        s"(${capped.iterations}, ${capped.converged})")
  }
}
