package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSuite {

  private def pairs(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("a", "b")
  }

  test("empty candidate set yields empty clusters, no crash") {
    // A clean corpus produces zero near-dup pairs — both engines must
    // return an empty (not null-summing) result.
    val none = pairs()
    assert(ConnectedComponents.run(none).count() == 0L)
    assert(ConnectedComponents.runStar(none).count() == 0L)
    assert(ConnectedComponents.clusters(none).count() == 0L)
  }

  test("two disjoint components resolve to their minimum ids") {
    val comp = ConnectedComponents.run(pairs((1L, 2L), (2L, 3L), (5L, 6L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("long chain needs multiple propagation rounds and still converges") {
    // Path 9-7-5-3-1 given worst-case (far end first): min label 1 must
    // travel 4 hops.
    val comp = ConnectedComponents.run(pairs((7L, 9L), (5L, 7L), (3L, 5L), (1L, 3L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L))
  }

  test("runStar matches run on random graphs (incl. singleton self-pairs)") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { _ =>
      val es = (0 until 60).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)) :+ (99L, 99L)
      val p = pairs(es: _*)
      val want = ConnectedComponents.run(p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = ConnectedComponents.runStar(p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
      assert(got(99L) == 99L) // self-pair singleton survives
    }
  }

  test("runStar converges in O(log d) rounds on a long chain") {
    // Path of 257 nodes (diameter 256): min-label propagation needs
    // ~256 rounds; the star algorithm must stay logarithmic.
    val chain = (0 until 256).map(i => (i.toLong, i.toLong + 1))
    val (comp, rounds) = ConnectedComponents.runStarCounted(pairs(chain: _*))
    val got = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 257 && got.values.forall(_ == 0L))
    assert(rounds <= 12, s"expected O(log 256) rounds, took $rounds")
  }

  test("clustersStar equals clusters on the canonical fixture") {
    val p = pairs((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (8L, 10L))
    val a = ConnectedComponents.clusters(p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = ConnectedComponents.clustersStar(p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("clusters view: canonical keep id and member counts") {
    val got = ConnectedComponents.clusters(
        pairs((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (8L, 10L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (5L, 5L, 2L), (6L, 5L, 2L),
      (8L, 8L, 3L), (9L, 8L, 3L), (10L, 8L, 3L)))
  }

  test("componentsOn: structural view with component min ids and sizes") {
    val got = ConnectedComponents.componentsOn(
        pairs((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (8L, 10L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (5L, 5L, 2L), (6L, 5L, 2L),
      (8L, 8L, 3L), (9L, 8L, 3L), (10L, 8L, 3L)))
  }

  test("componentsWeightedOn: the strength floor fractures and shrinks " +
      "the node universe") {
    import spark.implicits._
    // Path 1-2-3-4 where only the outer edges are strong: the weak
    // middle edge splits one component into two, and node 9's sole
    // weak edge removes both 9 and nothing else from the universe.
    val undW = Seq(
      (1L, 2L, 5000000L),  // 5.0 raw
      (2L, 3L, 1000000L),  // 1.0 raw — below the floor
      (3L, 4L, 5000000L),
      (8L, 9L, 1000000L)   // both endpoints vanish
    ).toDF("a", "b", "wt")
    val got = ConnectedComponents.componentsWeightedOn(undW, 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 2L), (4L, 3L, 2L)))
    // floor at the exact edge strength keeps the edge (>= contract)
    val all = ConnectedComponents.componentsWeightedOn(undW, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(all.toSeq == Seq(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (8L, 8L, 2L), (9L, 8L, 2L)))
  }
}
