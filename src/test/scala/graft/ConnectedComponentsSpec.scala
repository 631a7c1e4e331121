package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSuite {

  private def pairs(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("a", "b")
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

  test("clusters view: canonical keep id and member counts") {
    val got = ConnectedComponents.clusters(
        pairs((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (8L, 10L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (5L, 5L, 2L), (6L, 5L, 2L),
      (8L, 8L, 3L), (9L, 8L, 3L), (10L, 8L, 3L)))
  }
}
