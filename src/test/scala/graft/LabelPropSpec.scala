package graft

import graft.operators.LabelProp

class LabelPropSpec extends SparkSuite {

  private def edges(rows: (String, String)*) = {
    import spark.implicits._
    rows.map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "weight")
  }

  private def seeds(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "label")
  }

  private def run(e: org.apache.spark.sql.DataFrame,
      s: org.apache.spark.sql.DataFrame, iters: Int): Map[String, String] =
    LabelProp.run(spark, e, s, iters).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap

  /** Reference implementation: synchronous clamped majority over the
    * collected undirected simple projection. */
  private def brute(rows: Seq[(String, String)],
      seed: Map[String, String], iters: Int): Map[String, String] = {
    val und = rows.collect { case (s, d) if s != d =>
      if (s < d) (s, d) else (d, s)
    }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    var lab: Map[String, String] =
      adj.keys.map(id => id -> seed.getOrElse(id, null)).toMap
    (0 until iters).foreach { _ =>
      lab = lab.map { case (id, l) =>
        if (l != null) id -> l
        else {
          val votes = adj(id).toSeq.map(lab).filter(_ != null)
            .groupBy(identity).map { case (v, o) => (v, o.size) }
          if (votes.isEmpty) id -> null
          else id -> votes.toSeq.minBy { case (v, c) => (-c, v) }._1
        }
      }
    }
    lab
  }

  test("a label walks one hop per iteration along a chain") {
    val chain = edges(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val s = seeds(("a", "L"))
    assert(run(chain, s, 0) ==
      Map("a" -> "L", "b" -> null, "c" -> null, "d" -> null, "e" -> null))
    assert(run(chain, s, 2) ==
      Map("a" -> "L", "b" -> "L", "c" -> "L", "d" -> null, "e" -> null))
    assert(run(chain, s, 4).values.forall(_ == "L"))
  }

  test("seeds are clamped: adjacent seeds keep their own labels") {
    val got = run(edges(("x", "y")), seeds(("x", "A"), ("y", "B")), 3)
    assert(got == Map("x" -> "A", "y" -> "B"))
  }

  test("majority wins; ties break to the ascending label") {
    // m has two 'A' neighbors and one 'B' neighbor -> A.
    // t has one 'A' and one 'B' neighbor -> tie -> 'A' (ascending).
    val g = edges(("a1", "m"), ("a2", "m"), ("b1", "m"),
      ("a1", "t"), ("b1", "t"))
    val got = run(g, seeds(("a1", "A"), ("a2", "A"), ("b1", "B")), 1)
    assert(got("m") == "A" && got("t") == "A")
  }

  test("disconnected unlabeled component stays unlabeled") {
    val got = run(edges(("a", "b"), ("u", "v")), seeds(("a", "L")), 5)
    assert(got == Map("a" -> "L", "b" -> "L", "u" -> null, "v" -> null))
  }

  test("the labeled set grows monotonically with iteration depth") {
    // In this semantics every assigned label freezes (coalesce keeps
    // the old value, votes only fill nulls), so coverage is monotone —
    // this pins that contract against a future "re-vote" regression.
    val rnd = new scala.util.Random(47)
    val rows = (0 until 120).map(_ =>
      (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
    val ids = rows.flatMap(t => Seq(t._1, t._2)).distinct
    val seed = ids.take(3).map(id => id -> s"L${id.length}")
    val e = edges(rows: _*); val s = seeds(seed: _*)
    val covered = (0 to 4).map(k =>
      run(e, s, k).collect { case (id, l) if l != null => id }.toSet)
    covered.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi))
    }
  }

  test("random graphs match the brute-force reference") {
    val rnd = new scala.util.Random(41)
    (0 until 3).foreach { _ =>
      val rows = (0 until 100).map(_ =>
        (s"n${rnd.nextInt(22)}", s"n${rnd.nextInt(22)}"))
      val ids = rows.flatMap(t => Seq(t._1, t._2)).distinct
      val seed = ids.filter(_ => rnd.nextBoolean() && rnd.nextBoolean())
        .map(id => id -> s"L${rnd.nextInt(3)}").toMap
      val e = edges(rows: _*)
      val s = seeds(seed.toSeq: _*)
      (0 to 3).foreach { k =>
        assert(run(e, s, k) == brute(rows, seed, k), s"iters=$k")
      }
    }
  }

  test("weighted votes: one strong neighbor outvotes two weak ones; " +
      "unit weights reproduce the unweighted result") {
    import spark.implicits._
    // u has three labeled neighbors: x (label B, weight 5.0) and
    // y, z (label A, weight 1.0 each). Unweighted majority: A (2 votes
    // to 1); weighted majority: B (5.0 to 2.0).
    val e = Seq(("u", "x", 5.0), ("u", "y", 1.0), ("u", "z", 1.0))
      .toDF("src", "dst", "weight")
    val s = seeds(("x", "B"), ("y", "A"), ("z", "A"))
    val unweighted = run(e, s, 1)
    assert(unweighted("u") == "A")
    val weighted = LabelProp.runWeighted(spark, e, s, 1).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(weighted("u") == "B",
      s"strong neighbor lost the weighted vote: $weighted")
    // unit weights on a simple graph: weighted == unweighted verbatim
    val rnd = new scala.util.Random(83)
    val rows = (0 until 90).map(_ =>
      (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct.filter { case (a, b) => a != b }
    val ids = rows.flatMap(t => Seq(t._1, t._2)).distinct
    val seed = ids.filter(_.hashCode % 3 == 0).map(id => id -> s"L${id.length}")
    val eu = edges(rows: _*)
    val su = seeds(seed: _*)
    val w = LabelProp.runWeighted(spark, eu, su, 3).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(w == run(eu, su, 3))
  }
}
