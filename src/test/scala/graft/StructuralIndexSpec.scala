package graft

import graft.operators.{KCore, LabelProp, LinkPredict, StructuralIndex,
  Triangles}
import org.apache.spark.sql.functions.col

/** The persisted structural projection must be a drop-in for the
  * recomputed one: every `*On` entry point over a written-and-read-back
  * index returns EXACTLY the from-scratch operator's rows — the same
  * bit-equality contract the `*_indexed` gates prove against the
  * shared DuckDB oracles. */
class StructuralIndexSpec extends SparkSuite {

  private def edges(rows: (String, String)*) = {
    import spark.implicits._
    rows.map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "weight")
  }

  // two triangles sharing an edge, a pendant, a duplicate + a reversed
  // duplicate + a self-loop (the projection must collapse all three)
  private val g = edges(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"),
    ("d", "c"), ("e", "a"), ("b", "a"), ("a", "b"), ("c", "c"))

  private def idxDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-structidx-$name").toString
    StructuralIndex.write(g, d)
    d
  }

  test("write persists the canonical projection; read round-trips it") {
    val dir = idxDir("rt")
    val und = StructuralIndex.undirected(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(und == Set(("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"),
      ("c", "d"), ("a", "e")))
    val deg = StructuralIndex.degrees(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deg == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 2L, "e" -> 1L))
    // the stored edge set carries micro-unit strengths: (a,b) absorbed
    // a parallel + a reversed duplicate (3 × 1.0 → 3e6), others 1e6
    val undW = StructuralIndex.undirectedWeighted(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(undW(("a", "b")) == 3000000L)
    assert(undW(("c", "d")) == 1000000L)
    // the degree table carries BOTH aggregates: strengths (micro-unit
    // weighted degrees) next to counts, each reader pruning the other
    val wdeg = StructuralIndex.weightedDegrees(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wdeg == Map("a" -> 5000000L, "b" -> 5000000L, "c" -> 3000000L,
      "d" -> 2000000L, "e" -> 1000000L))
    // the weighted ops read the same index bit-equal to from-scratch
    val direct = graft.operators.KCore.runWeighted(g, 2.0)
      .orderBy(col("id")).collect().toSeq
    val viaIdx = graft.operators.KCore.runWeightedOn(
        StructuralIndex.undirectedWeighted(spark, dir), 2.0)
      .orderBy(col("id")).collect().toSeq
    assert(viaIdx == direct)
    // and the stored-strengths round-0 fast path is bit-equal too
    val viaPre = graft.operators.KCore.runWeightedPreDegreed(
        StructuralIndex.undirectedWeighted(spark, dir),
        StructuralIndex.weightedDegrees(spark, dir), 2.0)
      .orderBy(col("id")).collect().toSeq
    assert(viaPre == direct)
  }

  test("unweighted reader prunes the weight column at the parquet scan") {
    val dir = idxDir("prune")
    val plan = StructuralIndex.undirected(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("wt"),
      s"weight column not pruned from the unweighted scan:\n$plan")
    val weighted = StructuralIndex.undirectedWeighted(spark, dir)
      .queryExecution.executedPlan.toString
    assert(weighted.contains("wt"), weighted)
    // same discipline on the degree table: the count reader prunes the
    // strength column and vice versa
    val degPlan = StructuralIndex.degrees(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!degPlan.contains("wd"),
      s"strength column not pruned from the degree scan:\n$degPlan")
    val wdegPlan = StructuralIndex.weightedDegrees(spark, dir)
      .queryExecution.executedPlan.toString
    assert(wdegPlan.contains("wd") && !wdegPlan.contains("deg,"),
      wdegPlan)
  }

  test("perNodeOn over the index equals perNode from scratch") {
    val dir = idxDir("tri")
    val direct = Triangles.perNode(g).orderBy(col("id")).collect().toSeq
    val indexed = Triangles.perNodeOn(StructuralIndex.undirected(spark, dir),
      StructuralIndex.degrees(spark, dir)).orderBy(col("id")).collect().toSeq
    assert(indexed == direct)
  }

  test("topCandidatesOn over the index equals topCandidates from scratch") {
    val dir = idxDir("lp")
    val direct = LinkPredict.topCandidates(g, k = 10).collect().toSeq
    val indexed = LinkPredict.topCandidatesOn(
      StructuralIndex.undirected(spark, dir),
      StructuralIndex.degrees(spark, dir), k = 10).collect().toSeq
    assert(indexed == direct)
  }

  test("runOn (k-core) over the index equals run from scratch") {
    val dir = idxDir("kc")
    val direct = KCore.run(g, 2).orderBy(col("id")).collect().toSeq
    val indexed = KCore.runOn(StructuralIndex.undirected(spark, dir), 2)
      .orderBy(col("id")).collect().toSeq
    assert(indexed == direct)
    assert(direct.map(_.getString(0)).toSet == Set("a", "b", "c", "d"))
    // the fast path — stored degrees as round 0, stable-scan input —
    // is bit-equal too (the graph_kcore_indexed gate's actual shape)
    val pre = KCore.runPreDegreed(StructuralIndex.undirected(spark, dir),
        StructuralIndex.degrees(spark, dir), 2)
      .orderBy(col("id")).collect().toSeq
    assert(pre == direct)
    // also at a threshold where round 0 peels nothing (k = 1: the
    // projection has no isolated endpoints, so the first pass must
    // certify convergence straight off the stored degrees)
    val pre1 = KCore.runPreDegreed(StructuralIndex.undirected(spark, dir),
        StructuralIndex.degrees(spark, dir), 1)
      .orderBy(col("id")).collect().toSeq
    val direct1 = KCore.run(g, 1).orderBy(col("id")).collect().toSeq
    assert(pre1 == direct1)
  }

  test("topCandidatesWeightedOn over the index equals from scratch") {
    val dir = idxDir("lpw")
    val direct = LinkPredict.topCandidatesWeighted(g, k = 10)
      .collect().toSeq
    val indexed = LinkPredict.topCandidatesWeightedOn(
      StructuralIndex.undirectedWeighted(spark, dir),
      StructuralIndex.degrees(spark, dir), k = 10).collect().toSeq
    assert(indexed == direct)
  }

  test("a fresh catalog re-attaches the persisted index (cross-JVM " +
      "lifecycle): dropping the session tables must not lose the index") {
    val dir = idxDir("reattach")
    val before = StructuralIndex.degrees(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // simulate a new JVM: the catalog forgets the tables, the files
    // and the persisted bucket count remain
    spark.catalog.listTables().collect()
      .filter(_.name.contains("reattach"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    val after = StructuralIndex.degrees(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)
    // and the re-registered table still carries the bucketed layout
    val tbl = spark.catalog.listTables().collect()
      .map(_.name).filter(t => t.contains("reattach") && t.endsWith("_deg"))
    assert(tbl.nonEmpty)
    val ddl = spark.sql(s"SHOW CREATE TABLE ${tbl.head}")
      .head().getString(0)
    assert(ddl.toLowerCase.contains("clustered by"), ddl)
  }

  test("runOn (label prop) over the index equals run from scratch") {
    import spark.implicits._
    val dir = idxDir("lab")
    val seeds = Seq(("a", "x"), ("d", "y")).toDF("id", "label")
    val direct = LabelProp.run(spark, g, seeds, 2)
      .orderBy(col("id")).collect().toSeq
    val indexed = LabelProp.runOn(spark,
        StructuralIndex.undirected(spark, dir), seeds, 2)
      .orderBy(col("id")).collect().toSeq
    assert(indexed == direct)
  }
}
