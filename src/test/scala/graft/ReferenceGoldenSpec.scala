package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.Topics

/** End-to-end parity against the real reference dataset: the node CSV
  * (`/root/reference/data/nodes_elab.csv`, 23,263 rows) replayed through
  * the engine's scan + topic listing, diffed against the reference's own
  * golden output (`outputs/node_topics.txt/part-00000`, 20 labels —
  * produced by reference `src/list_topics.py:17-19`). The edge CSV is a
  * missing blob upstream, so node-side parity is the strongest full-data
  * replay available (BASELINE.md "Golden correctness anchors").
  *
  * Skips cleanly when the reference checkout is absent (e.g. CI without
  * the read-only mount).
  */
class ReferenceGoldenSpec extends SparkSuite {

  private val nodesCsv = "/root/reference/data/nodes_elab.csv"
  private val goldenTopics = "/root/reference/outputs/node_topics.txt/part-00000"

  test("readNodesCsv replays the full reference node CSV") {
    assume(Files.exists(Paths.get(nodesCsv)))
    val nodes = GraphIO.readNodesCsv(spark, nodesCsv)
    assert(nodes.columns.toSeq == Seq("id", "names", "size", "label", "rho"))
    assert(nodes.count() == 23263L) // 23,264 lines incl. header
    // Multi-labels survive as opaque whole strings (SURVEY §2 note F).
    assert(nodes.filter(nodes("label") === "gene:protein").count() == 10379L)
  }

  test("Topics.list matches the reference's golden node_topics output") {
    assume(Files.exists(Paths.get(nodesCsv)) &&
      Files.exists(Paths.get(goldenTopics)))
    val nodes = GraphIO.readNodesCsv(spark, nodesCsv)
    val got = Topics.list(nodes).collect().map(_.getString(0)).toSet
    val want = Files.readAllLines(Paths.get(goldenTopics)).asScala
      .map(_.trim).filter(_.nonEmpty).toSet
    assert(want.size == 20)
    assert(got == want)
  }
}
