package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking output operators (SURVEY.md §2.5): global sort, top-k, seeded
  * samples, score rescaling, and the reference's tuple-text single-file
  * sink (reference `src/base_hits.py:66-79`). */
object RankOutput {

  /** Global descending sort with a deterministic id tiebreak. The
    * reference's `sortBy(score, ascending=False)` leaves tie order
    * partition-dependent; the tiebreak makes output reproducible without
    * changing the ranking. */
  def ranked(scores: DataFrame): DataFrame =
    scores.orderBy(desc("score"), asc("id"))

  /** True top-k: `orderBy(desc).limit(k)` plans as TakeOrderedAndProject —
    * per-partition heaps + driver merge, no global sort shuffle (the
    * reference pays a full `sortBy` before `take(k)`,
    * `src/base_hits.py:66,74`). */
  def topK(scores: DataFrame, k: Int): DataFrame =
    scores.orderBy(desc("score"), asc("id")).limit(k)

  /** Seeded Bernoulli sample, identical semantics to the reference's
    * `sample(False, fraction, 81)` (`src/base_hits.py:78-79`). */
  def sample(df: DataFrame, fraction: Double, seed: Long = 81L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Display rescale (reference `src/base_salsa.py:52-53`). */
  def rescale(scores: DataFrame, factor: Double): DataFrame =
    scores.select(col("id"), (col("score") * lit(factor)).as("score"))

  /** The reference's text-sink row format: `('id', score)` Python-tuple
    * strings (reference `src/base_hits.py:70-71`). */
  def tupleText(scores: DataFrame): DataFrame =
    scores.select(concat(lit("('"), col("id"), lit("', "),
      col("score").cast("string"), lit(")")).as("value"))

  /** Single-file text sink, sorted desc — the reference's output layout.
    * `coalesce(1)` is a narrow repartition exactly as the reference's
    * `coalesce(1, False)`. */
  def writeScoresText(scores: DataFrame, dir: String): Unit =
    tupleText(ranked(scores)).coalesce(1)
      .write.mode("overwrite").text(dir)

  /** GraphViz/DOT text export — the engine-side replacement for the
    * reference's driver-side networkx PNG rendering (reference
    * `src/draw_graphs.py:77-89`): same inputs (sampled edges + top-k
    * scores for node sizing), emitted as a text sink any DOT renderer
    * consumes. Node size attribute ∝ score like the reference's
    * `node_size` scaling. */
  def dotLines(edges: DataFrame, scores: DataFrame, k: Int = 50): DataFrame = {
    val top = topK(scores, k)
    val nodeLines = top.select(
      concat(lit("  \""), col("id"), lit("\" [width="),
        format_number(col("score") * 20, 4), lit("];")).as("line"),
      lit(1).as("ord"))
    val keep = top.select(col("id"))
    val edgeLines = edges
      .join(keep, edges("src") === keep("id"), "left_semi")
      .select(concat(lit("  \""), col("src"), lit("\" -> \""), col("dst"),
        lit("\";")).as("line"), lit(2).as("ord"))
    import edges.sparkSession.implicits._
    // Explicit section ordering: union partition order is not the
    // logical order once children collapse partitions (e.g. top-k).
    Seq(("digraph G {", 0)).toDF("line", "ord")
      .unionAll(nodeLines).unionAll(edgeLines)
      .unionAll(Seq(("}", 3)).toDF("line", "ord"))
      .orderBy(col("ord"), col("line"))
      .select(col("line"))
  }

  def writeDot(edges: DataFrame, scores: DataFrame, dir: String,
      k: Int = 50): Unit =
    dotLines(edges, scores, k).coalesce(1).write.mode("overwrite").text(dir)
}
