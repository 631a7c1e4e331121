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
}
