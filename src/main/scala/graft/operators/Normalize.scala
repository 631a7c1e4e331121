package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score-vector normalization (reference `src/base_hits.py:16-19` for L2,
  * `src/base_salsa.py:13-15` for L1).
  *
  * The reference collects the norm scalar to the driver every iteration
  * (an extra Spark action per vector per iteration). Here the scalar stays
  * in the plan as a broadcast 1-row cross join, so normalization adds no
  * driver round-trip and fuses into the consumer's job — the Spark-native
  * equivalent with the same numeric semantics (sum, then divide).
  *
  * `score*score` (not `pow(score,2)`) keeps bit-parity with the oracle:
  * `pow` is not guaranteed identical to multiplication for all inputs.
  */
object Normalize {

  /** Divide by the L2 norm: score / sqrt(Σ score²). */
  def l2(scores: DataFrame): DataFrame = {
    val norm = scores.agg(sqrt(sum(col("score") * col("score"))).as("__norm"))
    scores.crossJoin(broadcast(norm))
      .select(col("id"), (col("score") / col("__norm")).as("score"))
  }

  /** Divide by the L1 mass: score / Σ score (SALSA family). */
  def l1(scores: DataFrame): DataFrame = {
    val norm = scores.agg(sum(col("score")).as("__norm"))
    scores.crossJoin(broadcast(norm))
      .select(col("id"), (col("score") / col("__norm")).as("score"))
  }
}
