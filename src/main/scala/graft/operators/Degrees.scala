package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree computation (reference `src/base_salsa_2.py:14-17`).
  * Plain `groupBy.count` — partial + final hash aggregate with map-side
  * combine; shuffles only the per-key partial counts, never the edges.
  */
object Degrees {

  /** `(id, out_degree)` — one row per node with at least one out-edge. */
  def out(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_degree"))

  /** `(id, in_degree)` — one row per node with at least one in-edge. */
  def in(edges: DataFrame): DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_degree"))

  /** Weighted degrees: Σ weight per endpoint
    * (reference `src/weighted_salsa.py:41-42`). */
  def outWeighted(edges: DataFrame, weightCol: String = "weight"): DataFrame =
    edges.groupBy(col("src").as("id")).agg(sum(col(weightCol)).as("out_degree"))

  def inWeighted(edges: DataFrame, weightCol: String = "weight"): DataFrame =
    edges.groupBy(col("dst").as("id")).agg(sum(col(weightCol)).as("in_degree"))
}
