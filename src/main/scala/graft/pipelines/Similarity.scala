package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * The dot product / norm are sequential left-folds over the array
  * (`aggregate` higher-order function, codegen'd) with per-element
  * float→double casts — bit-identical to the oracle's `list_reduce`
  * fold, so cosine values are exactly reproducible cross-engine.
  *
  * Scale paths: brute-force top-k keeps the query side tiny (broadcast)
  * and streams the corpus; near-dup search blocks by a coarse partition
  * key (here the `label` column, standing in for an IVF centroid id) so
  * the pair join is linear-ish in the corpus rather than quadratic.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, v => v.cast("double") * v.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embedding near-duplicates: cosine >= threshold inside label blocks. */
  def nearDuplicates(emb: DataFrame, threshold: Double): DataFrame = {
    val x = emb.select(col("vec_id").as("a"), col("embedding").as("ea"),
      col("label"))
    val y = emb.select(col("vec_id").as("b"), col("embedding").as("eb"),
      col("label").as("label2"))
    x.join(y, col("label") === col("label2") && col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= lit(threshold))
      .select(col("a"), col("b"), round(col("cos"), 6).as("cosine"))
      .orderBy(col("a"), col("b"))
  }

  /** Brute-force cosine top-k for the first `nq` query vectors: the
    * baseline ANN path. The query side is bounded, so Spark broadcasts
    * it and the corpus streams through one codegen'd stage. */
  def annTopK(emb: DataFrame, nq: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
      .orderBy(col("query_id"), col("rn"))
  }
}
