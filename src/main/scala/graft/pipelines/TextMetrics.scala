package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus-level repetition diagnostics — the Gopher-style quality
  * signals a training-data pipeline computes per document to filter
  * boilerplate and degenerate (repetitive) text:
  *
  *   - `type_token_ratio`: distinct tokens / tokens (low = repetitive)
  *   - `top_token_frac`: occurrences of the single most frequent token
  *     / tokens (high = one word dominates)
  *   - `dup_bigram_frac`: fraction of word bigrams that are repeats of
  *     an earlier bigram (high = copy-pasted / templated text)
  *
  * Shapes chosen for 100 TB: the ratio columns are per-row array
  * arithmetic (codegen'd, no shuffle); the top-token count is the one
  * signal that needs a frequency table, computed as explode →
  * two-level hash aggregation keyed by (doc_id, token) then doc_id —
  * partial map-side combine applies and nothing is ever collected.
  * Per-document state is bounded by document length, never corpus
  * size.
  */
object TextMetrics {

  /** `(doc_id, n_tokens, type_token_ratio, top_token_frac,
    * dup_bigram_frac)` for every document. Empty/blank docs score 0 on
    * all three ratios (guarded denominators). */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TF.tokens(col("text")).as("toks"),
      TF.shingles(col("text"), 2).as("bigrams"))
    val base = toks.select(col("doc_id"),
      size(col("toks")).as("n_tokens"),
      size(array_distinct(col("toks"))).as("n_types"),
      size(col("bigrams")).as("n_bigrams"),
      size(array_distinct(col("bigrams"))).as("n_bitypes"))
    val top = toks
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_count"))
    def ratio(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      round(num.cast("double") / greatest(den, lit(1)).cast("double"), 6)
    base.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        ratio(col("n_types"), col("n_tokens")).as("type_token_ratio"),
        ratio(coalesce(col("top_count"), lit(0L)), col("n_tokens"))
          .as("top_token_frac"),
        ratio(col("n_bigrams") - col("n_bitypes"), col("n_bigrams"))
          .as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }
}
