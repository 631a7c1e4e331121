package graft.pipelines

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword + hybrid retrieval over the document corpus — the lookup
  * side of a training-data pipeline (dedup against a benchmark, source
  * tracing, curriculum selection all start with "find the documents
  * most relevant to this probe").
  *
  *  - [[bm25]]: Okapi BM25 (Lucene idf variant) against a fixed term
  *    query. One corpus scan: per-document term frequencies are
  *    per-row array folds over the token array (NO explode → groupBy
  *    per token — query terms are a small literal list, so tf is a
  *    codegen'd `filter(tokens, _ == term)` per term), corpus stats
  *    (N, Σdl, per-term df) are ONE single-row aggregate broadcast
  *    back, and the candidate list is a depth-bounded
  *    TakeOrderedAndProject — no global sort, no wide shuffle
  *    anywhere.
  *  - [[hybridRrf]]: reciprocal-rank fusion of the BM25 ranking with
  *    an embedding-cosine ranking (the standard sparse+dense hybrid).
  *    Both input rankings are depth-bounded candidate lists, so the
  *    fusion join is trivially broadcast at any corpus size; the dense
  *    side here is the exact scorer (linear scan) — at 100 TB swap in
  *    any rung of [[Similarity.ann]]'s ladder, the fusion shape is
  *    unchanged.
  *  - [[invertedIndex]]: term → sorted posting list with df bounds.
  *    One hash aggregation keyed by term; the df band (`minDf`,
  *    `maxDf`) drops stopword-grade hot terms so no posting list grows
  *    with corpus size untruncated (the df filter is applied AFTER the
  *    count, map-side combine still applies).
  *
  * Determinism: cross-row float sums never happen (BM25 scores are
  * per-row sums over a FIXED literal term order; df/N/Σdl are integer
  * aggregates), so every score is a bit-exact left-to-right IEEE fold
  * the DuckDB oracle replays operator-for-operator. Ranks break ties
  * on doc_id on both engines.
  */
object Retrieval {

  /** BM25 parameters — k1 term-frequency saturation, b length
    * normalization. Defaults are the standard Okapi/Lucene settings. */
  final case class Bm25Params(k1: Double = 1.2, b: Double = 0.75)

  private def tfOf(toks: Column, term: String): Column =
    size(filter(toks, x => x === lit(term))).cast("long")

  /** Per-document BM25 scores for `terms`, top `depth` candidates as
    * `(rank, doc_id, bm25)`. `excludeDocId` (when >= 0) drops that
    * document from the ranking — used by [[hybridRrf]] where the probe
    * document itself is the query. */
  def bm25(docs: DataFrame, terms: Seq[String],
      params: Bm25Params = Bm25Params(), depth: Int = 100,
      excludeDocId: Long = -1L): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = TF.tokens(col("text"))
    val perDocAll = docs.select(
      (col("doc_id") +: size(toks).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tfOf(toks, t).as(s"tf$i") }): _*)
    val perDoc =
      if (excludeDocId >= 0L) perDocAll.where(col("doc_id") =!= lit(excludeDocId))
      else perDocAll
    // One single-row corpus-stats aggregate (integer-exact: counts and
    // a long Σdl — no cross-row float sum), broadcast back to the scan.
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0L, 1L).otherwise(0L)).as(s"df$i")): _*)
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    // Σ over terms in the FIXED input order — a left fold of codegen'd
    // double ops, identical to the oracle's `e0 + e1 + ...` parse.
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i").cast("double")
      val idf = log((nD - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * tf * (lit(params.k1) + lit(1.0)) /
        (tf + lit(params.k1) *
          (lit(1.0) - lit(params.b) + lit(params.b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    val cand = perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .where(col("score") > lit(0.0))
      .orderBy(col("score").desc, col("doc_id")).limit(depth)
    // Rank over the depth-bounded candidate list only (single tiny
    // partition by construction, never the corpus).
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("rank"))
  }

  /** Embedding-cosine ranking of the corpus against one probe vector:
    * top `depth` as `(rank, doc_id, cos)`. Exact (linear-scan) scorer —
    * the probe row is a broadcast 1-row cross join, candidates are a
    * TakeOrderedAndProject. */
  def cosineRank(emb: DataFrame, queryVecId: Long,
      depth: Int = 100): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val q = base.where(col("vec_id") === lit(queryVecId))
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val cand = base.where(col("vec_id") =!= lit(queryVecId))
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        (Similarity.dot(col("qv"), col("embedding")) /
          (col("qn") * col("nrm"))).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(depth)
    val w = Window.orderBy(col("cos").desc, col("doc_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("rank"))
  }

  /** Sparse+dense hybrid: reciprocal-rank fusion (Cormack et al.,
    * `rrf(d) = Σ_lists 1/(kRrf + rank_list(d))`) of the [[bm25]] ranking
    * for `terms` with the [[cosineRank]] ranking for the probe document
    * `queryVecId` (its doc_id doubles as its vec_id; the probe document
    * is excluded from both lists). Output: top `topK` as
    * `(rank, doc_id, rrf, bm25_rank, cos_rank)` with NULL ranks for a
    * document present in only one list.
    *
    * Scale shape: both inputs are depth-bounded candidate lists, so the
    * full-outer fusion join touches at most `2·depth` rows regardless
    * of corpus size; every per-document rrf value is a sum of exactly
    * two IEEE divisions in a fixed order (no aggregation). */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      queryVecId: Long, params: Bm25Params = Bm25Params(),
      kRrf: Int = 60, depth: Int = 100, topK: Int = 20): DataFrame = {
    val sparse = bm25(docs, terms, params, depth, excludeDocId = queryVecId)
      .select(col("doc_id"), col("rank").as("bm25_rank"))
    val dense = cosineRank(emb, queryVecId, depth)
      .select(col("doc_id"), col("rank").as("cos_rank"))
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"),
        (coalesce(lit(1.0) / (lit(kRrf).cast("double") +
            col("bm25_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf).cast("double") +
            col("cos_rank").cast("double")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(topK)
    val w = Window.orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), round(col("rrf"), 9).as("rrf"),
        col("bm25_rank"), col("cos_rank"))
      .orderBy(col("rank"))
  }

  /** Term → document-frequency + sorted posting list (comma-joined —
    * a portable scalar; array-typed outputs cannot ride the driver's
    * column-sorting comparator). Terms outside the `[minDf, maxDf]`
    * document-frequency band are dropped: the upper bound is the
    * stopword guard that keeps every posting list sub-linear in corpus
    * size, the lower bound drops hapax noise.
    *
    * The band is enforced BEFORE the list aggregation: df is a cheap
    * counting pass, and the (doc, term) stream is semi-joined against
    * the in-band terms before any `collect_list` runs — filtering
    * after the aggregation would let a stopword-grade term accumulate
    * its full O(corpus) posting list in ONE aggregation buffer just to
    * throw it away (the same multiset-buffer hazard
    * [[graft.pipelines.Quantiles]] exists to avoid). `sort_array`
    * makes the list order deterministic regardless of which partition
    * delivered each doc_id. */
  def invertedIndex(docs: DataFrame, minDf: Int = 1,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val dt = docs.select(col("doc_id"),
      explode(array_distinct(TF.tokens(col("text")))).as("term"))
    val inBand = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") >= lit(minDf.toLong) && col("df") <= lit(maxDf.toLong))
    dt.join(inBand, Seq("term"))
      .groupBy(col("term"), col("df"))
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",")
        .as("postings"))
      .select(col("term"), col("df"), col("postings"))
      .orderBy(col("term"))
  }
}
