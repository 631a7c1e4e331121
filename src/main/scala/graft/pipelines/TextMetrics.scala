package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-document max token multiplicity as a pure expression: the max
    * run length of the SORTED token array (a sorted array groups equal
    * tokens into runs, so max run = top token count). Folds a
    * (prev, run, best) struct over the array — one codegen'd pass, no
    * explode, no shuffle. Empty arrays yield 0. */
  private def topTokenCount(toks: Column): Column =
    aggregate(array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, tok) => {
        val run = when(tok === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(tok.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** `(doc_id, n_tokens, type_token_ratio, top_token_frac,
    * dup_bigram_frac)` for every document. Empty/blank docs score 0 on
    * all three ratios (guarded denominators).
    *
    * Scale shape: a single per-row codegen'd projection — the top-token
    * multiplicity is the [[topTokenCount]] sorted-run fold, NOT an
    * explode → groupBy → join branch (which would shuffle one row per
    * token and scan the corpus twice); the whole operator rides the
    * scan. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TF.tokens(col("text")).as("toks"),
      TF.shingles(col("text"), 2).as("bigrams"))
    def ratio(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      round(num.cast("double") / greatest(den, lit(1)).cast("double"), 6)
    toks.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        ratio(size(array_distinct(col("toks"))), size(col("toks")))
          .as("type_token_ratio"),
        ratio(topTokenCount(col("toks")), size(col("toks")))
          .as("top_token_frac"),
        ratio(size(col("bigrams")) - size(array_distinct(col("bigrams"))),
          size(col("bigrams"))).as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Per-(document, term) TF-IDF weights over whitespace tokens —
    * the weighting the reference's second weighted-HITS run consumes
    * (`/root/reference/src/weighted_hits.py:30-31` takes a tf-idf
    * weight column produced upstream); here the computation itself is
    * an engine operator: `tfidf = tf * ln(N / df)`.
    *
    * Scale shape: two hash aggregations (term frequency keyed by
    * (doc_id, term), document frequency keyed by term) and one
    * equi-join on term — partial map-side combine applies to both
    * aggs, and the corpus count N rides along as a broadcast 1-row
    * cross join (no driver collect). Stop-word terms make the df side
    * skewed but never quadratic (one row per term), and AQE splits
    * any hot term partition in the join. */
  def tfidf(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dft, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 6)
          .as("tfidf"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** Per-document mean unigram negative log-likelihood under the
    * corpus's OWN unigram distribution — the cheap in-engine stand-in
    * for a CCNet-style LM quality filter: documents of rare/garbled
    * tokens score high (surprising), boilerplate scores low. Returns
    * `(doc_id, n_tokens, mean_nll)`; empty documents produce no row
    * (no tokens → no likelihood).
    *
    * Determinism: each token's `−ln(ctf/N)` is rounded to integer
    * micro-nats BEFORE the per-document sum, so the cross-row
    * aggregation is an exact long sum (order-independent on both
    * engines); only then one division back to a mean.
    *
    * Scale shape: one explode feeding two hash aggregations (corpus
    * term frequencies keyed by term, then the per-document sum) and
    * one equi-join of the token stream against the frequency table —
    * one row per VOCABULARY term, the classic broadcast-or-shuffle
    * dimension join. Stopword-hot terms skew the join key like tfidf's
    * df side; AQE splits the hot partitions. */
  def unigramNll(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"),
      explode(TF.tokens(col("text"))).as("term"))
    val tc = tf.groupBy(col("term")).agg(count(lit(1)).as("ctf"))
    val nt = tf.agg(count(lit(1)).as("n_tok"))
    tf.join(tc, Seq("term"))
      .crossJoin(broadcast(nt))
      .select(col("doc_id"),
        round(-log(col("ctf").cast("double") / col("n_tok").cast("double")) *
          lit(1e6)).cast("long").as("nll_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nll_micro")).cast("double") / lit(1e6) /
          count(lit(1)).cast("double"), 6).as("mean_nll"))
      .orderBy(col("doc_id"))
  }

  /** Per-document mean BIGRAM negative log-likelihood under the
    * corpus's own bigram statistics — the order-sensitive companion of
    * [[unigramNll]]: a document of common tokens in an uncommon ORDER
    * (shuffled text, stitched boilerplate, keyword-stuffed spam) scores
    * high here while unigram NLL stays low. Per bigram (a, b) the
    * conditional surprise is `−ln(c(a,b) / c_start(a))` where
    * `c_start(a)` counts bigrams beginning with `a` — every observed
    * bigram has c ≥ 1, so no smoothing is needed for corpus-internal
    * scoring. Returns `(doc_id, n_bigrams, mean_nll)`; documents with
    * < 2 tokens produce no row.
    *
    * Determinism: the unigramNll scheme — per-bigram micro-nats
    * rounded BEFORE the per-document sum (exact long arithmetic,
    * order-independent), one division back at the end.
    *
    * Scale shape: bigrams are formed IN-PLAN by zipping the token
    * array with its own tail (no positional self-join of the token
    * stream — that join would shuffle rows ∝ tokens on a composite
    * key); then two hash aggregations (corpus bigram counts, start
    * counts) and two dimension joins of the bigram stream, the same
    * broadcast-or-shuffle profile as tfidf/unigramNll. */
  def bigramNll(docs: DataFrame): DataFrame = {
    val ts = TF.tokens(col("text"))
    val bg = docs
      .select(col("doc_id"), ts.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("z"))
      .select(col("doc_id"), col("z.a").as("a"), col("z.b").as("b"))
    val cab = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    val ca = bg.groupBy(col("a")).agg(count(lit(1)).as("ca"))
    bg.join(cab, Seq("a", "b")).join(ca, Seq("a"))
      .select(col("doc_id"),
        round(-log(col("cab").cast("double") / col("ca").cast("double")) *
          lit(1e6)).cast("long").as("nll_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll_micro")).cast("double") / lit(1e6) /
          count(lit(1)).cast("double"), 6).as("mean_nll"))
      .orderBy(col("doc_id"))
  }

  /** Dynamic-threshold quality filter: keep documents whose quality
    * clears the corpus's own `q`-th percentile — "keep the best
    * quartile" curation, where the cutoff adapts to the corpus instead
    * of being a hand-tuned constant that rots as the data shifts.
    * Returns `(doc_id, quality, cutoff)` for survivors.
    *
    * Determinism: the percentile interpolates over INTEGER micro-unit
    * qualities (the events-percentile pattern — interpolation over
    * exact longs is engine-reproducible where raw-double interpolation
    * is ulp-hostage).
    *
    * Scale shape: one scan-local projection; the cutoff comes from the
    * corpus-wide quality HISTOGRAM
    * ([[Quantiles.contFromHistogram]] — the exact `percentile`
    * aggregate would buffer every document's value in ONE task for
    * this single global group, the classic 100 TB OOM), broadcast back
    * as one row; one filter. The cutoff never touches the driver. */
  def qualityCutoff(docs: DataFrame, q: Double = 0.75): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0, 1), got $q")
    val base = docs.select(col("doc_id"),
      round(TF.qualityScore(col("text")) * lit(1e6)).cast("long")
        .as("q_micro"))
    val cut = Quantiles.contFromHistogram(base, Nil, col("q_micro"), Seq(q))
      .select(col("p").as("cutoff"))
    base.crossJoin(broadcast(cut))
      .filter(col("q_micro").cast("double") >= col("cutoff"))
      .select(col("doc_id"),
        round(col("q_micro").cast("double") / lit(1e6), 6).as("quality"),
        round(col("cutoff") / lit(1e6), 6).as("cutoff"))
      .orderBy(col("doc_id"))
  }

  /** STRATIFIED dynamic quality filter: keep documents above their own
    * SOURCE's `q`-th quality percentile — per-domain curation (the
    * Dolma/CCNet practice: a threshold tuned on the whole corpus lets
    * one high-quality domain drown out the rest; a per-source cutoff
    * keeps the best of EACH domain). Returns `(doc_id, source,
    * quality, cutoff)` for survivors — same shape as [[qualityCutoff]]
    * plus the stratum.
    *
    * Same determinism (integer micro-unit histogram percentile) and
    * same scale posture as [[qualityCutoff]], through
    * [[Quantiles.contFromHistogram]]'s grouped path: per-source
    * histogram state bounded by the quality DOMAIN, cutoffs a
    * one-row-per-source broadcast dimension. */
  def qualityCutoffBySource(docs: DataFrame, q: Double = 0.75): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0, 1), got $q")
    val base = docs.select(col("doc_id"), col("source"),
      round(TF.qualityScore(col("text")) * lit(1e6)).cast("long")
        .as("q_micro"))
    val cuts = Quantiles.contFromHistogram(base, Seq("source"),
        col("q_micro"), Seq(q))
      .select(col("source"), col("p").as("cutoff"))
    base.join(broadcast(cuts), Seq("source"))
      .filter(col("q_micro").cast("double") >= col("cutoff"))
      .select(col("doc_id"), col("source"),
        round(col("q_micro").cast("double") / lit(1e6), 6).as("quality"),
        round(col("cutoff") / lit(1e6), 6).as("cutoff"))
      .orderBy(col("doc_id"))
  }

  /** Corpus vocabulary induction — the input a tokenizer/BPE training
    * run starts from: per term the corpus frequency `tf` and document
    * frequency `df`, floored at `minCount` occurrences, ranked by
    * `(tf desc, term asc)` and truncated to the `maxSize` head. Returns
    * `(rnk, term, tf, df)`.
    *
    * Scale shape: explode → (term, doc) pre-aggregation (absorbs
    * within-document repetition map-side) → per-term aggregation →
    * `minCount` filter → TakeOrderedAndProject for the `maxSize` head;
    * the only global window ranks the ALREADY-LIMITED ≤ maxSize rows
    * (the [[Sampling]] bounded-set pattern — never a corpus-wide
    * single-partition window). Integer-exact, ties broken on the term
    * string identically in both engines. */
  def vocabulary(docs: DataFrame, minCount: Long = 2,
      maxSize: Int = 1000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")
    import org.apache.spark.sql.expressions.Window
    val perDoc = docs
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tfd"))
    val stats = perDoc.groupBy(col("term"))
      .agg(sum(col("tfd")).as("tf"), count(lit(1)).as("df"))
      .filter(col("tf") >= minCount)
    val top = stats.orderBy(col("tf").desc, col("term")).limit(maxSize)
    top
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("tf").desc, col("term"))).cast("long"))
      .select(col("rnk"), col("term"), col("tf"), col("df"))
      .orderBy(col("rnk"))
  }

  /** Per-document Shannon entropy of the character distribution (nats)
    * — the garbled/binary-content detector: natural text sits in a
    * narrow entropy band, base64/binary spills high, repeated-char
    * padding collapses low. Returns `(doc_id, n_chars, char_entropy)`;
    * null/empty text produces no row.
    *
    * Determinism: each character class's `−(c/n)·ln(c/n)` term is
    * rounded to micro-nats before the per-document sum — the same
    * exact-long-sum discipline as [[unigramNll]].
    *
    * Scale shape: explode to one row per character (the scan-linear
    * floor for any character statistic), two hash aggregations keyed by
    * (doc_id, char) then doc_id, one co-keyed join for the per-doc
    * total. Per-document state is the alphabet size, never corpus
    * size. */
  def charEntropy(docs: DataFrame): DataFrame = {
    val cc = docs
      .filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val nn = cc.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    cc.join(nn, Seq("doc_id"))
      .select(col("doc_id"), col("n"),
        round(-(col("c").cast("double") / col("n").cast("double")) *
          log(col("c").cast("double") / col("n").cast("double")) * lit(1e6))
          .cast("long").as("term"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_chars"),
        round(sum(col("term")).cast("double") / lit(1e6), 6)
          .as("char_entropy"))
      .orderBy(col("doc_id"))
  }

  /** Corpus mixture report: per (source, lang) document counts, token
    * totals and mean quality — the summary a training-data pipeline
    * uses to rebalance its source mixture before sampling
    * ([[Sampling.quotaPerGroup]] consumes the quotas this informs).
    * One hash aggregation over scan-local projections. The quality
    * mean is accumulated in integer micro-units so the cross-row sum
    * is exact — a float sum's value would depend on partition order
    * and could not hash-match any oracle. */
  def mixtureReport(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TF.tokenCount(col("text")).cast("long")).as("n_tokens"),
        round(sum(round(TF.qualityScore(col("text")) * lit(1e6))
            .cast("long")).cast("double") / lit(1e6) /
          count(lit(1)).cast("double"), 6).as("mean_quality"))
      .orderBy(col("source"), col("lang"))

  /** Regex scrub/redaction — the PII-removal shape of a training-data
    * pipeline: every match of `pattern` in `text` is replaced with
    * `replacement`, and the match count is reported per document so the
    * pipeline can audit redaction volume (or drop documents whose count
    * exceeds a policy bound). Callers supply the real patterns (emails,
    * phone numbers, credential-looking strings); the operator is the
    * plumbing, deliberately pattern-agnostic.
    *
    * A pure per-row codegen'd projection — no shuffle, no state, scales
    * with the scan. Keep `pattern` inside the regex subset with
    * identical semantics across engines (alternation, classes,
    * quantifiers — no lookaround) when oracle-checking cross-engine. */
  def scrub(docs: DataFrame, pattern: String,
      replacement: String = "[REDACTED]"): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(col("text"), pattern, replacement).as("scrubbed"),
      coalesce(size(regexp_extract_all(col("text"), lit(pattern), lit(0))),
        lit(0)).cast("long").as("n_redactions"))
      .orderBy(col("doc_id"))
}
