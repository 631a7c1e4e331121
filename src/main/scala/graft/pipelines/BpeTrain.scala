package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{aggregate => hofAggregate, _}

import graft.functions.{BpeVocab, TextFunctions}

/** Byte-pair-encoding MERGE TRAINING — the missing link between
  * [[TextMetrics.vocabulary]] (corpus term statistics) and the
  * [[graft.functions.BpeVocab]] tokenizer: learn the ordered merge
  * list from the corpus itself instead of running on a pinned demo
  * vocabulary.
  *
  * The algorithm is canonical BPE training (Sennrich et al. 2016, the
  * GPT-2/HF trainer loop): start from the per-word character
  * sequences of the corpus WORD-TYPE dictionary (each word type
  * weighted by its corpus frequency), and for each of `numMerges`
  * rounds (1) count every adjacent symbol pair, weighted by word
  * count — overlapping occurrences included, the standard convention;
  * (2) pick the most frequent pair (ties broken `count desc, lhs asc,
  * rhs asc` so the result is deterministic cross-engine); (3) fold
  * that pair into one symbol everywhere (leftmost-first,
  * non-overlapping — exactly [[BpeVocab]]'s `mergePass`).
  *
  * 100 TB shape: the ONLY corpus-sized work is the dictionary build —
  * one explode + hash aggregation over pre-tokens (the
  * [[TextMetrics.vocabulary]] scan shape), truncated to the
  * `maxWordTypes` head by `(cnt desc, word asc)`. Every training
  * round then runs on that CAPPED word-type table: pair counting is a
  * hash aggregation over ≤ maxWordTypes · avgLen rows and the merge
  * fold is a per-row codegen'd higher-order function, so per-round
  * cost is corpus-size-INDEPENDENT — the trainer's cost at 100 TB is
  * one corpus scan plus `numMerges` constant-size rounds. Each
  * round's fold result is checkpoint-materialized and the previous
  * round released ([[graft.Checkpoints]] kernel-loop lifecycle), so
  * the plan never grows with `numMerges`. The learned list is K rows
  * — a driver-side constant, like IVF centroids.
  *
  * Well-formedness of the output (each merge's constituents are
  * single characters or outputs of earlier merges — the invariant
  * [[BpeVocab]] requires) holds by construction: a symbol exists in
  * the round-`i` sequences only if it is a single character or was
  * produced by a round `< i`.
  */
object BpeTrain {

  /** Default training configuration shared by the Spark side and the
    * DuckDB oracle generator ([[graft.Oracles.bpeTrain]]) — the two
    * must agree or the gate is meaningless. */
  val DefaultMerges = 16
  val DefaultMinCount = 2L
  val DefaultMaxWordTypes = 4096

  /** The capped word-type dictionary `(w, cnt)` training runs on:
    * pre-token corpus frequencies floored at `minCount`, truncated to
    * the `maxWordTypes` head by `(cnt desc, w asc)` — the
    * [[TextMetrics.vocabulary]] bounded-head discipline, which is what
    * makes every later training round corpus-size-independent. */
  def wordDict(docs: DataFrame, minCount: Long = DefaultMinCount,
      maxWordTypes: Int = DefaultMaxWordTypes): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxWordTypes >= 1, s"maxWordTypes must be >= 1, got $maxWordTypes")
    docs.select(explode(TextFunctions.subtokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("w")).limit(maxWordTypes)
  }

  /** One leftmost-first, non-overlapping fold of merge `(a, b)` over a
    * symbol array — [[BpeVocab]]'s `mergePass` as a codegen'd
    * higher-order aggregate (no UDF). */
  private def mergeFold(syms: org.apache.spark.sql.Column, a: String,
      b: String): org.apache.spark.sql.Column =
    hofAggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` merges from the corpus. Returns the driver-side
    * merge list `(lhs, rhs, pairCount)` in rank order — bounded (K
    * rows), the IVF-centroid collect pattern. Fails loudly if the
    * corpus runs out of mergeable pairs before `numMerges` (train on
    * more data or ask for fewer merges — a silent short list would
    * diverge from the fixed-K oracle). */
  def trainMerges(docs: DataFrame, numMerges: Int = DefaultMerges,
      minCount: Long = DefaultMinCount,
      maxWordTypes: Int = DefaultMaxWordTypes): Seq[(String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var words = graft.Checkpoints.materialize(
      wordDict(docs, minCount, maxWordTypes)
        .select(split(col("w"), "").as("syms"), col("cnt")))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    try {
      var i = 0
      while (i < numMerges) {
        // sequence() is guarded by the size filter: sequence(0, -1)
        // would DESCEND, fabricating pairs from 1-symbol words.
        val best = words.filter(size(col("syms")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(syms) - 2), " +
              "j -> struct(syms[j] AS a, syms[j + 1] AS b))")).as("p"),
            col("cnt"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("a"), col("b")).limit(1)
          .collect()
        require(best.nonEmpty, s"corpus exhausted after ${merges.length} " +
          s"merges; asked for $numMerges (see scaladoc)")
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((a, b, c))
        val next = graft.Checkpoints.materialize(
          words.select(mergeFold(col("syms"), a, b).as("syms"), col("cnt")))
        graft.Checkpoints.release(words)
        words = next
        i += 1
      }
    } finally graft.Checkpoints.release(words)
    merges.toSeq
  }

  /** UTF-8 binary string ordering — what Spark's UTF8String comparator
    * and DuckDB's VARCHAR ordering both implement (Scala's
    * `String.compareTo` orders by UTF-16 code unit, which diverges on
    * supplementary-vs-[U+E000,U+FFFF] comparisons). With TODAY'S
    * pre-tokenizer merge symbols are always `[a-z0-9]+` runs, where
    * every ordering coincides — this comparator exists so a byte-level
    * or unicode-run pre-tokenizer swap can never silently fork the
    * driver-local tie-break from the engines'. */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** [[trainMerges]] with the training loop on the DRIVER — the exact
    * same greedy merges (identical pair counting, identical
    * `(count desc, lhs asc, rhs asc)` tie-break in UTF-8 byte order,
    * identical leftmost fold via the SHARED
    * [[graft.functions.BpeVocab.mergePass]]), at a fraction of the job
    * count: the distributed loop launches TWO Spark jobs per merge
    * (pair-count + argmax collect, then the fold's checkpoint
    * materialization — 2·numMerges jobs whose per-round data is
    * corpus-size-INDEPENDENT anyway, since rounds run on the capped
    * dictionary), where this launches ONE job total: the corpus-sized
    * dictionary scan, whose ≤ `maxWordTypes` rows then train locally.
    * The collect is bounded by construction (the [[wordDict]] head cap
    * — the IVF-centroid collect pattern), so this is the deployment
    * default for real vocabulary sizes; keep [[trainMerges]] when
    * `maxWordTypes` is pushed so high the dictionary itself should
    * never sit on one machine. Gated: `bpe_train_fast` passes the
    * greedy DuckDB oracle that `bpe_train` passes, verbatim. */
  def trainMergesFast(docs: DataFrame, numMerges: Int = DefaultMerges,
      minCount: Long = DefaultMinCount,
      maxWordTypes: Int = DefaultMaxWordTypes): Seq[(String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // split("") matches the distributed path's split(col("w"), "") —
    // both are Java-regex splits, so symbol arrays agree byte-for-byte
    var words: Array[(Array[String], Long)] =
      wordDict(docs, minCount, maxWordTypes).collect()
        .map(r => (r.getString(0).split(""), r.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var i = 0
    while (i < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          j += 1
        }
      }
      require(counts.nonEmpty, s"corpus exhausted after ${merges.length} " +
        s"merges; asked for $numMerges (see scaladoc)")
      var best: ((String, String), Long) = null
      counts.foreach { case e @ ((a, b), c) =>
        if (best == null || c > best._2 || (c == best._2 &&
            (utf8Lt(a, best._1._1) ||
              (a == best._1._1 && utf8Lt(b, best._1._2))))) best = e
      }
      val ((a, b), c) = best
      merges += ((a, b, c))
      words = words.map { case (syms, cnt) =>
        (graft.functions.BpeVocab.mergePass(syms, a, b), cnt)
      }
      i += 1
    }
    merges.toSeq
  }

  /** The trained merge list as a gate-shaped DataFrame
    * `(rnk, lhs, rhs, pcnt)` — oracle-replayed stage-for-stage by
    * [[graft.Oracles.bpeTrain]]. `fast = true` routes through
    * [[trainMergesFast]] (same merges, one corpus job instead of two
    * jobs per merge). */
  def merges(docs: DataFrame, numMerges: Int = DefaultMerges,
      minCount: Long = DefaultMinCount,
      maxWordTypes: Int = DefaultMaxWordTypes,
      fast: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val trained =
      if (fast) trainMergesFast(docs, numMerges, minCount, maxWordTypes)
      else trainMerges(docs, numMerges, minCount, maxWordTypes)
    trained.zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, c) }
      .toDF("rnk", "lhs", "rhs", "pcnt")
  }

  /** Train and wrap as a [[BpeVocab]] — what `text_bpe_tokens` feeds
    * its tokenizer with (the corpus-trained replacement for
    * `BpeVocab.Demo`). */
  def trainedVocab(docs: DataFrame, numMerges: Int = DefaultMerges,
      minCount: Long = DefaultMinCount,
      maxWordTypes: Int = DefaultMaxWordTypes): BpeVocab =
    BpeVocab.fromMerges(
      trainMerges(docs, numMerges, minCount, maxWordTypes)
        .map { case (a, b, _) => (a, b) })
}
