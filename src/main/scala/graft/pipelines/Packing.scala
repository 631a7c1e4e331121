package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftHash, SubtokenTokenizer, Tokenizer}

/** Deterministic sequence packing — the batch-assembly step of an LLM
  * training pipeline: group documents into "packs" whose token totals
  * hit a target context budget, so downstream batch assembly reads
  * whole packs instead of re-binning the corpus.
  *
  * The scheme is contiguous greedy binning in a content-derived order:
  * docs are bucketed by `graft_hash(id) % buckets`, ordered within a
  * bucket by `(hash, id)`, and a doc opens a new pack whenever the
  * running token total before it has crossed a multiple of `capacity`
  * (so a pack may overflow by less than one document — the standard
  * trade against a sequential bin-packer, which cannot be expressed as
  * a distributed plan). Everything is a pure function of document
  * content: any engine — including the DuckDB oracle — derives the
  * identical assignment, and a re-run after failure re-packs
  * identically (safe sink retries).
  *
  * Scale shape: ONE shuffle, keyed by the bucket column, then a
  * per-bucket sort for the running-sum window — the same cost profile
  * as any per-group top-k. `buckets` is the 100 TB knob: packs never
  * span buckets, so buckets pack in parallel and a bucket only needs
  * its own docs' (id, count) pairs in one task; size `buckets` so a
  * bucket's rows fit a task (corpus_docs / buckets ≲ 10⁷). Token
  * counting goes through the pluggable [[graft.functions.Tokenizer]]
  * boundary (default: the codegen'd BPE-ish subtoken expression — no
  * UDFs; a real BPE plugs in without touching the packer).
  */
object Packing {

  /** Per-bucket pack index space in the composed pack id
    * (`pack = bucket · 10⁹ + local`). A bucket holding more packs than
    * this would alias ids; with capacity ≥ 1 that means > 10⁹ tokens
    * per pack slot — raise `buckets` long before that. */
  val PacksPerBucket = 1000000000L

  /** Assign every document a deterministic pack id.
    * Returns `(id, pack, n_tokens)` with `id` named after `idCol`. */
  def packDocs(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, capacity: Long, buckets: Int,
      tokenizer: Tokenizer = SubtokenTokenizer): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val h: Column = GraftHash.graftHash(spark, col(idCol).cast("string"))
    val base = docs.select(col(idCol),
      tokenizer.countTokens(col(textCol)).cast("long").as("n_tokens"),
      (h % buckets).as("bucket"), h.as("h"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = floor((col("run") - col("n_tokens")) / lit(capacity.toDouble))
      .cast("long")
    // Fail loudly if a bucket would exceed its pack-id space — silently
    // bleeding into bucket+1's range would break the packs-never-span-
    // buckets invariant. Raise `buckets` when this fires.
    val guarded = when(local < lit(PacksPerBucket), local).otherwise(
      raise_error(concat(lit(s"graft.Packing: bucket "), col("bucket"),
        lit(s" exceeds $PacksPerBucket packs; raise buckets"))).cast("long"))
    base
      .withColumn("run", sum(col("n_tokens")).over(w))
      .select(col(idCol),
        (col("bucket").cast("long") * PacksPerBucket + guarded).as("pack"),
        col("n_tokens"))
  }

  /** Pack-level manifest: token totals and sizes per pack — what a
    * batch-assembly reader consumes, and the fill-rate evidence that
    * the packer works (mean fill → capacity as docs shrink relative to
    * it). Derived from [[packDocs]] output by one aggregation on the
    * pack key. */
  /** Overlapping token chunks — the doc → embedding-input shaping step
    * (context-window chunking with stride): chunk `c` of a document
    * covers token positions `[c·stride, c·stride + size)`, the last
    * chunk may be shorter, and `stride < size` gives the usual overlap.
    * Returns `(doc_id, chunk, n_tokens, chunk_text)`; empty documents
    * produce no rows.
    *
    * Built membership-first to dodge the quadratic trap of slicing
    * inside a higher-order-function lambda (see
    * [[graft.functions.TextFunctions.shingles]]'s scaladoc): each
    * token row fans out only to the ≤ `⌈size/stride⌉` chunks that
    * contain it — total row volume is exactly the OUTPUT volume
    * (tokens × overlap factor), never tokens × document length. One
    * explode + one hash aggregation keyed by (doc_id, chunk); the
    * within-chunk order is reconstructed by an `array_sort` on
    * (pos, token) structs, deterministic on both engines.
    *
    * Scale: per-chunk state is bounded by `size`; the aggregation is
    * the standard map-side-combine hash agg, and a skewed (huge)
    * document spreads across its many chunk keys rather than one. */
  def chunkTokens(docs: DataFrame, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val pt = docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
    // token at pos t belongs to chunks c with c·stride <= t < c·stride+size
    val cmin = greatest(ceil((col("pos") - lit(size) + lit(1)).cast("double") /
      lit(stride.toDouble)).cast("long"), lit(0L))
    val cmax = floor(col("pos").cast("double") / lit(stride.toDouble))
      .cast("long")
    pt.select(col("doc_id"), col("pos"), col("tok"),
        explode(sequence(cmin, cmax)).as("chunk"))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk"))
  }

  def packManifest(assignments: DataFrame, idCol: String): DataFrame =
    assignments.groupBy(col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
        min(col(idCol)).as("first_id"))
}
