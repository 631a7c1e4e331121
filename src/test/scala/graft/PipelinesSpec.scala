package graft

import graft.pipelines.{Dedup, Multimodal, Similarity, TextMetrics}
import org.apache.spark.sql.functions._

class PipelinesSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under the lowest id") {
    val d = docs((1L, "x y z"), (2L, "x y z"), (3L, "other text"))
    val got = Dedup.exact(d).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("simhash: identical docs get identical fingerprints, disjoint differ") {
    val d = docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota"))
    val fp = Dedup.simhash(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp.values.forall(v => v >= 0 && v < 65536))
  }

  test("minhash LSH finds identical docs as candidates") {
    val text = "one two three four five six seven eight nine ten"
    val d = docs((1L, text), (2L, text), (3L, "completely different words " +
      "in this much longer unrelated document body here"))
    val pairs = Dedup.minhashLsh(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("incrementalMinhash: delta probes the corpus index, " +
    "new x existing only, consistent with the self-join candidates") {
    val text = "one two three four five six seven eight nine ten"
    val d = docs((2L, text), (4L, text), (3L, text),
      (5L, "completely different words in this much longer unrelated " +
        "document body here"))
    val corpus = d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val delta = d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    val got = Dedup.incrementalMinhash(spark, corpus, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // new doc 3 hits both existing copies; new doc 5 hits nothing;
    // existing docs never appear on the new side
    assert(got == Set((3L, 2L), (3L, 4L)))
    // consistency: the incremental pairs are exactly the self-join
    // candidates restricted to delta x corpus
    val self = Dedup.minhashLsh(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = self.flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }.filter { case (n, e) => n % 2 == 1 && e % 2 == 0 }
    assert(got == expected)
  }

  test("incrementalClusters: delta extends base clusters, unrelated " +
    "docs stay out; result equals from-scratch clustering") {
    val textA = "one two three four five six seven eight nine ten"
    val textB = "completely different words in this much longer unrelated " +
      "document body here"
    // Base corpus: {1,2} cluster on textA, {5,6} cluster on textB —
    // two separate components. Delta doc 9 duplicates textA, delta doc
    // 10 duplicates textB, and delta doc 11 is unrelated (no pairs).
    val corpus = docs((1L, textA), (2L, textA), (5L, textB), (6L, textB))
    val delta = docs((9L, textA), (10L, textB),
      (11L, "entirely novel content with no shingle overlap at all " +
        "whatsoever in any words"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = rows(Dedup.incrementalClusters(spark, corpus, delta))
    val scratch = rows(graft.operators.ConnectedComponents.clusters(
      Dedup.minhashLsh(spark, docs((1L, textA), (2L, textA), (5L, textB),
        (6L, textB), (9L, textA), (10L, textB)))))
    assert(inc == scratch)
    // membership: {1,2,9} under rep 1 and {5,6,10} under rep 5; doc 11
    // pairs nothing and stays out
    assert(inc == Set((1L, 1L, 3L), (2L, 1L, 3L), (9L, 1L, 3L),
      (5L, 5L, 3L), (6L, 5L, 3L), (10L, 5L, 3L)))
  }

  test("incrementalClustersIndexed: persisted index + assignments " +
    "round-trip equals the in-query incremental path") {
    val textA = "one two three four five six seven eight nine ten"
    val textB = "completely different words in this much longer unrelated " +
      "document body here"
    val corpus = docs((1L, textA), (2L, textA), (5L, textB), (6L, textB))
    val delta = docs((9L, textA), (10L, textB))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-clidx").toString
    // the two persisted halves a deployment reads back per delta
    Dedup.bandTable(spark, corpus)
      .write.mode("overwrite").parquet(s"$tmp/index")
    graft.operators.ConnectedComponents.clusters(
        Dedup.minhashLsh(spark, corpus, ordered = false))
      .write.mode("overwrite").parquet(s"$tmp/assignments")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val indexed = rows(Dedup.incrementalClustersIndexed(spark,
      spark.read.parquet(s"$tmp/index"),
      spark.read.parquet(s"$tmp/assignments"), delta))
    assert(indexed == rows(Dedup.incrementalClusters(spark, corpus, delta)))
    assert(indexed == Set((1L, 1L, 3L), (2L, 1L, 3L), (9L, 1L, 3L),
      (5L, 5L, 3L), (6L, 5L, 3L), (10L, 5L, 3L)))
  }

  test("band-index lifecycle: append supersedes, compact equals rebuild") {
    val textA = "one two three four five six seven eight nine ten"
    val textB = "completely different words in this much longer unrelated " +
      "document body here"
    // Doc 1 was first ingested with stale text, then re-ingested.
    val stale = docs((1L, textB), (2L, textA))
    val finalCorpus = docs((1L, textA), (2L, textA))
    val idx = Dedup.bandIndexAppend(
      Dedup.bandIndexEntries(spark, stale, gen = 0),
      Dedup.bandIndexEntries(spark, finalCorpus
        .filter(org.apache.spark.sql.functions.col("doc_id") === 1L), gen = 1))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val compacted = rows(Dedup.bandIndexCompact(idx))
    val rebuild = rows(Dedup.bandTable(spark, finalCorpus))
    assert(compacted == rebuild)
    // the superseded gen-0 signatures of doc 1 (textB) are gone
    val staleSigs = rows(Dedup.bandTable(spark,
      stale.filter(org.apache.spark.sql.functions.col("doc_id") === 1L)))
    assert(compacted.intersect(staleSigs).isEmpty)
  }

  test("ngram jaccard: identical docs score 1.0") {
    val text = "one two three four five"
    val d = docs((1L, text), (2L, text), (3L, "unrelated totally distinct " +
      "other phrasing entirely"))
    val got = Dedup.ngramJaccard(d, 0.5).collect()
      .map(r => ((r.getLong(1), r.getLong(0)), r.getDouble(2))).toMap
    // columns are (b, a, jaccard) after the two joins reorder; read by name
    val byName = Dedup.ngramJaccard(d, 0.5).select("a", "b", "jaccard")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(byName.keySet == Set((1L, 2L)))
    assert(math.abs(byName((1L, 2L)) - 1.0) < 1e-12)
  }

  test("ngram jaccard: hot-shingle df cutoff bounds the candidate pair join") {
    // Adversarial fixture: 40 docs all sharing one hot shingle ("of the
    // and") but otherwise pairwise disjoint. Unguarded, the candidate
    // join yields 40*39/2 = 780 pairs from that single shingle; with the
    // cutoff the hot shingle is dropped before the join, so zero
    // candidate pairs survive. Two genuinely similar docs sharing only
    // cold shingles must still match.
    val hot = (1L to 40L).map(i =>
      (i, s"of the and unique$i word$i tail$i"))
    val sim = Seq((100L, "aa bb cc dd ee"), (101L, "aa bb cc dd ee"))
    val d = docs(hot ++ sim: _*)
    val guarded = Dedup.ngramJaccard(d, 0.1, maxShingleDf = 8)
      .select("a", "b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == Set((100L, 101L)))
    // Sanity: with the cutoff above the hot shingle's df the unguarded
    // quadratic blowup reappears — proving the guard is what bounds it.
    val unguarded = Dedup.ngramJaccard(d, 0.1, maxShingleDf = 1000)
      .select("a", "b").collect().length
    assert(unguarded > 700)
  }

  test("cosine: identical vectors = 1, orthogonal = 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    assert(math.abs(got(0) - 1.0) < 1e-12 && math.abs(got(1)) < 1e-12)
  }

  test("annTopK ranks the nearest vector first") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (100L, Array(0.9f, 0.1f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f)),
      (102L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.annTopK(emb, nq = 1, k = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 100L), (2, 101L)))
  }

  test("autoNlist: √N-scaled with a floor of 8; nlist=0 derives it") {
    import spark.implicits._
    assert(Similarity.autoNlist(36) == 8)    // floor
    assert(Similarity.autoNlist(500) == 23)  // ceil(√500)
    assert(Similarity.autoNlist(20000) == 142)
    assert(Similarity.autoNlist(1000000000L) == 31623)
    // at N=64 the derived value hits the floor exactly, so nlist=0 must
    // equal an explicit nlist=8 run byte-for-byte
    val rnd = new scala.util.Random(5)
    val emb = (0L until 64L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val auto = Similarity.semanticDuplicates(emb, 0.0).collect().toSeq
    val pinned = Similarity.semanticDuplicates(emb, 0.0, nlist = 8)
      .collect().toSeq
    assert(auto == pinned)
  }

  test("annTopKLsh multi-probe: recall vs exact is monotone in nprobe") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val emb = (0L until 150L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.annTopK(emb, nq = 5, k = 3))
    val single = pairs(Similarity.annTopKLsh(emb, nq = 5, k = 3, nprobe = 1))
    val multi = pairs(Similarity.annTopKLsh(emb, nq = 5, k = 3, nprobe = 7))
    val full = pairs(Similarity.annTopKLsh(emb, nq = 5, k = 3, nprobe = 22))
    val rs = (single & exact).size
    val rm = (multi & exact).size
    val rf = (full & exact).size
    // a larger margin-ranked probe set can only add buckets: recall grows
    assert(rm >= rs, s"multi-probe recall $rm < single-probe $rs")
    assert(rf >= rm, s"2-flip recall $rf < 1-flip-range recall $rm")
    assert(rm > 0)
    // every 1-/2-bit perturbation probed at tiny scale: most of the truth
    assert(rf >= exact.size / 2, s"nprobe=22 recall $rf/${exact.size}")
  }

  test("LSH bucket width derives from the corpus (autoBits); derived " +
      "and widened paths stay well-formed") {
    import spark.implicits._
    import graft.pipelines.HyperplaneLsh
    // expected bucket population ~targetBucket: 2^bits ≈ n/64
    assert(HyperplaneLsh.autoBits(64L * 64) == 6)
    assert(HyperplaneLsh.autoBits(64L * 256) == 8)
    assert(HyperplaneLsh.autoBits(100) == 2) // clamped floor
    assert(HyperplaneLsh.autoBits(Long.MaxValue) == HyperplaneLsh.MaxBits)
    // widening draws DISJOINT extra planes: plane (t, j<Bits) unchanged
    for (t <- 0 until HyperplaneLsh.Tables; j <- 0 until HyperplaneLsh.Bits)
      assert(HyperplaneLsh.weight(t, j, 0) ==
        ((((t.toLong * HyperplaneLsh.Bits + j) * 64) * 2654435761L)
          % 1000003L) - 501001L)
    val extra = (for (t <- 0 until HyperplaneLsh.Tables;
      j <- HyperplaneLsh.Bits until 10) yield (t, j)).map {
      case (t, j) => (0 until 4).map(k => HyperplaneLsh.weight(t, j, k)) }
    assert(extra.distinct.length == extra.length, "extra planes collide")
    // derived-bits ANN on a small corpus: nprobe clamps to the narrow
    // width's ceiling, output stays a valid dense top-k
    val rnd = new scala.util.Random(29)
    val emb = (0L until 150L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val auto = Similarity.annTopKLsh(emb, nq = 4, k = 3, bits = 0).collect()
    assert(auto.nonEmpty)
    auto.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
      assert(rows.forall(_.getLong(2) != q))
    }
    // widened path (bits=8 > the pinned 6) runs on the same corpus
    val wide = Similarity.annTopKLsh(emb, nq = 4, k = 3, bits = 8).collect()
    assert(wide.forall(r => r.getLong(2) != r.getLong(0)))
  }

  test("LSH table count derives from the corpus (autoTables); extra " +
      "tables draw disjoint planes and only widen the candidate set") {
    import spark.implicits._
    import graft.pipelines.HyperplaneLsh
    // each doubling of expected bucket population past ~16 adds a table
    assert(HyperplaneLsh.autoTables(500, 5) == 4)   // pop 15.6: gate shape
    assert(HyperplaneLsh.autoTables(2000, 5) == 6)  // pop 62.5: +2
    assert(HyperplaneLsh.autoTables(4096, 5) == 7)  // pop 128 exactly: +3
    assert(HyperplaneLsh.autoTables(4100, 5) == 8)  // just past 128: +4
    assert(HyperplaneLsh.autoTables(Long.MaxValue, 5) ==
      HyperplaneLsh.MaxTables) // clamped
    // activation thresholds invert the derivation exactly: table t is
    // active iff count > tableActivation(t) iff autoTables(count) > t —
    // the contract the static DuckDB twin's count-gated branches rely on
    for (t <- 0 until HyperplaneLsh.MaxTables;
         n <- Seq(100L, 500L, 513L, 1024L, 1025L, 2000L, 2048L, 5000L)) {
      val active = n > HyperplaneLsh.tableActivation(t, 5)
      assert(active == (HyperplaneLsh.autoTables(n, 5) > t),
        s"threshold/derivation disagree at t=$t n=$n")
    }
    // extra tables (t >= Tables) draw planes from a DISJOINT index range:
    // no collision with any base table's plane at any width
    val baseIdx = (for (t <- 0 until HyperplaneLsh.Tables;
      j <- 0 until HyperplaneLsh.MaxBits)
      yield (0 until 4).map(k => HyperplaneLsh.weight(t, j, k))).toSet
    val extraIdx = (for (t <- HyperplaneLsh.Tables until HyperplaneLsh.MaxTables;
      j <- 0 until HyperplaneLsh.MaxBits)
      yield (0 until 4).map(k => HyperplaneLsh.weight(t, j, k))).toSet
    assert((baseIdx & extraIdx).isEmpty, "extra-table planes collide")
    assert(extraIdx.size ==
      (HyperplaneLsh.MaxTables - HyperplaneLsh.Tables) * HyperplaneLsh.MaxBits)
    // more tables can only add candidates: recall vs exact is monotone
    val rnd = new scala.util.Random(41)
    val emb = (0L until 200L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.annTopK(emb, nq = 5, k = 3))
    val t4 = (pairs(Similarity.annTopKLsh(emb, nq = 5, k = 3, tables = 4))
      & exact).size
    val t6 = (pairs(Similarity.annTopKLsh(emb, nq = 5, k = 3, tables = 6))
      & exact).size
    assert(t6 >= t4, s"6-table recall $t6 < 4-table $t4")
  }

  test("annTopKLsh 3-flip probe expansion: past the 2-flip ceiling the " +
      "probe list keeps growing and recall stays monotone") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val emb = (0L until 300L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.annTopK(emb, nq = 5, k = 3))
    // width 5: {} + 5 singles + 10 pairs = 16; 22 reaches 6 triples;
    // 26 is the full 3-flip ceiling (clamp target for anything larger)
    val r16 = (pairs(Similarity.annTopKLsh(emb, nq = 5, k = 3, nprobe = 16))
      & exact).size
    val r22 = (pairs(Similarity.annTopKLsh(emb, nq = 5, k = 3, nprobe = 22))
      & exact).size
    val r26 = (pairs(Similarity.annTopKLsh(emb, nq = 5, k = 3, nprobe = 26))
      & exact).size
    val rClamped = (pairs(
      Similarity.annTopKLsh(emb, nq = 5, k = 3, nprobe = 999)) & exact).size
    assert(r22 >= r16, s"3-flip probes lost recall: $r22 < $r16")
    assert(r26 >= r22)
    assert(rClamped == r26, "nprobe past the 3-flip ceiling must clamp")
  }

  test("autoMrlCand: corpus-scaled rerank depth with the 30k floor") {
    assert(Similarity.autoMrlCand(500, 5) == 150)   // 30·k dominates
    assert(Similarity.autoMrlCand(2000, 5) == 400)  // ⌈N/5⌉ dominates
    assert(Similarity.autoMrlCand(2000, 20) == 600) // larger ask wins
    assert(Similarity.autoMrlCand(1001, 5) == 201)  // ceil, not floor
  }

  test("autoMrlIvfCand: probed-population-scaled pool with the 30k floor") {
    // gate corpora: floor dominates (probed pop 250, half = 125 < 150)
    assert(Similarity.autoMrlIvfCand(500, 5, nlist = 8, nprobe = 4) == 150)
    // sf0.1: half the expected probed population 4·2000/8 = 1000
    assert(Similarity.autoMrlIvfCand(2000, 5, nlist = 8, nprobe = 4) == 500)
    // ceil, not floor
    assert(Similarity.autoMrlIvfCand(2001, 5, nlist = 8, nprobe = 4) == 501)
    // deployment sizing: nlist ∝ √N makes the pool sublinear — at 1e8
    // vectors the pool is ~half of nprobe·√N, a vanishing fraction
    val n = 100000000L
    val nl = Similarity.autoNlist(n)
    val pool = Similarity.autoMrlIvfCand(n, 5, nl, 4)
    assert(pool.toDouble / n < 0.001, s"pool $pool not sublinear at N=$n")
  }

  test("annTopKMrlIvf: rerank pool covering the probed population " +
      "degenerates to the IVF rung regardless of prefix width") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val ivf = Similarity.annTopKIvf(emb, nq = 3, k = 3, nlist = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // cand >= corpus: stage 2 exact-reranks EVERYTHING stage 1 saw, so
    // the truncated prefix ranking cannot lose a probed-cell candidate
    // and the output is exactly the IVF rung's
    val composed = Similarity.annTopKMrlIvf(emb, nq = 3, k = 3, nlist = 4,
        nprobe = 2, dims = 4, cand = 60)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(composed == ivf)
    // derived pool (cand <= 0) is deterministic across invocations
    def derived() = Similarity.annTopKMrlIvf(emb, nq = 3, k = 3, nlist = 4,
      nprobe = 2, dims = 4).collect().toSeq
    assert(derived() == derived())
  }

  test("recallAuditAppended: appended cell imbalance is the leading " +
      "indicator — it reads at or above the fresh rebuild's") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    // drifted growth: the second half of the corpus (appended against
    // build-time centroids) is drawn from a shifted distribution, so
    // stale centroids must absorb the new mass unevenly
    val emb = (0L until 120L).map { i =>
      val shift = if (i >= 60L) 0.4f else 0.0f
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f + shift))
    }.toDF("vec_id", "embedding")
    val rows = Similarity.recallAuditAppended(emb, nq = 4, k = 3, nlist = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("cells_appended") >= rows("cells_fresh"),
      s"appended imbalance ${rows("cells_appended")} below fresh " +
        s"${rows("cells_fresh")} — the rebuild-trigger claim inverted")
    assert(rows.contains("ivf_appended") && rows.contains("ivf_fresh"))
  }

  test("annTopKMrl: full-width prefix degenerates to exact; truncated " +
    "prefix with wide rerank still recovers the exact top-k") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val emb = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.annTopK(emb, nq = 3, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // dims = full width: stage 1 IS the exact ranking
    val full = Similarity.annTopKMrl(emb, nq = 3, k = 3, dims = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(full == exact)
    // dims = 4 with a rerank pool wider than the corpus: candidates
    // cover everything, so the exact rerank recovers the exact answer
    val trunc = Similarity.annTopKMrl(emb, nq = 3, k = 3, dims = 4, cand = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(trunc == exact)
  }

  test("annTopKPq: a rerank pool covering the corpus recovers the " +
    "exact top-k; autoPqCand derives the pool") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val emb = (0L until 40L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.annTopK(emb, nq = 3, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // ADC stage ranks the whole corpus; cand >= N makes the exact
    // rerank see everything, so the answer must be exact regardless
    // of quantization error
    val wide = Similarity.annTopKPq(emb, nq = 3, k = 3, m = 4, ksub = 8,
        cand = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(wide == exact)
    // derived pool: the 12k floor dominates small corpora, the N/20
    // fraction takes over at scale
    assert(Similarity.autoPqCand(40L, 5) == 60)
    assert(Similarity.autoPqCand(10000L, 5) == 500)
    // the m=16 gate default divides the 64-dim corpus; a non-divisor
    // fails loudly
    val ex = intercept[IllegalArgumentException] {
      Similarity.annTopKPq(emb, nq = 1, k = 1, m = 5)
    }
    assert(ex.getMessage.contains("divide"))
  }

  test("annTopKPqIvf: nprobe == nlist with a corpus-wide pool " +
    "degenerates to exact; narrow probe stays inside probed cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val emb = (0L until 48L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.annTopK(emb, nq = 3, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val all = Similarity.annTopKPqIvf(emb, nq = 3, k = 3, nlist = 4,
        nprobe = 4, m = 4, ksub = 8, cand = 48)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(all == exact)
    // narrow probe: every reported neighbor must live in a probed cell
    // (subset-of-composition sanity — the IVF scoping is real)
    val ivf = Similarity.annTopKIvf(emb, nq = 3, k = 5, nlist = 4,
        nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pqIvf = Similarity.annTopKPqIvf(emb, nq = 3, k = 5, nlist = 4,
        nprobe = 1, m = 4, ksub = 8, cand = 48)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pqIvf == ivf,
      "with a corpus-wide pool both rungs reduce to exact-within-probed-cells")
  }

  test("annTopKIvf with nprobe == nlist degenerates to exact brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    // probing every cell scores every non-self vector → identical ranking
    val ivf = Similarity.annTopKIvf(emb, nq = 4, k = 3, nlist = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val bf = Similarity.annTopK(emb, nq = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(ivf.toSeq == bf.toSeq)
  }

  test("annTopKIvf narrow probe scores only probed cells") {
    import spark.implicits._
    // two well-separated clusters around +x and +y: queries stay inside
    // their own cluster's cell when nprobe = 1
    val rnd = new scala.util.Random(3)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.05f)
    // even ids +x, odd ids +y → the two seed centroids (vec 0, vec 1)
    // start one per cluster
    val xs = (0L until 40L by 2).map(i => (i, jitter(Array(1f, 0f, 0f, 0f))))
    val ys = (1L until 40L by 2).map(i => (i, jitter(Array(0f, 1f, 0f, 0f))))
    val emb = (xs ++ ys).toDF("vec_id", "embedding")
    val got = Similarity.annTopKIvf(emb, nq = 2, k = 5, nlist = 2, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.nonEmpty)
    // each query's neighbors all come from its own cluster's cell
    assert(got.forall { case (q, n) => n % 2 == q % 2 })
  }

  test("ivfCentroids trainFraction: deterministic, valid shape, 1.0 = unsampled") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0L until 80L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    // trainFraction = 1.0 must be byte-identical to the default path
    val full = Similarity.annTopKIvf(emb, nq = 3, k = 3, nlist = 4, nprobe = 2)
      .collect().toSeq
    val fullExplicit = Similarity.annTopKIvf(emb, nq = 3, k = 3, nlist = 4,
      nprobe = 2, trainFraction = 1.0).collect().toSeq
    assert(full == fullExplicit)
    // sampled training is deterministic across invocations (hash gate,
    // no RNG) and still yields a well-formed gated top-k
    def sampled() = Similarity.annTopKIvf(emb, nq = 3, k = 3, nlist = 4,
      nprobe = 2, trainFraction = 0.5).collect().toSeq
    val s1 = sampled()
    assert(s1 == sampled())
    val byQuery = s1.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    for ((q, rows) <- byQuery) {
      assert(rows.map(_.getInt(1)).sorted == (1 to rows.length).toList)
      assert(rows.forall(r => r.getLong(2) != q))
      assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    }
    // the sampled ladder + SemDeDup variants stay well-formed too
    val q8 = Similarity.annTopKQ8Ivf(emb, nq = 2, k = 3, nlist = 4,
      nprobe = 2, trainFraction = 0.5).collect()
    assert(q8.nonEmpty && q8.forall(r => r.getLong(2) != r.getLong(0)))
    val sem = Similarity.semanticDuplicates(emb, 0.0, nlist = 4,
      trainFraction = 0.5).collect()
    // one verdict row per vector; a representative is always a
    // smaller-id vector
    assert(sem.length == emb.count())
    assert(sem.filter(!_.getBoolean(4)).forall(r => r.getLong(2) < r.getLong(0)))
  }

  test("semanticDuplicates: per-vector verdicts, reps stay in-cell, " +
      "output is O(corpus) not O(dup²)") {
    import spark.implicits._
    // two well-separated clusters (+x, +y); near-identical twins inside
    // each cluster must collapse onto one representative, vectors from
    // different clusters must not — both by the cell cut AND the
    // cosine threshold.
    val rnd = new scala.util.Random(5)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.02f)
    val xs = (0L until 20L by 2).map(i => (i, jitter(Array(1f, 0f, 0f, 0f))))
    val ys = (1L until 20L by 2).map(i => (i, jitter(Array(0f, 1f, 0f, 0f))))
    val emb = (xs ++ ys).toDF("vec_id", "embedding")
    val got = Similarity.semanticDuplicates(emb, 0.9, nlist = 2).collect()
    // a mass-duplicated corpus emits ONE row per vector — the r8 pair
    // output here would have been 2·C(10,2) = 90 rows
    assert(got.length == 20)
    val byId = got.map(r => r.getLong(0) ->
      ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(4)))).toMap
    // each cluster keeps exactly its smallest member; everything else
    // is a duplicate of it (complete within-cluster similarity)
    assert(byId(0L)._3 && byId(1L)._3)
    for (i <- 2L until 20L) {
      val (_, rep, keep) = byId(i)
      assert(!keep, s"vec $i should be a duplicate")
      // representatives never straddle the clusters (even +x, odd +y)
      assert(rep.contains(i % 2), s"vec $i rep $rep")
    }
  }

  test("plan audit: incremental minhash and estimate stay on bucket keys") {
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "f g h i j"),
      (4L, "a b c d e"))
    // delta-vs-index probe and the estimate's slot joins are all
    // equi-joins on (band, sig) / doc_id — cartesian/BNLJ would be the
    // all-pairs plan the banding exists to avoid
    for (df <- Seq(
      Dedup.incrementalMinhash(spark,
        d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
        d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)),
      Dedup.minhashEstimate(spark, d))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("plan audit: dedup pair generation and semantic dedup never go cartesian") {
    import spark.implicits._
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "f g h i j"))
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 0.1f)))
      .toDF("vec_id", "embedding")
    // LSH pairs + near-dedup: every join is an equi-join on a band/cid
    // bucket key — a cartesian/BNLJ here would be the O(n²) plan the
    // banding exists to avoid.
    for (df <- Seq(Dedup.minhashLsh(spark, d), Dedup.nearDedupCorpus(spark, d))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
    // Semantic dedup: the ONLY non-equi join allowed is the bounded
    // nearest-cell crossJoin against the broadcast nlist-row centroid
    // table; the pair-scoring join must be an equi-join on cid.
    val sem = Similarity.semanticDuplicates(emb, 0.5, nlist = 2)
    val planStr = sem.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct"), planStr)
    // the pair-scoring join is a hash equi-join keyed on the cell id
    assert(planStr.contains("HashJoin [cid"), planStr)
  }

  test("vocabulary: tf/df closed forms, minCount floor, size cap, " +
      "deterministic tie ranking") {
    import spark.implicits._
    val d = docs((1L, "b b a"), (2L, "b a c"), (3L, "a"))
    // a: tf 3 df 3; b: tf 3 df 2; c: tf 1 df 1
    val got = TextMetrics.vocabulary(d, minCount = 2, maxSize = 10)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // c is floored out by minCount; the a/b tf tie breaks on the term
    assert(got == Seq((1L, "a", 3L, 3L), (2L, "b", 3L, 2L)))
    // the size cap keeps the head of the ranking
    val capped = TextMetrics.vocabulary(d, minCount = 1, maxSize = 1)
      .collect().map(_.getString(1)).toSeq
    assert(capped == Seq("a"))
  }

  test("bigramNll: closed forms — deterministic order scores zero, " +
      "rare continuations score ln of the branching") {
    import spark.implicits._
    // corpus: "a b" x3 and "a c" x1 -> c_start(a)=4, c(a,b)=3, c(a,c)=1
    val d = docs((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"),
      (5L, "x")) // single token: no bigram, no row
    val got = TextMetrics.bigramNll(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def micro(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 1-3: one bigram (a,b): -ln(3/4)
    val ab = micro(-math.log(3.0 / 4.0))
    assert(got(1L) == ((1L, ab)) && got(3L) == ((1L, ab)))
    // doc 4: (a,c): -ln(1/4) = ln 4
    assert(got(4L) == ((1L, micro(-math.log(1.0 / 4.0)))))
    assert(!got.contains(5L))
    // a corpus whose every continuation is forced scores exactly zero
    val det = docs((1L, "p q r"), (2L, "p q r"))
    val z = TextMetrics.bigramNll(det).collect()
    assert(z.forall(_.getDouble(2) == 0.0)) // c(a,b) == c_start(a) ∀
  }

  test("plan audit: bigramNll and stratified cutoff join shapes") {
    import spark.implicits._
    val d = docs((1L, "a b c a b"), (2L, "b c d"), (3L, "a b"))
    // bigram NLL: the bigram stream joins its two count dimensions as
    // hash equi-joins on (a, b) / (a) — never cartesian, and never a
    // positional self-join of the token stream (the zip is in-plan)
    val bg = TextMetrics.bigramNll(d)
    val bgPlan = bg.queryExecution.executedPlan.toString
    assert(!bgPlan.contains("CartesianProduct"), bgPlan)
    assert(!bgPlan.contains("BroadcastNestedLoopJoin"), bgPlan)
    // stratified cutoff: the one-row-per-source cutoff dimension joins
    // broadcast on the stratum key
    val ds = Seq((1L, "clean readable text", "web"),
      (2L, "zzz ###", "spam")).toDF("doc_id", "text", "source")
    val qc = TextMetrics.qualityCutoffBySource(ds, 0.5)
    val qcPlan = qc.queryExecution.executedPlan.toString
    assert(qcPlan.contains("BroadcastHashJoin"), qcPlan)
    assert(!qcPlan.contains("CartesianProduct"), qcPlan)
  }

  test("plan audit: decontaminate/tfidf/q8-ANN never go cartesian; rerank joins are hash equi-joins") {
    import spark.implicits._
    val d = docs((1L, "a b c d e"), (7L, "a b c d e"), (2L, "f g h i j"))
    val dec = Dedup.benchmarkContamination(spark,
      d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7))
    val p1 = dec.queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoopJoin"), p1)
    // tfidf: the only permitted non-equi join is the 1-row corpus-count
    // broadcast; the tf x df join must stay an equi-join on term.
    val p2 = TextMetrics.tfidf(d).queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct"), p2)
    assert(p2.contains("HashJoin [term"), p2)
    // q8 ANN: candidate scan broadcasts only the <=nq-row query side;
    // the exact-rerank joins are hash equi-joins on the candidate keys.
    val emb = (0L until 20L).map(i =>
      (i, Array.fill(4)((i % 5).toFloat + 1f))).toDF("vec_id", "embedding")
    val p3 = Similarity.annTopKQ8(emb, nq = 2, k = 2, cand = 5)
      .queryExecution.executedPlan.toString
    assert(!p3.contains("CartesianProduct"), p3)
    assert(p3.contains("HashJoin [neighbor_id") ||
      p3.contains("HashJoin [vec_id"), p3)
  }

  test("nearDedupCorpus keeps the min id per cluster and all unpaired docs") {
    val text = "one two three four five six seven eight nine ten"
    val d = docs((1L, text), (2L, text), (5L, text),
      (3L, "a completely different set of words to stand alone here"),
      (4L, "yet another unrelated document body with its own phrasing"))
    val got = Dedup.nearDedupCorpus(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // {1,2,5} cluster -> keep 1 with 2 removed; 3 and 4 unpaired
    assert(got.toSeq == Seq((1L, 2L), (3L, 0L), (4L, 0L)))
  }

  test("repetitionSignals: closed-form ratios, empty doc scores zero") {
    // "a a a b": 4 tokens, 2 types -> ttr 0.5; top token 'a' x3 -> 0.75;
    // bigrams [a a, a a, a b]: 3 total, 2 distinct -> dup frac 1/3.
    val d = docs((1L, "a a a b"), (2L, "w x y z"), (3L, "  "))
    val got = TextMetrics.repetitionSignals(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 4L, 0.5, 0.75, 0.333333),
      (2L, 4L, 1.0, 0.25, 0.0),
      (3L, 0L, 0.0, 0.0, 0.0)))
  }

  test("typePercentiles: interpolated quantiles per type") {
    import spark.implicits._
    import graft.streaming.EventPipelines
    // values 1..5 for 'a': p50=3, p90=4.6, p99=4.96 (cents *100)
    val ev = ((1 to 5).map(i => ("a", i.toDouble)) :+ ("b", 7.0))
      .zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, new java.sql.Timestamp(1000L * i), i.toLong, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventPipelines.typePercentiles(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("a", 5L, 300.0, 460.0, 496.0),
      ("b", 1L, 700.0, 700.0, 700.0)))
  }

  test("cleanCorpus gates language/quality and collapses byte variants") {
    import spark.implicits._
    import graft.pipelines.Dedup
    val good = "the cat and the dog sat in the house with a hat and a map " +
      "and the bird was on the roof of the barn all day long"
    val docs = Seq(
      (1L, good),
      (2L, "  " + good.toUpperCase + "\t"), // byte variant of doc 1
      (3L, "el gato y la casa de un perro que en la calle es un dia"),
      (4L, "x")).toDF("doc_id", "text") // quality below threshold
    val got = Dedup.cleanCorpus(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // doc 3 fails the language gate, doc 4 the quality gate; docs 1+2
    // normalize identically and collapse to keep_id 1 with 2 copies
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("subtoken count splits alpha runs, digit runs and marks") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val df = Seq("Hello, world42!", "", "a-b").toDF("t")
      .select(TF.subtokenCount(col("t")).as("n"))
    // hello , world 42 ! -> 5 ; "" -> 0 ; a - b -> 3
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(5, 0, 3))
  }

  test("resize stub downsamples payload bytes deterministically") {
    val d = docs((1L, "abcdefghij"))
    val out = Multimodal.resizeAll(spark, Multimodal.withPayload(d), 3)
      .collect().head
    assert(new String(out.payload, "UTF-8") == "adgj")
  }

  test("tfidf: corpus-wide terms weigh zero, rare terms weigh tf*ln(N/df)") {
    val d = docs((1L, "apple apple banana"), (2L, "apple cherry"),
      (3L, "apple dates"))
    val got = TextMetrics.tfidf(d).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // 'apple' appears in all 3 docs -> idf = ln(1) = 0
    assert(got((1L, "apple")) == 0.0 && got((2L, "apple")) == 0.0)
    // 'banana' tf=1 df=1 -> ln(3)
    assert(math.abs(got((1L, "banana")) - math.log(3.0)) < 1e-6)
    // 'apple' tf=2 in doc 1 still 0; df column sanity via schema
    assert(TextMetrics.tfidf(d).columns.toSeq ==
      Seq("doc_id", "term", "tf", "df", "tfidf"))
  }

  test("mixtureReport aggregates per (source, lang) with exact micro-mean") {
    import spark.implicits._
    val d = Seq((1L, "good text here", "web", "en"),
      (2L, "more good text", "web", "en"),
      (3L, "otra cosa", "books", "es"))
      .toDF("doc_id", "text", "source", "lang")
    val got = TextMetrics.mixtureReport(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("web", "en")) == ((2L, 6L)))
    assert(got(("books", "es")) == ((1L, 2L)))
  }

  test("quotaPerGroup draws exactly n per group, deterministically") {
    import spark.implicits._
    val d = (1L to 30L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd")).toDF("doc_id", "source")
    val s1 = graft.pipelines.Sampling
      .quotaPerGroup(spark, d, "source", "doc_id", 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(s1.count(_._1 == "even") == 4 && s1.count(_._1 == "odd") == 4)
    assert(s1.filter(_._1 == "even").map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // deterministic: a second draw is identical
    val s2 = graft.pipelines.Sampling
      .quotaPerGroup(spark, d, "source", "doc_id", 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(s1.toSeq == s2.toSeq)
  }

  test("temperatureSample: sqrt-temperature quotas, alpha=1 proportional") {
    import spark.implicits._
    // 16 "big" docs vs 4 "small": alpha=0.5 weights 4:2, so total=6
    // splits 4/2 — sqrt temperature halves the big source's dominance
    // (proportional would be 4.8/1.2).
    val d = ((1L to 16L).map(i => (i, "big")) ++
      (101L to 104L).map(i => (i, "small"))).toDF("doc_id", "source")
    val t = graft.pipelines.Sampling
      .temperatureSample(spark, d, "source", "doc_id", total = 6, alpha = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(t.count(_._1 == "big") == 4 && t.count(_._1 == "small") == 2)
    assert(t.forall(r => if (r._1 == "big") r._3 == 4L else r._3 == 2L))
    // alpha=1: quotas proportional -> floor(4.8+.5)=5 / floor(1.2+.5)=1
    val p = graft.pipelines.Sampling
      .temperatureSample(spark, d, "source", "doc_id", total = 6, alpha = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(p.count(_._1 == "big") == 5 && p.count(_._1 == "small") == 1)
  }

  test("qualityCutoff keeps exactly the rows clearing the percentile") {
    import spark.implicits._
    // qualities are driven by token count (length saturation): doc 4
    // has the most tokens → highest quality; cutoff at 0.75 over 4
    // docs = interpolated between ranks 3 and 4
    val d = Seq((1L, "a"), (2L, "a b c"), (3L, "a b c d e f"),
      (4L, "a b c d e f g h i j k l m n o p q r s t u v"))
      .toDF("doc_id", "text")
    val got = TextMetrics.qualityCutoff(d, 0.75).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // only the top doc clears an interpolated 75th percentile here
    assert(got.map(_._1).toSeq == Seq(4L))
    assert(got.head._2 >= got.head._3) // survivor clears the cutoff
    // halving q admits more docs — the threshold is truly dynamic
    val loose = TextMetrics.qualityCutoff(d, 0.25).collect().length
    assert(loose >= 3)
  }

  test("weightedSample: heavier rows win more often; draw is reproducible") {
    import spark.implicits._
    // 50 heavy rows (w=10) vs 50 light (w=0.1): a 20-draw should be
    // dominated by heavy ids — P(light beating heavy) is tiny at this
    // weight ratio, deterministic given the fixed hash.
    val d = ((1L to 50L).map(i => (i, 10.0)) ++
      (101L to 150L).map(i => (i, 0.1))).toDF("doc_id", "w")
    val s1 = graft.pipelines.Sampling
      .weightedSample(spark, d, "doc_id", col("w"), 20).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val heavy = s1.count(_._1 <= 50L)
    assert(heavy >= 18, s"expected heavy dominance, got $heavy/20 heavy")
    assert(s1.map(_._2).toSeq == (1L to 20L)) // dense ranks
    val s2 = graft.pipelines.Sampling
      .weightedSample(spark, d, "doc_id", col("w"), 20).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(s1.toSeq == s2.toSeq) // reproducible
  }

  test("topKPerGroupAgg equals the window formulation on adversarial data") {
    import spark.implicits._
    // many ties, metric collisions, and a group saturating the buffer
    val d = ((1L to 200L).map(i => (i, "big", (i % 7).toDouble)) ++
      (500L to 503L).map(i => (i, "small", 1.0)))
      .toDF("doc_id", "source", "q").repartition(7)
    val win = graft.pipelines.Sampling
      .topKPerGroup(d, "source", "doc_id", col("q"), 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val agg = graft.pipelines.Sampling
      .topKPerGroupAgg(spark, d, "source", "doc_id", col("q"), 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(win.toSeq == agg.toSeq)
    assert(win.count(_._1 == "big") == 5 && win.count(_._1 == "small") == 4)
  }

  test("tokenBudgetPerGroupSliced equals the window formulation when " +
      "one hot group straddles many range slices") {
    import spark.implicits._
    // 'hot' holds ~90% of the rows, so with 5 slices it MUST span
    // several range partitions — the cross-slice offset path is
    // load-bearing, not a no-op; metric ties and tiny groups included
    val d = ((1L to 450L).map(i => (i, "hot", (i % 13).toDouble, i % 9 + 1)) ++
      (1000L to 1040L).map(i => (i, "cold", (i % 5).toDouble, i % 7 + 1)) ++
      Seq((2000L, "one", 1.0, 3L)))
      .toDF("doc_id", "source", "q", "toks").repartition(8)
    for (budget <- Seq(5L, 100L, 100000L)) {
      val win = graft.pipelines.Sampling
        .tokenBudgetPerGroup(d, "source", "doc_id", col("q"), col("toks"),
          budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val sli = graft.pipelines.Sampling
        .tokenBudgetPerGroupSliced(d, "source", "doc_id", col("q"),
          col("toks"), budget, slices = 5).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(win.toSeq == sli.toSeq, s"budget=$budget")
    }
    // the big-budget case must keep everything — guards against the
    // decomposition silently dropping a slice
    val all = graft.pipelines.Sampling
      .tokenBudgetPerGroupSliced(d, "source", "doc_id", col("q"),
        col("toks"), 100000L, slices = 5).count()
    assert(all == 492L)
  }

  test("topKPerGroup keeps the k best rows per group, id tiebreak") {
    import spark.implicits._
    val d = Seq((1L, "a", 0.9), (2L, "a", 0.5), (3L, "a", 0.7),
      (4L, "b", 0.5), (5L, "b", 0.5), (6L, "b", 0.4))
      .toDF("doc_id", "source", "q")
    val got = graft.pipelines.Sampling
      .topKPerGroup(d, "source", "doc_id", col("q"), 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // a: 1 (.9) then 3 (.7); b: tie at .5 → doc 4 before doc 5
    assert(got.toSeq == Seq(("a", 1L, 1L), ("a", 3L, 2L),
      ("b", 4L, 1L), ("b", 5L, 2L)))
  }

  test("containment flags a quoted doc that jaccard misses") {
    import spark.implicits._
    val quoted = "one two three four five six"
    val d = Seq(
      (1L, quoted), // 4 shingles, all inside doc 2
      (2L, s"$quoted and then a long tail of completely different words " +
        "keeps going on and on with more and more material"),
      (3L, "unrelated other text entirely here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containment(d, threshold = 0.9).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cont.keySet == Set((1L, 2L))) // only the quoted→container way
    assert(cont((1L, 2L)) == 1.0)
    // jaccard at the same corpus stays far below 0.9 for the pair
    val jac = Dedup.ngramJaccard(d, threshold = 0.0)
      .select("a", "b", "jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(jac((1L, 2L)) < 0.5)
  }

  test("sourceQuoteMatrix counts shared winnow fingerprints per pair") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, s"$shared own tail one here", "s1"),
      (2L, s"$shared some other ending text", "s2"),
      (3L, "completely unrelated content in this one", "s3"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceQuoteMatrix(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // the 8-token shared run leaves >= 1 shared fingerprint for (s1,s2)
    assert(got.keySet.contains(("s1", "s2")) && got(("s1", "s2")) >= 1L)
    // s3 shares nothing with either
    assert(!got.keySet.exists(p => p._1 == "s3" || p._2 == "s3"))
  }

  test("curate composes normalize → lang gate → dedup → temperature draw") {
    import spark.implicits._
    val d = Seq(
      (1L, "the of and alpha", "a"),
      (2L, "The  OF and alpha", "a"), // normalizes to doc 1 → dedup'd
      (3L, "the of and beta", "a"),
      (4L, "el la de y que", "b"),    // es → dropped by the lang gate
      (5L, "the of and gamma", "b"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.curate(spark, d, minQuality = 0.0, lang = "en",
      total = 3, alpha = 0.5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // survivors: a = {1, 3}, b = {5}; sqrt-weights 1.414:1 → quotas 2/1
    assert(got.map(_._2).toSet == Set(1L, 3L, 5L))
    assert(got.filter(_._1 == "a").map(_._3).forall(_ == 2L))
    assert(got.filter(_._1 == "b").map(_._3).forall(_ == 1L))
  }

  test("dedupIncremental drops cross-corpus and in-batch duplicates") {
    import spark.implicits._
    val existing = Seq((1L, "known document text"), (2L, "another old one"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "Known  Document text"), // normalizes to an existing doc → drop
      (11L, "fresh content here"),
      (12L, "fresh content here"),   // in-batch dup → min id 11 survives
      (13L, "entirely new again"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupIncremental(spark, existing, incoming)
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(11L, 13L))
  }

  test("chunkTokens: strided overlap, short tail, empty docs drop") {
    import spark.implicits._
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5"), (2L, "")).toDF("doc_id", "text")
    val got = graft.pipelines.Packing.chunkTokens(d, size = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t2 t3 t4 t5"),
      (1L, 2L, 2L, "t4 t5")))
  }

  test("winnow: shared long substrings share a fingerprint hash; short docs") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, s"one two $shared three"),
      (2L, s"$shared completely different ending here"),
      (3L, "tiny doc"), // 2 tokens -> 0 shingles at k=3 -> no rows
      (4L, "just four tokens here")) // 2 shingles < w -> 1 fingerprint
      .toDF("doc_id", "text")
    val got = Dedup.winnow(spark, d, k = 3, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = got.groupBy(_._1)
    // winnowing guarantee: the 8-token shared run (>= w + k - 1 = 6)
    // forces at least one common selected hash
    val h1 = byDoc(1L).map(_._3).toSet
    val h2 = byDoc(2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty)
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).length == 1) // whole-doc window for short docs
    // density: selections are a strict subset of the shingle stream
    assert(byDoc(1L).length < 9) // doc 1 has 9 shingles
  }

  test("winnow: over-limit documents auto-chunk, and the chunked " +
    "fingerprints equal the unchunked computation exactly") {
    // The packed min is only a total order while the packed position
    // stays < 2^posBits, so past that the operator slices the gram
    // stream into overlapping chunks and packs CHUNK-LOCAL positions
    // (r15 raised instead — partial, and a 100 TB corpus WILL contain
    // million-token docs). Local order == global order within a
    // chunk, so the selections must be IDENTICAL to the one-chunk
    // computation. Tested at posBits=4 (16-gram chunks, stride 13)
    // over docs well past the limit — multi-boundary, repeated-token,
    // shared-substring, and short-doc shapes — against posBits=20
    // (single-chunk at this size) as the reference.
    import spark.implicits._
    val run = (0 until 8).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (1L, (0 until 50).map(i => s"w$i").mkString(" ")),  // 3 chunks
      (2L, (0 until 50).map(i => s"w${i % 7}").mkString(" ")), // ties
      (3L, (0 until 30).map(i => s"a$i").mkString(" ") + " " + run),
      (4L, run + " " + (0 until 30).map(i => s"b$i").mkString(" ")),
      (5L, "one two three")) // short doc: single partial window
      .toDF("doc_id", "text")
    def rows(posBits: Int): Seq[(Long, Long, Long)] =
      Dedup.winnowPacked(spark, d, k = 3, w = 4, posBits = posBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    val chunkedFp = rows(4)
    assert(chunkedFp == rows(20),
      "chunked selections must equal the unchunked computation")
    // the winnowing guarantee survives chunking: docs 3 and 4 share
    // an 8-token run (>= w + k - 1 = 6) -> a shared fingerprint hash
    val h3 = chunkedFp.filter(_._1 == 3L).map(_._3).toSet
    val h4 = chunkedFp.filter(_._1 == 4L).map(_._3).toSet
    assert((h3 & h4).nonEmpty, "guarantee lost across chunk boundaries")
  }

  test("winnow: sub-w-gram documents fingerprint even when chunks are " +
    "barely wider than the window (total counted pre-explode)") {
    // ADVICE r16: with w <= posLimit <= 2w-3, a short document's
    // boundary-duplicated rows used to inflate a post-explode per-doc
    // count(*) to >= w, so neither the full-window rule nor the
    // short-doc fallback fired — zero fingerprints for a document the
    // guarantee covers. `total` now counts the PRE-explode gram rows.
    // posBits=2 -> 4-gram chunks, stride 1, w=4: a 3-gram doc (5
    // tokens at k=3) explodes to 6 chunk rows (>= w) but must still
    // emit exactly its whole-document minimum.
    import spark.implicits._
    val d = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    val got = Dedup.winnowPacked(spark, d, k = 3, w = 4, posBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ref = Dedup.winnowPacked(spark, d, k = 3, w = 4, posBits = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.length == 1, s"short doc must emit 1 fingerprint, got $got")
    assert(got == ref, "short-doc fingerprint must match the unchunked run")
  }

  test("charEntropy: closed forms; uniform > skewed > constant") {
    import spark.implicits._
    val d = Seq((1L, "aaaa"), (2L, "abab"), (3L, "aab"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextMetrics.charEntropy(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((4L, 0.0))) // constant string: zero entropy
    // two equal classes: exactly ln 2 (each term pre-rounded to µnats)
    val ln2 = math.rint(0.5 * math.log(2.0) * 1e6) * 2 / 1e6
    assert(got(2L) == ((4L, ln2)))
    // skewed 2:1 entropy < ln 2 < uniform over 3 would be ln 3
    assert(got(3L)._2 > 0.0 && got(3L)._2 < math.log(2.0) + 1e-9)
    assert(!got.contains(4L))
  }

  test("unigramNll: closed-form mean surprise; empty docs drop") {
    import spark.implicits._
    // corpus tokens: a a a b -> p(a)=3/4, p(b)=1/4
    val d = Seq((1L, "a a a"), (2L, "b"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextMetrics.unigramNll(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 has no tokens
    val nllA = math.rint(-math.log(3.0 / 4.0) * 1e6) / 1e6
    val nllB = math.rint(-math.log(1.0 / 4.0) * 1e6) / 1e6
    assert(got(0) == ((1L, 3L, nllA)))
    assert(got(1) == ((2L, 1L, nllB)))
    assert(nllB > nllA) // rare tokens are more surprising
  }

  test("splitByHash is total, disjoint, stable under corpus growth") {
    import spark.implicits._
    val splits = Seq("train" -> 900, "val" -> 50, "test" -> 50)
    val d = (1L to 2000L).toDF("doc_id")
    val got = graft.pipelines.Sampling
      .splitByHash(spark, d, "doc_id", splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // total and disjoint: every id gets exactly one of the three labels
    assert(got.size == 2000 && got.values.toSet.subsetOf(
      Set("train", "val", "test")))
    // proportions track the per-mille weights (hash-uniformity, loose)
    val train = got.values.count(_ == "train")
    assert(train > 1700 && train < 1990, s"train=$train of 2000")
    assert(got.values.count(_ != "train") > 10)
    // growing the corpus never moves an existing id between splits
    val grown = graft.pipelines.Sampling
      .splitByHash(spark, (1L to 4000L).toDF("doc_id"), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, s) => grown(id) == s })
    // bad weights fail loudly
    intercept[IllegalArgumentException] {
      graft.pipelines.Sampling.splitByHash(spark, d, "doc_id",
        Seq("a" -> 500, "b" -> 400))
    }
    // a pre-existing `split` column would silently duplicate — fail loudly
    intercept[IllegalArgumentException] {
      graft.pipelines.Sampling.splitByHash(spark,
        d.withColumn("split", lit("x")), "doc_id", splits)
    }
  }

  test("shuffleByHash is a deterministic permutation; epochs differ by salt") {
    import spark.implicits._
    val d = (1L to 500L).toDF("doc_id")
    val o1 = graft.pipelines.Sampling.shuffleByHash(spark, d, "doc_id")
      .collect().map(_.getLong(0))
    // a permutation of the ids, not the identity order
    assert(o1.sorted.toSeq == (1L to 500L) && o1.toSeq != (1L to 500L).toSeq)
    // deterministic across runs
    val o2 = graft.pipelines.Sampling.shuffleByHash(spark, d, "doc_id")
      .collect().map(_.getLong(0))
    assert(o1.toSeq == o2.toSeq)
    // a different salt is a different epoch permutation
    val e2 = graft.pipelines.Sampling
      .shuffleByHash(spark, d, "doc_id", "|shuffle2")
      .collect().map(_.getLong(0))
    assert(e2.sorted.toSeq == (1L to 500L) && e2.toSeq != o1.toSeq)
    // a pre-existing `sort_key` column would silently duplicate — fail loudly
    intercept[IllegalArgumentException] {
      graft.pipelines.Sampling.shuffleByHash(spark,
        d.withColumn("sort_key", lit(0L)), "doc_id")
    }
  }

  test("benchmarkContamination flags docs whose shingles appear in the bench set") {
    val corpus = docs((1L, "alpha beta gamma delta epsilon"),
      (2L, "totally unrelated fresh words here"))
    val bench = docs((100L, "alpha beta gamma delta epsilon zeta"))
    val got = Dedup.benchmarkContamination(spark, corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    // doc 1: all 3 of its 3-gram shingles appear in the bench doc
    assert(got(1L) == ((3L, 3L, true)))
    assert(got(2L) == ((3L, 0L, false)))
  }

  test("bloom-prefiltered decontamination agrees with the exact operator " +
      "and has no false negatives") {
    val corpus = docs((1L, "alpha beta gamma delta epsilon"),
      (2L, "totally unrelated fresh words here"),
      (3L, "alpha beta gamma but then different tail words"))
    val bench = docs((100L, "alpha beta gamma delta epsilon zeta"))
    val exact = Dedup.benchmarkContamination(spark, corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    val bloom = Dedup.benchmarkContaminationBloom(spark, corpus, bench, n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    exact.foreach { case (id, (nGrams, nHits, contaminated)) =>
      val (bGrams, bBloom, bHits, bCont) = bloom(id)
      assert(bGrams == nGrams && bHits == nHits && bCont == contaminated,
        s"doc $id: exact=$nHits bloom=$bHits")
      assert(bBloom >= bHits, s"doc $id: bloom candidates < exact hits")
    }
    // tiny bitmap forces false positives; n_hits must still be exact
    val tiny = Dedup.benchmarkContaminationBloom(spark, corpus, bench,
      n = 3, mBits = 64, probes = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    exact.foreach { case (id, (_, nHits, _)) =>
      assert(tiny(id)._2 == nHits, s"doc $id under tiny bloom")
      assert(tiny(id)._1 >= nHits)
    }
  }

  test("quantizeQ8: max-abs scaling, half-up rounding, zero-vector guard") {
    import spark.implicits._
    val emb = Seq((0L, Array(1.0f, -0.5f, 0.25f)),
      (1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeQ8(emb).orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2)))
    assert(got(0)._2 == 1.0)
    assert(got(0)._3 == Seq(127L, -64L, 32L)) // round(-63.5) away from 0
    assert(got(1)._2 == 0.0 && got(1)._3 == Seq(0L, 0L, 0L))
  }

  test("annTopKQ8 with full-corpus overfetch matches exact brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val q8 = Similarity.annTopKQ8(emb, nq = 4, k = 3, cand = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val bf = Similarity.annTopK(emb, nq = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(q8.toSeq == bf.toSeq)
  }

  test("packDocs: every doc packed once, packs never span buckets, " +
      "fill bounded by capacity + one doc") {
    import graft.pipelines.Packing
    val rnd = new scala.util.Random(13)
    val d = docs((1L to 200L).map(i =>
      i -> Seq.fill(1 + rnd.nextInt(30))("tok").mkString(" ")): _*)
    val capacity = 40L
    val a = Packing.packDocs(spark, d, "doc_id", "text", capacity, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.length == 200 && a.map(_._1).distinct.length == 200)
    // the composed pack id's bucket component matches each member's
    // content hash — packs never span buckets
    def bucketOf(id: Long): Long =
      id.toString.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L) % 4
    val byPack = a.groupBy(_._2)
    byPack.foreach { case (pack, rows) =>
      assert(rows.forall(r => bucketOf(r._1) == pack / Packing.PacksPerBucket),
        s"pack $pack spans buckets")
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(total < capacity + maxDoc,
        s"pack $pack holds $total tokens > capacity+maxDoc")
    }
    // deterministic: same input → identical assignment
    val b = Packing.packDocs(spark, d, "doc_id", "text", capacity, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // manifest aggregates the same totals
    val m = Packing.packManifest(
      Packing.packDocs(spark, d, "doc_id", "text", capacity, 4), "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.keySet == byPack.keySet)
    byPack.foreach { case (pack, rows) =>
      assert(m(pack) == (rows.length.toLong, rows.map(_._3).sum)) }
  }

  test("repeatedPassages finds cross-document boilerplate windows only") {
    val boiler = "all rights reserved worldwide" // exactly one 4-token window
    // Windows are non-overlapping from token 0, so the shared passage
    // is detected when it sits on the same window grid in both docs…
    val aligned = docs(
      (1L, s"$boiler promo tail one"),
      (2L, s"$boiler promo tail two"),
      (3L, "totally unrelated text body here maybe"),
      (4L, "short")) // below window size, dropped by the size gate
    val got = Dedup.repeatedPassages(spark, aligned, window = 4, minDocs = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // (n_docs, n_occurrences, first_doc) for the one shared window
    assert(got.toSeq == Seq((2L, 2L, 1L)), got.mkString(","))
    // …and NOT when the grids misalign (boilerplate at offset 3 of a
    // 7-token doc never forms a full aligned window) — the documented
    // trade of the non-overlapping grid vs a rolling window.
    val misaligned = docs(
      (1L, s"unique alpha beta $boiler"),
      (2L, s"other gamma delta $boiler"))
    assert(Dedup.repeatedPassages(spark, misaligned, window = 4, minDocs = 2)
      .collect().isEmpty)
  }

  test("dedupSpans: one maximal span per duplicated region, any alignment") {
    // the 5-token region sits at offset 2 in doc 1 and offset 0 in
    // doc 2 — the overlapping grams find it regardless of alignment
    // (the contrast with repeatedPassages' fixed window grid) and the
    // merge reports it as ONE maximal span of exactly 5 tokens
    val d = docs(
      (1L, "u1 u2 D1 D2 D3 D4 D5 u3 u4"),
      (2L, "D1 D2 D3 D4 D5 w1 w2 w3"),
      (3L, "z1 z2 z3 z4 z5 z6")) // unique: no spans
    val got = Dedup.dedupSpans(spark, d, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 6L, 5L, 3L), // doc, start, end, tokens, grams
      (2L, 0L, 4L, 5L, 3L)), got.mkString(","))
  }

  test("dedupSpans: regions separated by a unique gap stay separate spans") {
    val d = docs(
      (1L, "D1 D2 D3 q1 q2 q3 q4 q5 E1 E2 E3"),
      (2L, "D1 D2 D3 r1 r2 r3 r4 r5 E1 E2 E3"))
    val got = Dedup.dedupSpans(spark, d, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0L, 2L), (1L, 8L, 10L),
      (2L, 0L, 2L), (2L, 8L, 10L)), got.mkString(","))
  }

  test("dedupSpans minOcc: within-doc repeats flagged by the " +
    "occurrence mode, invisible to the distinct-doc mode") {
    // the 3-gram "C1 C2 C3" repeats twice WITHIN doc 1 only —
    // suffix-array dedup removes those too; minDocs (distinct docs)
    // cannot see it, minOcc (total occurrences) can
    val d = docs(
      (1L, "C1 C2 C3 x1 x2 x3 C1 C2 C3"),
      (2L, "y1 y2 y3 y4 y5 y6"))
    assert(Dedup.dedupSpans(spark, d, k = 3).collect().isEmpty)
    val got = Dedup.dedupSpans(spark, d, k = 3, minOcc = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 0L, 2L, 3L), (1L, 6L, 8L, 3L)),
      got.mkString(","))
  }

  test("dedupSpansClean cuts exactly the duplicated spans; whole-dup doc -> empty") {
    val d = docs(
      (1L, "u1 u2 D1 D2 D3 D4 D5 u3 u4"),
      (2L, "D1 D2 D3 D4 D5 w1 w2 w3"),
      (3L, "z1 z2 z3 z4 z5 z6"))
    val got = Dedup.dedupSpansClean(spark, d, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ("u1 u2 u3 u4", 4L, 5L))
    assert(got(2L) == ("w1 w2 w3", 3L, 5L))
    assert(got(3L) == ("z1 z2 z3 z4 z5 z6", 6L, 0L))
    // a document that is ENTIRELY duplicated material survives as an
    // empty row (dropping is downstream policy, not this operator's)
    val whole = docs((1L, "a b c"), (2L, "a b c"))
    val w = Dedup.dedupSpansClean(spark, whole, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(w(1L) == ("", 0L, 3L) && w(2L) == ("", 0L, 3L), w.toString)
  }

  test("scrub handles patterns containing quotes and backslashes; oracle escapes them") {
    val d = docs((1L, "it's o'clock at 12 o'clock"), (2L, "no match here"))
    val got = TextMetrics.scrub(d, """o'\w+""", "[T]").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) == ("it's [T] at 12 [T]", 2L))
    assert(got(2L) == ("no match here", 0L))
    // oracle SQL doubles single quotes and leaves regex backslashes intact
    val sql = Oracles.textScrub("""o'\w+""", "it's")
    assert(sql.contains("'o''\\w+'"), sql)
    assert(sql.contains("'it''s'"), sql)
    assert(!sql.contains("'o'\\w+'"), "unescaped quote leaked into SQL")
  }

  test("tokenizer boundary is pluggable: packDocs respects the injected counter") {
    import graft.functions.{Tokenizer, WhitespaceTokenizer}
    import graft.pipelines.Packing
    val d = docs((1L, "alpha beta gamma"), (2L, "one two"), (3L, "x"))
    // whitespace counts: 3, 2, 1
    val ws = Packing.packDocs(spark, d, "doc_id", "text", 100L, 1,
      WhitespaceTokenizer).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ws == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // a custom tokenizer (chars-as-tokens) flows through untouched
    object CharTokenizer extends Tokenizer {
      override def countTokens(text: org.apache.spark.sql.Column) =
        length(coalesce(text, lit("")))
    }
    val ch = Packing.packDocs(spark, d, "doc_id", "text", 100L, 1,
      CharTokenizer).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ch == Map(1L -> 16L, 2L -> 7L, 3L -> 1L))
  }

  test("codec boundary is pluggable: extractFeatures uses the injected codec") {
    import graft.pipelines.MediaCodec
    object ZeroCodec extends MediaCodec {
      override def decode(payload: Array[Byte]): Array[Byte] =
        new Array[Byte](payload.length) // all zeros, same length
      override def resize(payload: Array[Byte], factor: Int): Array[Byte] =
        payload.take(payload.length / factor)
    }
    val d = docs((1L, "abc"))
    val f = Multimodal.extractFeatures(spark, Multimodal.withPayload(d),
      ZeroCodec).collect().head
    assert(f.n_bytes == 3 && f.byte_mean == 0.0) // zeros, not "abc" bytes
    // resize is container-to-container: the injected codec sees the
    // ENCODED payload, not a pre-decoded one
    val r = Multimodal.resizeAll(spark, Multimodal.withPayload(d), 3,
      ZeroCodec).collect().head
    assert(r.payload.length == 1 && r.payload.head == 'a'.toByte)
  }

  test("Quantiles.contFromHistogram == the exact percentile aggregate, " +
      "grouped and global, without the multiset buffer") {
    import spark.implicits._
    import graft.pipelines.Quantiles
    val rnd = new scala.util.Random(23)
    // negative values included: event cents go below zero (refunds),
    // and the histogram path must order/interpolate them identically
    val rows = (1 to 800).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(100).toLong - 50L)) ++
      Seq(("g3", -7L)) // singleton group: idx = 0 edge
    val df = rows.toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    // grouped
    val hist = Quantiles.contFromHistogram(df, Seq("g"), col("v"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3))
      .toMap
    for (q <- qs) {
      val want = df.groupBy(col("g"))
        .agg(percentile(col("v"), lit(q)).as("p")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      for ((g, p) <- want)
        assert(hist((g, q)) == p, s"grouped q=$q g=$g: ${hist((g, q))} != $p")
    }
    // global (the quality-cutoff shape: one group = the whole corpus)
    val glob = Quantiles.contFromHistogram(df, Nil, col("v"), qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    for (q <- qs) {
      val want = df.agg(percentile(col("v"), lit(q))).head.getDouble(0)
      assert(glob(q) == want, s"global q=$q: ${glob(q)} != $want")
    }
  }

  test("heavyHitters: exact counts above n/(k+1), partition-invariant, " +
      "and the recount join stays broadcast") {
    import spark.implicits._
    import graft.pipelines.Sketches
    val rows = Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 500).map(i => s"tail$i") ++ Seq.fill(80)("edge")
    val df = rows.toDF("v")
    val n = rows.length // 1000
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.heavyHitters(spark, d, col("v"), k = 8).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = run(df)
    // threshold n/(k+1) = 1000/9 ≈ 111.1: hot (300) and warm (120)
    // qualify, edge (80) and every tail value do not
    assert(got == Seq("hot" -> 300L, "warm" -> 120L))
    // merge-order independence: radically different partitionings
    assert(run(df.repartition(32)) == got)
    assert(run(df.coalesce(1)) == got)
    // the recount join against the <= k candidates must be broadcast
    val plan = Sketches.heavyHitters(spark, df, col("v"), k = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("KMV sketch: exact below K, within 3 sigma above K, merges to " +
      "the union's sketch") {
    import spark.implicits._
    import graft.pipelines.Sketches
    val rows = (1L to 5000L).map(i => ("big", s"u$i")) ++
      (1L to 40L).map(i => ("small", s"v$i")) ++
      (1L to 5000L).map(i => ("big", s"u$i")) // duplicates change nothing
    val df = rows.toDF("g", "v")
    val est = Sketches.kmvDistinct(spark, df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // sigma = 1/sqrt(K-2) ~ 6.3%; allow 3 sigma
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.19, s"big=${est("big")}")
    assert(est("small") == 40.0, s"small=${est("small")}") // < K -> exact
    // mergeability: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    val (a, b) = ((1L to 3000L).map(i => ("g", s"u$i")).toDF("g", "v"),
      (2000L to 5000L).map(i => ("g", s"u$i")).toDF("g", "v"))
    val whole = Sketches.kmvSketch(spark, a.unionAll(b), col("g"), col("v"))
      .collect().head.getSeq[Long](1)
    val merged = Sketches.kmvMerge(spark,
        Sketches.kmvSketch(spark, a, col("g"), col("v")),
        Sketches.kmvSketch(spark, b, col("g"), col("v")))
      .collect().head.getSeq[Long](1)
    assert(whole == merged && whole.size == Sketches.K)
    assert(whole == whole.sorted && whole.distinct == whole)
  }

  test("KMV pairwise Jaccard estimates set overlap; exact on small sets") {
    import spark.implicits._
    import graft.pipelines.Sketches
    // |A|=3000 (u1..3000), |B|=3001 (u2000..5000): |A∩B|=1001,
    // |A∪B|=5000 → J = 0.2002; σ ≈ √(J(1−J)/256) ≈ 0.025, allow 3σ
    val rows = (1L to 3000L).map(i => ("A", s"u$i")) ++
      (2000L to 5000L).map(i => ("B", s"u$i")) ++
      (1L to 30L).map(i => ("C", s"u$i")) // ⊂ A, small
    val j = Sketches.kmvPairwiseJaccard(spark, rows.toDF("g", "v"),
        col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(j(("A", "B")) - 0.2002) < 0.08, s"AB=${j(("A", "B"))}")
    // C ⊂ A with |A∪C| under... union is 3000 > K, but every sketch
    // member of C is in A, so the estimate is the member fraction of C
    // in the union sample — small and positive; B∩C is empty → the
    // union sample contains (almost surely) no common member.
    assert(j(("B", "C")) < 0.05, s"BC=${j(("B", "C"))}")
    assert(j(("A", "C")) > 0.0, s"AC=${j(("A", "C"))}")
  }

  test("multimodal feature extraction: histogram + byte stats via mapPartitions") {
    val d = docs((1L, "abc"), (2L, ""))
    val feats = Multimodal.extractFeatures(spark, Multimodal.withPayload(d))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 3)
    assert(math.abs(feats(1L).byte_mean - ("abc".map(_.toInt).sum / 3.0)) < 1e-12)
    assert(feats(2L).n_bytes == 0 && feats(2L).byte_mean == 0.0)
    assert(feats(1L).hist.sum > 0.999) // ratios sum to 1 for non-empty
  }
}
