package graft

import graft.pipelines.Retrieval
import org.apache.spark.sql.Row

/** Closed-form checks for the retrieval family: BM25 against a
  * hand-computed score, RRF fusion against exact rational arithmetic,
  * inverted-index postings against a tiny enumerable corpus. */
class RetrievalSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("bm25 matches the closed-form Okapi score on a 3-doc corpus") {
    // Corpus: dl = 2, 2, 4; "cat" appears once in docs 1 and 3.
    val d = docs((1L, "cat dog"), (2L, "fish bird"),
      (3L, "cat cat mouse mouse"))
    val got = Retrieval.bm25(d, Seq("cat")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // N=3, df=1? No: "cat" is in docs 1 and 3 -> df=2. avgdl = 8/3.
    // idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (8.0 / 3.0)))
    val s3 = s(2.0, 4.0) // doc 3: tf=2
    val s1 = s(1.0, 2.0) // doc 1: tf=1
    assert(s3 > s1) // tf saturation still ranks the double-hit doc first
    assert(got.map(_._2).toSeq == Seq(3L, 1L))
    assert(math.abs(got(0)._3 - s3) < 1e-6)
    assert(math.abs(got(1)._3 - s1) < 1e-6)
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // dense ranks from 1
  }

  test("bm25 length normalization: same tf, shorter doc wins; ties on doc_id") {
    val d = docs((1L, "term pad pad pad pad pad"), (2L, "term pad"),
      (7L, "term pad"), (4L, "unrelated text"))
    val got = Retrieval.bm25(d, Seq("term")).collect().map(_.getLong(1))
    // docs 2 and 7 (dl=2) beat doc 1 (dl=6); 2 before 7 on the id tiebreak
    assert(got.toSeq == Seq(2L, 7L, 1L))
  }

  test("hybridRrf fuses ranks with exact reciprocal sums and null ranks") {
    // Embeddings: vec 0 is the probe; vec 1 identical direction (cos 1),
    // vec 2 orthogonal, vec 3 opposite. Text: doc 2 is the only term hit.
    val d = docs((0L, "probe text"), (1L, "filler words"),
      (2L, "needle appears here"), (3L, "filler again"))
    val e = emb(
      (0L, Seq(1f, 0f)), (1L, Seq(2f, 0f)),
      (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f)))
    val got = Retrieval.hybridRrf(d, e, Seq("needle"), queryVecId = 0L)
      .collect()
    val byDoc = got.map(r => r.getLong(1) ->
      (r.getDouble(2), Option(r.get(3)), Option(r.get(4)))).toMap
    // cosine ranking (probe excluded): 1 (cos 1) > 2 (cos 0) > 3 (cos -1)
    // bm25 ranking: only doc 2.
    val r2 = 1.0 / 61.0 + 1.0 / 62.0 // bm25_rank 1, cos_rank 2
    val r1 = 1.0 / 61.0              // cos_rank 1 only
    val r3 = 1.0 / 63.0              // cos_rank 3 only
    assert(math.abs(byDoc(2L)._1 - (math.rint(r2 * 1e9) / 1e9)) < 1e-12)
    assert(byDoc(2L)._2.contains(1L) && byDoc(2L)._3.contains(2L))
    assert(byDoc(1L)._2.isEmpty && byDoc(1L)._3.contains(1L))
    assert(byDoc(3L)._2.isEmpty && byDoc(3L)._3.contains(3L))
    // fused order: doc 2 (both lists) > doc 1 > doc 3
    assert(got.map(_.getLong(1)).toSeq == Seq(2L, 1L, 3L))
    assert(math.abs(byDoc(1L)._1 - (math.rint(r1 * 1e9) / 1e9)) < 1e-12)
    assert(math.abs(byDoc(3L)._1 - (math.rint(r3 * 1e9) / 1e9)) < 1e-12)
  }

  test("invertedIndex: sorted postings, df band drops hapax and hot terms") {
    val d = docs((3L, "hot aa"), (1L, "hot aa bb"), (2L, "hot bb once"))
    val got = Retrieval.invertedIndex(d, minDf = 2, maxDf = 2).collect()
      .map { case Row(t: String, df: Long, p: String) => (t, df, p) }
    // "hot" df=3 (over band), "once" df=1 (under), aa/bb df=2 survive
    assert(got.toSeq == Seq(("aa", 2L, "1,3"), ("bb", 2L, "1,2")))
  }

  test("bm25 excludeDocId drops the probe document from the ranking") {
    val d = docs((0L, "needle own text"), (5L, "needle elsewhere"))
    val got = Retrieval.bm25(d, Seq("needle"), excludeDocId = 0L)
      .collect().map(_.getLong(1))
    assert(got.toSeq == Seq(5L))
  }
}
