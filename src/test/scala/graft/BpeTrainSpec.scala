package graft

import graft.functions.{BpeTokenizer, BpeVocab}
import graft.pipelines.BpeTrain
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSuite {

  /** Hand-computable corpus: "low" ×5, "lower" ×2, "newest" ×6,
    * "widest" ×3 — the Sennrich et al. running example (sans </w>
    * markers). Pair counts round 1: (e,s) 6+3=9, (s,t) 9, (w,e) 2+6=8,
    * (l,o) 7, (o,w) 7, (n,e) 6, (w,i) 3, (i,d) 3, (d,e) 3, (e,r) 2.
    * Argmax ties (e,s) and (s,t) at 9 → lexicographic tiebreak picks
    * (e,s); round 2 then merges (es,t). */
  private def corpus = {
    import spark.implicits._
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest") ++
      Seq.fill(3)("widest")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("trainMerges learns the textbook merge sequence deterministically") {
    val merges = BpeTrain.trainMerges(corpus, numMerges = 4, minCount = 1)
    assert(merges.map(m => (m._1, m._2)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_._3) == Seq(9L, 9L, 7L, 7L))
  }

  test("learned merges are well-formed (BpeVocab constructor accepts them)") {
    val vocab = BpeTrain.trainedVocab(corpus, numMerges = 6, minCount = 1)
    // "newest" -> n e w est -> 4 symbols after (e,s)+(es,t); later
    // merges may compact further — just assert application works and
    // counts are positive and <= character count
    val counted = corpus
      .select(new BpeTokenizer(vocab).countTokens(col("text")).as("n"))
      .collect().map(_.getLong(0))
    assert(counted.forall(n => n >= 1 && n <= 6))
  }

  test("merges DataFrame is rank-ordered with counts") {
    val df = BpeTrain.merges(corpus, numMerges = 3, minCount = 1)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.head.getString(1) == "e" && rows.head.getString(2) == "s")
  }

  test("word dict caps by (cnt desc, word asc) and floors at minCount") {
    val dict = BpeTrain.wordDict(corpus, minCount = 3, maxWordTypes = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // newest:6, low:5 survive the cap; widest:3 passes minCount but is
    // cut by maxWordTypes; lower:2 fails minCount
    assert(dict.toSeq == Seq(("newest", 6L), ("low", 5L)))
  }

  test("exhausted corpus fails loudly instead of returning a short list") {
    import spark.implicits._
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    // "ab" has one pair; after merging it there is nothing left
    val e = intercept[IllegalArgumentException] {
      BpeTrain.trainMerges(tiny, numMerges = 3, minCount = 1)
    }
    assert(e.getMessage.contains("exhausted"))
  }

  test("single-symbol words contribute no pairs (no descending sequence)") {
    import spark.implicits._
    // "a" alone must not fabricate pairs via sequence(0, -1)
    val df = (Seq.fill(3)("a") ++ Seq.fill(2)("bc")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = BpeTrain.trainMerges(df, numMerges = 1, minCount = 1)
    assert(merges.map(m => (m._1, m._2)) == Seq(("b", "c")))
  }

  test("trainMergesFast replays the distributed greedy exactly — " +
      "textbook corpus, ties included") {
    val fast = BpeTrain.trainMergesFast(corpus, numMerges = 4, minCount = 1)
    assert(fast == BpeTrain.trainMerges(corpus, numMerges = 4, minCount = 1))
    // the round-1 (e,s)/(s,t) tie resolves identically
    assert(fast.head == (("e", "s", 9L)))
  }

  test("trainMergesFast exhaustion and merges(fast = true) gate shape") {
    import spark.implicits._
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      BpeTrain.trainMergesFast(tiny, numMerges = 3, minCount = 1)
    }
    assert(e.getMessage.contains("exhausted"))
    val df = BpeTrain.merges(corpus, numMerges = 3, minCount = 1,
      fast = true).collect()
    assert(df.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(df.head.getString(1) == "e" && df.head.getString(2) == "s")
  }

  test("trained vocab differs from Demo and drives the tokenizer") {
    val vocab = BpeTrain.trainedVocab(corpus, numMerges = 4, minCount = 1)
    assert(vocab.merges != BpeVocab.Demo.merges)
    // "lowest": l o w e s t -> es -> est -> lo -> low => low est = 2
    assert(vocab.countTokens("lowest") == 2L)
  }
}
