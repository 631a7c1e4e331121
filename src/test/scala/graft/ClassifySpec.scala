package graft

import graft.pipelines.Classify
import graft.functions.GraftHash
import org.apache.spark.unsafe.types.UTF8String

/** Differential test: [[Classify.naiveBayes]] against a plain-Scala
  * reimplementation of the same hash split + micro-nat NB arithmetic —
  * the join/agg/argmax plumbing is validated end to end, not just
  * eyeballed predictions. */
class ClassifySpec extends SparkSuite {

  private def microRound(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue

  test("naiveBayes matches a plain-Scala reimplementation on the same split") {
    import spark.implicits._
    val langs = Seq("en", "es", "de")
    val words = Map(
      "en" -> Seq("the", "cat", "sat", "common"),
      "es" -> Seq("el", "gato", "se", "common"),
      "de" -> Seq("der", "katze", "sass", "common"))
    val rows = (1L to 30L).map { id =>
      val lang = langs((id % 3).toInt)
      val w = words(lang)
      // deterministic per-doc token mix, including the shared token
      val text = (0 until 6).map(j => w(((id + j) % w.length).toInt))
        .mkString(" ")
      (id, lang, text)
    }
    val df = rows.toDF("doc_id", "lang", "text")
    val got = Classify.naiveBayes(spark, df, "lang", trainPct = 50)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getDouble(3))).toMap

    // ---- plain-Scala twin ----
    def gate(id: Long): Boolean =
      GraftHash.hashUtf8(UTF8String.fromString(s"$id|nbtrain")) % 100 < 50
    def toks(t: String): Seq[String] =
      if (t.trim.isEmpty) Nil else t.trim.split("\\s+").toSeq
    val (train, test) = rows.partition(r => gate(r._1))
    assert(train.nonEmpty && test.nonEmpty, "hash split degenerate")
    val trainToks = train.flatMap(r => toks(r._3).map(r._2 -> _))
    val cnt = trainToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tokC = trainToks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val vocab = trainToks.map(_._2).distinct.size.toLong
    val nTrain = train.size.toLong
    val prior = train.groupBy(_._2).view.mapValues(ds =>
      microRound(math.log(ds.size.toDouble / nTrain) * 1e6)).toMap
    val classes = tokC.keys.toSeq.sorted
    val expected = test.filter(r => toks(r._3).nonEmpty).map { r =>
      val occ = toks(r._3).groupBy(identity).view.mapValues(_.size.toLong)
      val scores = classes.map { c =>
        val like = occ.map { case (t, n) =>
          n * microRound(math.log((cnt.getOrElse((c, t), 0L) + 1).toDouble /
            (tokC(c) + vocab).toDouble) * 1e6)
        }.sum
        c -> (like + prior(c))
      }
      val (pc, pm) = scores.minBy { case (c, m) => (-m, c) }
      r._1 -> (r._2, pc,
        BigDecimal(pm.toDouble / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(got.keySet == expected.keySet,
      s"docs differ: ${got.keySet} vs ${expected.keySet}")
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
    // the split is real: training docs never appear in the output
    assert(train.map(_._1).toSet.intersect(got.keySet).isEmpty)
  }

  test("naiveBayes rejects a degenerate trainPct") {
    import spark.implicits._
    val df = Seq((1L, "en", "a b")).toDF("doc_id", "lang", "text")
    intercept[IllegalArgumentException] {
      Classify.naiveBayes(spark, df, "lang", trainPct = 0)
    }
    intercept[IllegalArgumentException] {
      Classify.naiveBayes(spark, df, "lang", trainPct = 100)
    }
  }
}
