package graft

import graft.pipelines.{Audio, Multimodal, WavCodec}
import org.apache.spark.sql.functions._

/** Real-codec audio path: javax.sound.sampled WAV encode/decode and
  * the codec's integration with the MediaCodec operators. */
class AudioSpec extends SparkSuite {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(256).toByte)
  }

  test("8-bit PCM WAV round trip is lossless") {
    val b = bytes(123, 7)
    val wav = Audio.encodePcmWav(b)
    // a real RIFF/WAVE container
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((rate, ch, samples)) = Audio.decodePcm(wav)
    assert(rate == Audio.SampleRate.toFloat && ch == 1)
    assert(samples.toSeq == b.toSeq) // byte-exact samples back
  }

  test("empty payload: header-only WAV, zero samples") {
    val wav = Audio.encodePcmWav(Array.emptyByteArray)
    val Some((_, _, samples)) = Audio.decodePcm(wav)
    assert(samples.isEmpty)
  }

  test("undecodable bytes: decodePcm None, WavCodec decodes to empty") {
    assert(Audio.decodePcm("not audio at all".getBytes).isEmpty)
    assert(WavCodec.decode("junk".getBytes).isEmpty)
  }

  test("WavCodec drives extractFeatures over real WAV payloads") {
    import spark.implicits._
    val b = bytes(64, 11)
    val docs = Seq((1L, "unused")).toDF("doc_id", "text")
    val withWav = docs.select(col("doc_id"),
      lit(Audio.encodePcmWav(b)).as("payload"),
      lit("audio/wav").as("mime"), lit(b.length).as("n_bytes"))
    val feats = Multimodal.extractFeatures(spark, withWav, WavCodec)
      .collect()
    assert(feats.length == 1)
    val mean = b.map(_ & 0xff).sum.toDouble / b.length
    assert(math.abs(feats.head.byte_mean - mean) < 1e-6)
  }

  test("audioRoundTrip matches a direct byte computation") {
    import spark.implicits._
    val d = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val got = Audio.audioRoundTrip(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))
    val mean = "hello".getBytes("UTF-8").map(_ & 0xff).sum / 5.0
    assert(got(0) == ((1L, 5L, Audio.SampleRate, 1,
      math.rint(mean * 1e6) / 1e6)))
    assert(got(1) == ((2L, 0L, Audio.SampleRate, 1, 0.0)))
  }
}
