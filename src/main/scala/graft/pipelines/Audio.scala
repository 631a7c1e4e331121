package graft.pipelines

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL audio codec path for the multimodal pipeline — the WAV/RIFF
  * PCM reader+writer in `javax.sound.sampled` is part of the JDK, so
  * like the ImageIO leg ([[Images]]) it needs no external library.
  * [[WavCodec]] plugs into the [[MediaCodec]] boundary;
  * [[Audio.audioRoundTrip]] is the oracle-gated proof: each document's
  * bytes become genuine 8-bit unsigned mono PCM samples inside a real
  * WAV container, decoded back through `AudioSystem`, and the decoded
  * sample statistics are reported. 8-bit PCM is lossless, so the
  * DuckDB twin replays the statistics from the raw bytes — a wrong
  * sample width, a signed/unsigned mixup, or a lossy transcode breaks
  * the hash match.
  *
  * Scale shape: identical to the image leg — the codec runs inside
  * `mapPartitions` tasks (one clip in memory per row), everything
  * around the boundary is columnar, and undecodable payloads degrade
  * to empty sample arrays instead of failing the task. */
object Audio {

  /** Synthetic-clip sample rate (content-independent; the oracle
    * replays it as a literal). */
  val SampleRate = 8000

  final case class AudioMeta(doc_id: Long, n_samples: Long,
      sample_rate: Int, channels: Int, mean_amp: Double)

  /** The JDK's own audio SPI providers, resolved ONCE per JVM.
    * `AudioSystem.getAudioInputStream`/`AudioSystem.write` route every
    * call through `JDK13Services.getProviders` — a SYNCHRONIZED global
    * registry — so a fanned-out codec stage serializes on that lock no
    * matter how many cores it gets (measured: 16 threads decode 20k
    * round trips in 2.97 s vs 2.67 s single-threaded). Loading the
    * same providers once and dispatching to them directly keeps the
    * REAL JDK codec (identical reader/writer classes, both stateless
    * and thread-safe) and removes the global lock from the per-row
    * path. */
  /** WAV readers FIRST: the JDK registry order is AIFF, AU, soft-MIDI,
    * then Wave*, so every decode of this pipeline's own container would
    * first pay three wrong-format parse attempts — and the soft-MIDI
    * reader (Gervill) is ~20× a WAV header parse AND serializes under
    * threads (measured: iterate-in-registry-order 1.24 s serial /
    * 2.73 s × 16 threads per 20k decodes; direct WAV reader 0.06 s /
    * 0.03 s). Non-WAV payloads still fall through to every reader —
    * same accepted formats, reordered fast path. */
  private lazy val fileReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
    val (wav, rest) =
      all.partition(_.getClass.getSimpleName.startsWith("Wave"))
    wav ++ rest
  }

  private lazy val wavWriters
      : Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toSeq
      .filter(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
  }

  /** Wrap bytes as 8-bit unsigned mono PCM in a real WAV container. */
  def encodePcmWav(bytes: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      SampleRate.toFloat, 8, 1, 1, SampleRate.toFloat, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      bytes.length.toLong)
    val bos = new ByteArrayOutputStream()
    try wavWriters.headOption
      .getOrElse(throw new IllegalStateException("no JDK WAV writer SPI"))
      .write(ais, AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  /** Decode any JDK-SPI-supported payload to
    * `(sampleRate, channels, raw sample bytes)`; None if undecodable.
    * Tries each cached reader like `AudioSystem` would (a reader
    * signals "not my format" with `UnsupportedAudioFileException`). */
  def decodePcm(payload: Array[Byte]): Option[(Float, Int, Array[Byte])] = {
    def tryRead(reader: javax.sound.sampled.spi.AudioFileReader)
        : Option[(Float, Int, Array[Byte])] =
      try {
        val ais = reader.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          val out = new ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var r = ais.read(buf)
          while (r > 0) { out.write(buf, 0, r); r = ais.read(buf) }
          Some((fmt.getSampleRate, fmt.getChannels, out.toByteArray))
        } finally ais.close()
      } catch { case _: Exception => None }
    fileReaders.iterator.map(tryRead).collectFirst { case Some(r) => r }
  }

  /** Oracle-gated round trip: UTF-8 document bytes → REAL WAV encode →
    * REAL `AudioSystem` decode → decoded sample statistics. Lossless
    * 8-bit PCM means the DuckDB twin
    * ([[graft.Oracles.multimodalAudioRoundtrip]]) reproduces them from
    * the raw bytes with no audio library. */
  def audioRoundTrip(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    Multimodal.fanOut(
        docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val wav = encodePcmWav(bytes)
        val (rate, ch, samples) = decodePcm(wav).getOrElse(
          throw new IllegalStateException(s"self-encoded WAV undecodable " +
            s"for doc $id")) // cannot happen; loud beats silent
        var sum = 0L
        samples.foreach(b => sum += (b & 0xff))
        AudioMeta(id, samples.length.toLong, rate.toInt, ch,
          sum.toDouble / math.max(1, samples.length))
      })
      .toDF()
      .select(col("doc_id"), col("n_samples"), col("sample_rate"),
        col("channels"), round(col("mean_amp"), 6).as("mean_amp"))
      .orderBy(col("doc_id"))
  }
}

/** REAL [[MediaCodec]] for audio payloads: WAV decode to raw sample
  * bytes via `AudioSystem`; byte-level `resize` keeps the trait's 1-D
  * contract (a stride over samples IS a valid naive downsample for
  * mono PCM). */
object WavCodec extends MediaCodec {
  override def decode(payload: Array[Byte]): Array[Byte] =
    Audio.decodePcm(payload).map(_._3).getOrElse(Array.emptyByteArray)

  override def resize(payload: Array[Byte], factor: Int): Array[Byte] =
    FakeCodec.resize(payload, factor)
}
