package graft.pipelines

import graft.functions.GraftHash
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded / featurized in distributed batches.
  *
  * The decode step sits behind the pluggable [[MediaCodec]] trait; the
  * shipped [[FakeCodec]] is a clearly-marked STUB (this container has
  * no image/audio codecs) producing a deterministic fake "decoded
  * frame" from the payload bytes. Everything around it — schema,
  * partition-parallel batch processing via `mapPartitions`,
  * feature-vector output shape — is real and tested, so a real codec
  * plugs in as a `MediaCodec` instance without touching any operator.
  */
object Multimodal {

  final case class Payload(doc_id: Long, mime: String, payload: Array[Byte])
  final case class Features(doc_id: Long, n_bytes: Long, byte_mean: Double,
      hist: Array[Double])

  /** Attach an opaque binary payload column + typed metadata (the shape a
    * real image/audio table would have; here the bytes are the UTF-8 text
    * standing in for media blobs). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Row-count-proportional fan-out for CPU-bound codec stages. A
    * parquet scan partitions by BYTES (`maxPartitionBytes` plus the
    * per-file open cost), which for a compact text/pointer table packs
    * tens of thousands of codec rows into one or two tasks — measured
    * 23.4× wall at 10× data on `multimodal_audio_roundtrip`
    * (near-serial decode on a 10-small-file corpus) before this.
    * Round-robin repartition to the cluster's core count puts a
    * payload-row-sized shuffle in front of work that dwarfs it — the
    * standard posture for decode/resize/featurize stages whose cost is
    * per-ROW, not per-byte. Every codec entry point routes through
    * this before its `mapPartitions`. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Distributed feature extraction: one `mapPartitions` pass, batch
    * shape = one partition, constant memory per row. */
  def extractFeatures(spark: SparkSession, payloads: DataFrame,
      codec: MediaCodec = FakeCodec): Dataset[Features] = {
    import spark.implicits._
    fanOut(payloads.select(col("doc_id"), col("mime"), col("payload")))
      .as[Payload]
      .mapPartitions(_.map { p =>
        val decoded = codec.decode(p.payload) // pluggable codec boundary
        val hist = new Array[Double](8)
        var sum = 0L
        decoded.foreach { b =>
          val v = b & 0xff
          hist(v >>> 5) += 1.0
          sum += v
        }
        val n = decoded.length.toLong
        Features(p.doc_id, n, if (n == 0) 0.0 else sum.toDouble / n,
          hist.map(h => if (n == 0) 0.0 else h / n))
      })
  }

  /** Oracle-checkable metadata projection over the payload pipeline:
    * byte length + rolling-hash checksum (both exact integers). */
  def metaQuery(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      GraftHash.graftHash(spark, col("text")).as("payload_fp"))
      .orderBy(col("doc_id"))

  /** Distributed resize pass over payloads: mapPartitions batches, one
    * output row per input, metadata updated to the new byte length.
    * The codec's `resize` is container-to-container (an encoded
    * payload in, an encoded payload out — [[ImageIoCodec]] decodes,
    * 2-D-resamples, and re-encodes internally; the [[FakeCodec]] stub
    * byte-strides the opaque payload). */
  def resizeAll(spark: SparkSession, payloads: DataFrame,
      factor: Int, codec: MediaCodec = FakeCodec): Dataset[Payload] = {
    import spark.implicits._
    fanOut(payloads.select(col("doc_id"), col("mime"), col("payload")))
      .as[Payload]
      .mapPartitions(_.map { p =>
        Payload(p.doc_id, p.mime, codec.resize(p.payload, factor))
      })
  }

  /** Frame-sampling analog over the opaque payload: fixed-size windows
    * (`frame` chars, non-overlapping), each fingerprinted — the shape a
    * video frame-sampler or audio chunker produces (one row per frame
    * with index + content hash), with the decode step standing in as
    * identity. Exact-integer oracle. */
  def chunkFingerprints(spark: SparkSession, docs: DataFrame,
      frame: Int = 64): DataFrame = {
    val nChunks = ceil(length(col("text")).cast("double") / frame).cast("int")
    docs
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0), greatest(nChunks, lit(1)) - 1)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        GraftHash.graftHash(spark,
          col("text").substr(col("pos") * frame + 1, lit(frame)))
          .as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }
}

/** Pluggable media-decode boundary: implementations run inside
  * executor tasks (`mapPartitions`), so they must be serializable and
  * thread-safe per task. A real deployment implements this with
  * image/audio library calls; the Spark plumbing above is agnostic to
  * what the bytes mean. */
trait MediaCodec extends Serializable {
  /** Decode an opaque payload into frame/sample bytes. */
  def decode(payload: Array[Byte]): Array[Byte]
  /** Rescale an ENCODED payload to `factor`⁻¹ per media dimension,
    * returning an encoded payload (container in, container out — a
    * real codec decodes, resamples, and re-encodes internally). */
  def resize(payload: Array[Byte], factor: Int): Array[Byte]
}

/** STUB codec — deterministic stand-ins for media operations
  * (this container has no image/audio libraries). */
object FakeCodec extends MediaCodec {
  /** Identity "decode" (a real codec would produce pixel/sample data). */
  override def decode(payload: Array[Byte]): Array[Byte] = payload

  /** "Resize" stub: deterministic byte-space downsample to `factor`⁻¹ of
    * the input (a real implementation would rescale decoded frames).
    * Keeps every factor-th byte — shape-preserving and reproducible. */
  override def resize(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }
}
