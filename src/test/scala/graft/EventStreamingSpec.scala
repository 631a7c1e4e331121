package graft

import graft.streaming.EventPipelines
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Structured-Streaming shape of the events pipeline: parquet source →
  * watermark → tumbling window → memory sink, checked against the batch
  * twin on the same data. */
class EventStreamingSpec extends SparkSuite {

  test("streaming windowed stats equals the batch aggregation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toFile
    dir.deleteOnExit()
    val rows = (0 until 200).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
        s"type${i % 3}", (i % 7).toDouble)
    }
    val df = rows.toDF("event_id", "ts", "event_type", "value")
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)

    val stream = spark.readStream.schema(df.schema)
      .parquet(dir.getAbsolutePath)
    val q = EventPipelines.windowedStats(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_stream_test")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.sql(
      """SELECT CAST(window.start AS LONG) AS w, event_type, n, total
        |FROM graft_stream_test""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = df.groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
