package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming pipelines over the `events` stream table, plus
  * their batch twins (the twins are what the DuckDB oracle checks; the
  * streaming shape is exercised by `EventStreamingSpec`).
  *
  * At scale: tumbling-window aggregation with a watermark is the
  * canonical bounded-state plan — state size is O(windows × event
  * types), independent of input volume.
  */
object EventPipelines {

  /** Streaming: hourly tumbling window per event type. Works on a
    * `readStream` DataFrame; append mode after the watermark closes. */
  def windowedStats(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Batch twin of [[windowedStats]] with an oracle-stable output shape
    * (epoch seconds instead of a window struct). `ts` arrives as
    * epoch-nanos BIGINT (see [[graft.GraphIO.events]]); the hour bucket
    * is pure integer arithmetic. */
  def windowedStatsBatch(events: DataFrame): DataFrame =
    events.groupBy(
        expr("CAST(ts div 3600000000000 AS BIGINT) * 3600").as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))
      .orderBy(col("hour_ts"), col("event_type"))

  /** Top-3 users per event type by total value, ranked on exact integer
    * cents (cross-engine-stable ordering; values have 2 decimals, so
    * cent totals are exact integers). */
  def topUsers(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = events.groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")) * lit(100.0)).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents").desc, col("user_id"))
    s.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("user_id"), col("cents"), col("rn"))
      .orderBy(col("event_type"), col("rn"))
  }
}
