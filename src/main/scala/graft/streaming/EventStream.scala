package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming over the events table: the streaming twin of the
  * batch `q10_events_window` query. The reference has no true streaming
  * (its Redis BRPOP loop is an at-least-once work queue, SURVEY.md §2.6);
  * this is the engine's forward-looking ingest path: readStream →
  * watermark → windowed aggregate → sink, with state bounded by the
  * watermark (late rows beyond 1 hour are dropped deterministically).
  */
object EventStream {

  /** Hourly tumbling-window counts/sums per event_type, streaming. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // parquet NTZ → event-time LTZ
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stateful streaming: running event counts/value sums per event_type
    * via mapGroupsWithState — the custom-state API
    * (KeyValueGroupedDataset) the engine uses where windowed aggs can't
    * express the semantics. Update-mode output: one row per key per
    * microbatch with the accumulated totals.
    */
  def runningTotals(events: DataFrame): org.apache.spark.sql.Dataset[(String, Long, Double)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("event_type"), col("value"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          (key, n, v)
      }
  }

  /** Streaming exact dedup on an id column with bounded state: the
    * watermark expires per-key state after 1 hour of event time — the
    * ingest-time twin of TextOps.exactDupGroups (late replays of an
    * already-seen id are dropped; state never grows unboundedly).
    */
  def dedupStream(events: DataFrame, idCol: String): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates(idCol, "ts")

  /** Run the streaming query over a parquet directory as a bounded stream
    * (one file per microbatch), returning the complete result — used by
    * tests to assert streaming == batch.
    */
  def runBounded(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = hourlyAgg(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("events_hourly")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table("events_hourly")
  }
}
