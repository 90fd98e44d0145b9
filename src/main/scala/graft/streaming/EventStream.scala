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

  /** UTF-8 binary string ordering — what Spark's sort_array/min compare.
    * Java's natural String order diverges on supplementary characters
    * (UTF-16 surrogates sort below U+E000..U+FFFF); streaming state that
    * must equal batch aggregates has to compare the same way.
    */
  val Utf8Ordering: Ordering[String] = Ordering.comparatorToOrdering {
    (a: String, b: String) =>
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      var r = 0
      while (i < n && r == 0) { r = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
      if (r != 0) r else x.length - y.length
  }

  private def ltUtf8(a: String, b: String): Boolean = Utf8Ordering.lt(a, b)

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

  /** Continuous thread clustering — the streaming twin of
    * [[graft.threads.Threads.threads]] (T1): per normalized title,
    * accumulate (size, K smallest doc_ids, min category) with
    * mapGroupsWithState. Update-mode output: each microbatch emits the
    * updated accumulation for every title it touched; the final (largest-
    * size) row per title equals the batch thread row exactly — including
    * the bounded deterministic article sample and the D7 min(category)
    * memo (StreamSpec asserts streaming ≡ batch). Per-title state is
    * O(K) regardless of thread size — the same hot-key-bounded property
    * the batch salted two-phase aggregation has, which is what lets a
    * viral title with millions of arriving docs live in streaming state.
    */
  def streamingThreads(classified: org.apache.spark.sql.Dataset[graft.model.ClassifiedDoc],
                       k: Int = graft.threads.Threads.ArticleSampleK)
      : org.apache.spark.sql.Dataset[(String, Long, Seq[String], String)] = {
    import classified.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    classified
      .groupByKey(_.title_norm)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (title: String, docs: Iterator[graft.model.ClassifiedDoc],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Seq[String], String)]) =>
          val (c0, ids0, cat0) = state.getOption.getOrElse((0L, Seq.empty[String], null: String))
          var c = c0; var ids = ids0; var cat = cat0
          docs.foreach { d =>
            c += 1
            // bounded sample: K smallest doc_ids, same as the batch
            // slice(sort_array(collect_list), 1, K) under any arrival
            // order. Ordering MUST be UTF-8 binary (what sort_array
            // compares) — Java String ordering differs on non-BMP chars
            // (surrogates sort low), which would flip the sample
            ids = (ids :+ d.doc_id).sorted(EventStream.Utf8Ordering).take(k)
            if (cat == null || ltUtf8(d.category, cat)) cat = d.category
          }
          state.update((c, ids, cat))
          (title, c, ids, cat)
      }
  }

  /** Bounded-stream runner for [[streamingThreads]] (one parquet file per
    * microbatch): returns the FINAL accumulation per title with the batch
    * ≥2-member filter applied — directly comparable to
    * `Threads.threads(classified)`.
    */
  def runBoundedThreads(spark: SparkSession, dir: String,
                        k: Int = graft.threads.Threads.ArticleSampleK): DataFrame = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[graft.model.ClassifiedDoc].schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[graft.model.ClassifiedDoc]
    val name = s"threads_stream_${System.nanoTime()}"
    val q = streamingThreads(stream, k)
      .toDF("title_norm", "size", "articles", "category")
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    // size is monotone per title → the max-size row is the final state
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("title_norm")).orderBy(col("size").desc)
    spark.table(name)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .filter(col("size") >= 2)
  }

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
