package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference's streaming is pull-based
  * batch decode only (SURVEY §2.4 — no event-time semantics anywhere), so
  * event-time windowing is an extension: the standard watermark + tumbling
  * window aggregation a training-data ingest pipeline runs over its event
  * firehose, exercised here in a batch-equivalent memory-sink harness so
  * the result is oracle-checkable.
  */
object StreamingOps {

  /** Tumbling 5-minute event counts per type, via readStream -> watermark ->
    * window -> memory sink (processAllAvailable = run to completion on the
    * static input, which makes streaming ≡ batch for the oracle).
    */
  def windowedEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // readStream needs a directory source; glob-filter to the events file
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      // parquet timestamps surface as TIMESTAMP_NTZ; event-time needs TIMESTAMP
      // (session TZ is UTC so the wall-clock value is unchanged)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    val qname = "events_agg_" + math.abs(dir.hashCode).toString
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qname).select(
      col("window.start").cast("string").as("window_start"),
      col("event_type"),
      col("n_events"),
      col("min_value"),
      col("max_value"))
  }

  /** Stateful sessionization per user: mapGroupsWithState over the static
    * events (batch mode of the same KeyValueGroupedDataset API), emitting
    * per-user session counts with a 30-minute gap rule. Deterministic.
    */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[(Long, Long)]
    val GapUs = 1800L * 1000000L // 30 minutes in microseconds (exact)
    events
      .groupByKey(_._1)
      .mapGroups { (user, it) =>
        val times = it.map(_._2).toArray
        java.util.Arrays.sort(times)
        var sessions = 1
        var i = 1
        while (i < times.length) {
          if (times(i) - times(i - 1) > GapUs) sessions += 1
          i += 1
        }
        (user, sessions.toLong, times.length.toLong)
      }
      .toDF("user_id", "n_sessions", "n_events")
  }
}
