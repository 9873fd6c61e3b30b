package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: run stream_window's operator and dump per-batch durationMs
  * breakdowns from StreamingQueryProgress (guide §1 — measure first).
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tmpfs = sys.env.getOrElse("SPARK_GRAFT_TMPFS", "/dev/shm")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"$tmpfs/graft_spill")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    for (rep <- 0 until 6) {
      s.conf.set("spark.sql.shuffle.partitions",
        (if (rep >= 3) sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8").toInt else cpus).toString)
      val t0 = System.nanoTime()
      val qname = "events_agg_" + math.abs(sfDir.hashCode).toString
      import org.apache.spark.sql.functions._
      val path = s"$sfDir/events.parquet"
      val schema = s.read.parquet(path).schema
      val tSchema = (System.nanoTime() - t0) / 1e9
      val agg = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      val q = agg.writeStream
        .outputMode("complete").format("memory").queryName(qname)
        .option("checkpointLocation",
          graft.ops.StreamingOps.ephemeralCheckpoint(s, qname))
        .start()
      val tStart = (System.nanoTime() - t0) / 1e9
      q.processAllAvailable()
      val tAvail = (System.nanoTime() - t0) / 1e9
      q.stop()
      val n = s.table(qname).count()
      val tEnd = (System.nanoTime() - t0) / 1e9
      println(f"REP $rep schema=$tSchema%.2f start=$tStart%.2f avail=$tAvail%.2f total=$tEnd%.2f rows=$n")
      q.recentProgress.foreach { p =>
        println(s"  batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
        p.stateOperators.foreach(so => println(s"    state: commitMs=${so.commitTimeMs} rows=${so.numRowsTotal} mem=${so.memoryUsedBytes}"))
      }
    }
    s.stop()
  }
}
