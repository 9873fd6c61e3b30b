package graft.engine

import graft.codec.BtrConfig
import graft.format.{BtrManifest, ColumnMeta}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.graftshim.ConfShim
import org.apache.hadoop.fs.Path

/** Raw binary block files — the Spark analog of the reference's on-disk
  * blob layout (`column{i}_part{j}` + `metadata`,
  * /root/reference/src/btrblocks.rs:668-672): each Spark partition writes
  * ONE blob file `blocks/part-NNNNN` holding its chunks, each chunk framed
  * with per-column byte lengths so a reader can skip (prune) columns
  * without decoding them. Schema/stats live in the same JSON manifest.
  *
  * Frame layout per chunk (v2):
  *   [i32 numRows][u8 nCols]
  *   [per col: u8 colType, i32 blobLen, u8 hasZone, i64 minLong, i64 maxLong]
  *   [col blobs…]
  * The per-column zone map (int columns only; hasZone=0 otherwise) lets a
  * reader skip whole chunks against pushed range filters without touching
  * their blobs — data skipping the reference's scan lacks entirely
  * (/root/reference/src/datafusion.rs:64-73). v1 frames (no zone fields)
  * remain readable.
  * File header: "BTRS" magic + u8 version.
  */
object BlockFiles {
  final val Magic = 0x53525442 // "BTRS" little-endian
  final val Version = 2

  /** Encode `df` and write raw block files + manifest to `dir`. */
  def write(
      df: DataFrame,
      dir: String,
      cfg: BtrConfig = BtrConfig.default,
      rangeCols: Seq[String] = Nil): BtrManifest = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val prepared =
      if (rangeCols.isEmpty) df
      else {
        // row-varying salt (hash of ALL columns): a hot (repo, path) key's
        // rows spread across partitions instead of serializing one task
        val salted = df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(16)))
        salted.repartitionByRange(n, (rangeCols.map(col) :+ col("__salt")): _*).drop("__salt")
      }
    val schema = prepared.schema
    require(schema.length <= 255,
      s"btr block frame stores the column count in one byte — ${schema.length} columns > 255")
    val colTypes = BtrEncoder.validateSchema(schema)
    val confB = ConfShim.broadcast(spark.sparkContext)
    val blocksDir = s"$dir/blocks"
    // clean target
    val p = new Path(blocksDir)
    val fs0 = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs0.exists(p)) fs0.delete(p, true)
    fs0.mkdirs(p)

    // Per task: stream chunks through the encoder into one blob file, with
    // a task-commit protocol: write to an attempt-unique temp name, rename
    // to the final path on success (Hadoop FS rename is atomic per file).
    // A retried/speculative attempt never rewrites a committed file a
    // reader may already hold, and a failed attempt leaves only a dot-file
    // that readers (which list `part-*`) ignore.
    val stats = prepared.queryExecution.toRdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val tc = TaskContext.get()
        Iterator.single(writeOneBlockFile(
          ConfShim.conf(confB), blocksDir, tc.partitionId(), tc.taskAttemptId(),
          rows, schema, colTypes, cfg))
      }
    }.collect()

    val m = BtrManifest(
      columns = schema.fields.zip(colTypes).map { case (f, t) => ColumnMeta(f.name, t) }.toSeq,
      numPartitions = stats.length,
      blockSize = cfg.blockSize,
      maxCascadeDepth = cfg.maxCascadeDepth,
      numRows = stats.map(_._3).sum,
      rawBytes = stats.map(_._1).sum,
      encBytes = stats.map(_._2).sum,
      completedPartitions = Seq(0))
    BtrTable.writeManifest(spark, dir, m)
    m
  }

  /** One task attempt's block-file write (factored out so the retry
    * semantics are unit-testable without Spark's retry machinery).
    * Returns (rawBytes, encBytes, numRows) of the bytes THIS attempt
    * encoded; the committed file is whichever attempt renamed first.
    */
  def writeOneBlockFile(
      conf: org.apache.hadoop.conf.Configuration,
      blocksDir: String,
      pid: Int,
      attemptId: Long,
      rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      colTypes: Array[Int],
      cfg: BtrConfig): (Long, Long, Long) = {
    val fs = new Path(blocksDir).getFileSystem(conf)
    val finalPath = new Path(blocksDir, f"part-$pid%05d")
    val tmpPath = new Path(blocksDir, f".tmp-part-$pid%05d-attempt-$attemptId")
    val out = fs.create(tmpPath, true)
    var rawBytes = 0L
    var encBytes = 0L
    var numRows = 0L
    var committed = false
    try {
      val le = new java.io.DataOutputStream(out)
      def i32(v: Int): Unit = {
        le.write(v & 0xff); le.write((v >>> 8) & 0xff)
        le.write((v >>> 16) & 0xff); le.write((v >>> 24) & 0xff)
      }
      i32(Magic); le.write(Version)
      def i64(v: Long): Unit = { i32((v & 0xffffffffL).toInt); i32((v >>> 32).toInt) }
      val it = new BtrEncoder.PartitionEncodeIterator(rows, schema, colTypes, cfg)
      val grouped = it.grouped(schema.length)
      grouped.foreach { chunkParts =>
        i32(chunkParts.head.numRows)
        le.write(chunkParts.length)
        chunkParts.foreach { part =>
          le.write(part.colType)
          i32(part.bytes.length)
          (part.minLong, part.maxLong) match {
            case (Some(mn), Some(mx)) => le.write(1); i64(mn); i64(mx)
            case _                    => le.write(0); i64(0L); i64(0L)
          }
        }
        chunkParts.foreach { part =>
          le.write(part.bytes)
          rawBytes += part.rawBytes
          encBytes += part.bytes.length
        }
        numRows += chunkParts.head.numRows
      }
      out.close()
      // Commit via rename-if-absent: FileContext's default rename FAILS when
      // the destination exists, so the first attempt wins (atomic on
      // HDFS-like stores, where plain FileSystem.rename-over-existing would
      // let a later speculative attempt replace a committed file). Schemes
      // without an AbstractFileSystem binding fall back to a checked rename;
      // the residual race there is local-FS only, where rename is an atomic
      // in-place replace of one complete valid encode by another and open
      // readers keep their inode.
      committed =
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(finalPath.toUri, conf)
          try { fc.rename(tmpPath, finalPath); true }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => true // other attempt won
          }
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            if (fs.exists(finalPath)) true
            else fs.rename(tmpPath, finalPath) || fs.exists(finalPath)
        }
      if (!committed)
        sys.error(s"could not commit $tmpPath -> $finalPath")
    } finally {
      try out.close() catch { case _: java.io.IOException => () }
      if (fs.exists(tmpPath)) fs.delete(tmpPath, false)
    }
    (rawBytes, encBytes, numRows)
  }
}
