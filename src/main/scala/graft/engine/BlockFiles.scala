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
  * Frame layout per chunk:
  *   [i32 numRows][u8 nCols][per col: u8 colType, i32 blobLen][col blobs…]
  * File header: "BTRS" magic + u8 version.
  */
object BlockFiles {
  final val Magic = 0x53525442 // "BTRS" little-endian
  final val Version = 1

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
        val salted = df.withColumn("__salt", pmod(hash(col(rangeCols.last)), lit(16)))
        salted.repartitionByRange(n, (rangeCols.map(col) :+ col("__salt")): _*).drop("__salt")
      }
    val schema = prepared.schema
    val colTypes = BtrEncoder.validateSchema(schema)
    val confB = ConfShim.broadcast(spark.sparkContext)
    val blocksDir = s"$dir/blocks"
    // clean target
    val p = new Path(blocksDir)
    val fs0 = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs0.exists(p)) fs0.delete(p, true)
    fs0.mkdirs(p)

    // per task: stream chunks through the encoder straight into one blob file
    val stats = prepared.queryExecution.toRdd.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val pid = TaskContext.getPartitionId()
        val fs = new Path(blocksDir).getFileSystem(ConfShim.conf(confB))
        val out = fs.create(new Path(blocksDir, f"part-$pid%05d"), true)
        var rawBytes = 0L
        var encBytes = 0L
        var numRows = 0L
        try {
          val le = new java.io.DataOutputStream(out)
          def i32(v: Int): Unit = {
            le.write(v & 0xff); le.write((v >>> 8) & 0xff)
            le.write((v >>> 16) & 0xff); le.write((v >>> 24) & 0xff)
          }
          i32(Magic); le.write(Version)
          val it = new BtrEncoder.PartitionEncodeIterator(rows, schema, colTypes, cfg)
          val grouped = it.grouped(schema.length)
          grouped.foreach { chunkParts =>
            i32(chunkParts.head.numRows)
            le.write(chunkParts.length)
            chunkParts.foreach { part =>
              le.write(part.colType)
              i32(part.bytes.length)
            }
            chunkParts.foreach { part =>
              le.write(part.bytes)
              rawBytes += part.rawBytes
              encBytes += part.bytes.length
            }
            numRows += chunkParts.head.numRows
          }
        } finally out.close()
        Iterator.single((rawBytes, encBytes, numRows))
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
}
