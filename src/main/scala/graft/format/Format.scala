package graft.format

/** On-disk btr-spark format: a directory holding
  *   - `parts/` — parquet Dataset[CompressedPart] (one row per column-chunk)
  *   - `_btr_manifest.json` — schema + config + lineage + stats
  *
  * Spark-native re-expression of the reference's btr directory
  * (`metadata` + `column{i}_part{j}` blobs, /root/reference/src/btrblocks.rs:668-672,
  * metadata layout :121-199). We keep real column names in the manifest — the
  * reference loses them (/root/reference/src/btrblocks.rs:181-198) — and add
  * per-part zone maps (min/max) the reference lacks, enabling part pruning
  * before decode.
  */
final case class CompressedPart(
    partitionId: Int,
    chunkIdx: Int,
    firstRow: Long, // offset within the encode partition
    numRows: Int,
    colIdx: Int,
    colName: String,
    colType: Int, // ColType: 0=int, 1=double, 2=string
    scheme: String, // human-readable scheme tree (lineage/metrics)
    rawBytes: Long,
    encBytes: Long,
    bytes: Array[Byte],
    // zone maps (nullable; only for the matching type, strings <= 64 chars;
    // with nulls present, extrema cover the NON-NULL values only)
    minLong: Option[Long],
    maxLong: Option[Long],
    minDouble: Option[Double],
    maxDouble: Option[Double],
    minStr: Option[String],
    maxStr: Option[String],
    // null extension (round-5): the reference's effective model is non-null
    // (SURVEY §1.2) — this engine extends it with a per-chunk validity
    // bitmap. bit i set = row i is NULL (placeholder value stored in the
    // blob: 0 / 0.0 / ""); nullBits is null when nullCount == 0.
    nullCount: Int = 0,
    nullBits: Array[Byte] = null,
    // sum extension (round-5, v6 frames): exact per-chunk sum over the
    // NON-NULL values, present iff the chunk has a zone (same hasRange
    // condition — NaN/all-null chunks carry neither and decode instead).
    // Lets SUM(col) fold from headers like MIN/MAX/COUNT already do.
    // Int sums are exact in i64 (<= 2^16 rows x 2^31); double sums
    // accumulate in chunk row order, the same order a decode would visit.
    sumLong: Option[Long] = None,
    sumDouble: Option[Double] = None)

final case class ColumnMeta(name: String, colType: Int, nullable: Boolean = false)

/** Per-bucket write stats, persisted in the manifest lineage (north rule:
  * per-partition lineage + metrics). Totals are derived from the COMPLETED
  * buckets' recorded stats, never by re-scanning written parts — so a
  * rewound/crashed lineage stays self-consistent.
  */
final case class BucketStat(
    bucket: Int, rawBytes: Long, encBytes: Long, numRows: Long, numPartitions: Long)

/** Manifest mirroring the reference's FileMetadata{num_columns, num_chunks,
  * parts} (/root/reference/src/btrblocks.rs:121-199) plus checkpoint lineage
  * for resumable runs (north rule).
  */
final case class BtrManifest(
    columns: Seq[ColumnMeta],
    numPartitions: Int,
    blockSize: Int,
    maxCascadeDepth: Int,
    numRows: Long,
    rawBytes: Long,
    encBytes: Long,
    completedPartitions: Seq[Int],
    bucketStats: Seq[BucketStat] = Nil) {
  def ratio: Double = if (encBytes == 0) 0.0 else rawBytes.toDouble / encBytes
}

object BtrManifest {
  private def esc(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  def toJson(m: BtrManifest): String = {
    val cols = m.columns
      .map(c => s"""{"name":"${esc(c.name)}","colType":${c.colType},"nullable":${c.nullable}}""")
      .mkString("[", ",", "]")
    val done = m.completedPartitions.mkString("[", ",", "]")
    // inner keys deliberately differ from the top-level field names: the
    // minimal parser matches fields by first regex occurrence
    val stats = m.bucketStats
      .map(s => s"""{"b":${s.bucket},"raw":${s.rawBytes},"enc":${s.encBytes},""" +
        s""""rows":${s.numRows},"nparts":${s.numPartitions}}""")
      .mkString("[", ",", "]")
    s"""{"columns":$cols,"numPartitions":${m.numPartitions},"blockSize":${m.blockSize},""" +
      s""""maxCascadeDepth":${m.maxCascadeDepth},"numRows":${m.numRows},""" +
      s""""rawBytes":${m.rawBytes},"encBytes":${m.encBytes},"completedPartitions":$done,""" +
      s""""bucketStats":$stats}"""
  }

  /** Minimal JSON parse (manifest is machine-written, flat, known shape). */
  def fromJson(json: String): BtrManifest = {
    def longField(name: String): Long = {
      val m = ("\"" + name + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json)
      m.map(_.group(1).toLong).getOrElse(0L)
    }
    // `nullable` is optional: manifests from before the null extension
    // (round 4 and earlier) omit it and parse as non-null — correct, since
    // those tables were written by a null-rejecting encoder
    val colRe = "\\{\"name\":\"((?:[^\"\\\\]|\\\\.)*)\",\"colType\":(\\d)(?:,\"nullable\":(true|false))?\\}".r
    val cols = colRe
      .findAllMatchIn(json)
      .map(m => ColumnMeta(unesc(m.group(1)), m.group(2).toInt, m.group(3) == "true"))
      .toSeq
    val doneRe = "\"completedPartitions\"\\s*:\\s*\\[([^\\]]*)\\]".r
    val done = doneRe
      .findFirstMatchIn(json)
      .map(_.group(1).trim)
      .filter(_.nonEmpty)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq.empty)
    val statRe =
      ("\\{\"b\":(-?\\d+),\"raw\":(-?\\d+),\"enc\":(-?\\d+)," +
        "\"rows\":(-?\\d+),\"nparts\":(-?\\d+)\\}").r
    val stats = statRe.findAllMatchIn(json).map(m =>
      BucketStat(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong,
        m.group(4).toLong, m.group(5).toLong)).toSeq
    BtrManifest(
      columns = cols,
      numPartitions = longField("numPartitions").toInt,
      blockSize = longField("blockSize").toInt,
      maxCascadeDepth = longField("maxCascadeDepth").toInt,
      numRows = longField("numRows"),
      rawBytes = longField("rawBytes"),
      encBytes = longField("encBytes"),
      completedPartitions = done,
      bucketStats = stats)
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
