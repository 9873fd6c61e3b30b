package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in batched
  * mapPartitions (the Scala analog of mapInPandas batch processing).
  *
  * The actual media decode is STUBBED — no image/audio libraries exist in
  * this container — behind `StubDecoder`, a deterministic fake that derives
  * "pixels" from payload bytes. Everything Spark-side is real and tested:
  * schema, binary handling, batch shape, partition-parallel feature
  * extraction, frame sampling.
  */
object MultimodalOps {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false))), nullable = false)))

  /** STUB media decoder: deterministic "decode" of payload bytes into a
    * fake pixel/sample buffer. A real deployment swaps this object for
    * javacv/ffmpeg bindings; the operator pipeline around it is unchanged.
    */
  object StubDecoder {
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(1, math.min(width * height, 4096)))
      var i = 0
      while (i < out.length) {
        out(i) = payload(i % math.max(1, payload.length))
        i += 1
      }
      out
    }
  }

  /** Synthesize a deterministic media table from the documents table
    * (payload = UTF-8 bytes of text; metadata derived from doc_id) —
    * exercises the binary-column path end-to-end without external data.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("n_frames")).as("meta"))

  /** Batched feature extraction over the decoded (stub) pixels: byte
    * histogram entropy + mean + payload size, one row per media item.
    * Runs partition-parallel, constant memory per batch.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload_bytes", LongType, nullable = false),
      StructField("mean_level", DoubleType, nullable = false),
      StructField("entropy", DoubleType, nullable = false)))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "kind", "payload", "meta.width", "meta.height")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val pixels = StubDecoder.decode(payload, r.getAs[Int]("width"), r.getAs[Int]("height"))
          val hist = new Array[Long](256)
          var sum = 0.0
          var i = 0
          while (i < pixels.length) {
            hist(pixels(i) & 0xff) += 1
            sum += (pixels(i) & 0xff)
            i += 1
          }
          var entropy = 0.0
          var b = 0
          while (b < 256) {
            if (hist(b) > 0) {
              val p = hist(b).toDouble / pixels.length
              entropy -= p * math.log(p) / math.log(2)
            }
            b += 1
          }
          // floor(x*1e4 + 0.5): half-away-from-zero for positives — the
          // rounding DuckDB-expressible as floor(x*10000 + 0.5)/10000, so
          // the oracle reproduces identical doubles (math.rint is half-even
          // and diverges on exact .5 cases like 93.90625)
          Row(
            r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            payload.length.toLong,
            math.floor(sum / pixels.length * 10000 + 0.5) / 10000,
            math.floor(entropy * 10000 + 0.5) / 10000)
        }
      }
  }

  /** Deterministic frame sampling for "video" rows: every ceil(n/maxFrames)
    * frame index — the partition/batch shape of real frame extraction.
    */
  def sampleFrames(media: DataFrame, maxFrames: Int = 4): DataFrame =
    media.filter(col("kind") === "video")
      .select(
        col("media_id"),
        explode(sequence(
          lit(0),
          (col("meta.n_frames") - 1).cast("int"),
          greatest(floor((col("meta.n_frames") + (maxFrames - 1)) / maxFrames), lit(1))
            .cast("int")))
          .as("frame_idx"))
}
