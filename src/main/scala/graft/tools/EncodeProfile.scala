package graft.tools

import graft.codec.BtrConfig
import graft.engine.{BtrEncoder, BtrTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage encode-pipeline profile: isolates scan, encode kernel,
  * range-partition shuffle, and parquet write costs.
  */
object EncodeProfile {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val input = "file:/root/repo/target/tmp/bench_input"

    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val df = spark.read.parquet(input)
    t("scan only (count)") { df.count() }
    t("scan only again") { df.count() }
    t("scan + sum lengths") {
      df.select(sum(length(col("content")))).collect()
    }
    t("scan + encode (no shuffle/write)") {
      BtrEncoder.encodeToParts(df, BtrConfig.default).count()
    }
    t("scan + encode again") {
      BtrEncoder.encodeToParts(df, BtrConfig.default).count()
    }
    t("scan + repartitionByRange + encode") {
      BtrEncoder.encodeToParts(
        df.repartitionByRange(cores, col("repo"), col("path")),
        BtrConfig.default).count()
    }
    t("full write (BtrTable.write)") {
      BtrTable.write(df, "file:/root/repo/target/tmp/profile_btr",
        BtrConfig.default, rangeCols = Seq("repo", "path"))
    }
    t("write parts only, range") {
      BtrEncoder.encodeToParts(
        df.repartitionByRange(cores, col("repo"), col("path")), BtrConfig.default)
        .write.mode("overwrite").parquet("file:/root/repo/target/tmp/profile_p1")
    }
    t("write parts only, roundrobin") {
      BtrEncoder.encodeToParts(df.repartition(cores), BtrConfig.default)
        .write.mode("overwrite").parquet("file:/root/repo/target/tmp/profile_p2")
    }
    t("write parts only, no shuffle") {
      BtrEncoder.encodeToParts(df, BtrConfig.default)
        .write.mode("overwrite").parquet("file:/root/repo/target/tmp/profile_p3")
    }
    t("write parts uncompressed parquet") {
      BtrEncoder.encodeToParts(df.repartition(cores), BtrConfig.default)
        .write.mode("overwrite").option("compression", "none")
        .parquet("file:/root/repo/target/tmp/profile_p4")
    }
    t("manifest agg only") {
      spark.read.parquet("file:/root/repo/target/tmp/profile_p1")
        .agg(sum("rawBytes"), sum("encBytes")).collect()
    }
    t("full write AGAIN") {
      BtrTable.write(df, "file:/root/repo/target/tmp/profile_btr2",
        BtrConfig.default, rangeCols = Seq("repo", "path"))
    }
    t("write parts, range+salt (no manifest)") {
      val salted = df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(16)))
      BtrEncoder.encodeToParts(
        salted.repartitionByRange(cores, col("repo"), col("path"), col("__salt"))
          .drop("__salt"),
        BtrConfig.default)
        .write.mode("overwrite").parquet("file:/root/repo/target/tmp/profile_p5")
    }
    spark.stop()
  }
}
