package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * CROSS-SCALE SWEEP (round-5 standing gate): with SPARK_GRAFT_SWEEP=1 the
  * same run repeats at every sibling sf* directory of the given one (e.g.
  * sf0.001/sf0.01/sf0.1), writing each scale under `outDir/<sf>/`. The
  * sf0.001 sweep caught a real scale-dependent property in round 4
  * (text_fingerprint min-hash sketch collision), so it is part of the
  * round protocol (tools/sweep.sh drives it + the DuckDB compares); the
  * env gate keeps the driver's own budget unaffected.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sweep = sys.env.get("SPARK_GRAFT_SWEEP").exists(v => v.nonEmpty && v != "0")
    val targets: Seq[(String, String)] =
      if (!sweep) Seq(sfDir -> outDir)
      else {
        val base = Paths.get(sfDir.stripSuffix("/")).toAbsolutePath
        val parent = base.getParent
        val sfs = parent.toFile.listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("sf"))
          .map(_.getName).sorted.toSeq
        sfs.map(sf => s"$parent/$sf" -> s"$outDir/$sf")
      }

    for ((sf, out) <- targets) {
      System.err.println(s"[verify] scale $sf -> $out")
      new java.io.File(out).mkdirs()
      SparkEntry.queries.foreach { case (name, fn) =>
        try fn(spark, sf).coalesce(1).write.mode("overwrite")
          .parquet(s"$out/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed at $sf: ${e.getMessage}")
        }
      }
      // JSON string escape: backslash, quote, and ALL control chars (<0x20)
      // — a tab or CR in builder-authored SQL would otherwise make the
      // driver's json.load fail and silently zero the round's correctness.
      def q(s: String): String = "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
