package graft.tools

import graft.codec._
import graft.data.SourceCodeGen
import java.nio.charset.StandardCharsets.UTF_8

/** Single-threaded codec micro-benchmark (no Spark): MB/s per column type.
  * Isolates kernel cost from Spark overheads when tuning.
  */
object CodecBench {
  def time[T](label: String, bytes: Long, reps: Int)(f: => T): Unit = {
    f // warmup
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) { f; i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9 / reps
    println(f"$label%-28s ${bytes / 1e6 / sec}%8.1f MB/s  (${sec * 1000}%7.1f ms)")
  }

  def main(args: Array[String]): Unit = {
    val cfg = BtrConfig.default
    val rows = sys.env.getOrElse("CODEC_BENCH_ROWS", "65536").toInt

    // isolate FSST training cost
    locally {
      val sample = Array.tabulate(4096)(i => SourceCodeGen.row(i.toLong, 42L).content.getBytes(UTF_8))
      val buf = new BufWriter()
      sample.foreach(s => buf.bytes(s, 0, math.min(s.length, 64)))
      val trainBytes = buf.result()
      time("fsst train (64KB sample)", trainBytes.length.toLong.min(65536), 5) { Fsst.train(trainBytes) }
    }

    // content strings (FSST path) — the encode-dominating column
    val contents = Array.tabulate(rows)(i => SourceCodeGen.row(i.toLong, 42L).content.getBytes(UTF_8))
    val contentBytes = contents.map(_.length.toLong).sum
    time("string content encode", contentBytes, 3) { StringCodec.encode(contents, cfg) }
    val encC = StringCodec.encode(contents, cfg)
    println(f"  content ratio ${contentBytes.toDouble / encC.length}%.2f scheme ${StringCodec.describeBlock(encC)}")
    time("string content decode", contentBytes, 3) { StringCodec.decode(encC) }
    time("content decode (arena)", contentBytes, 3) {
      StringCodec.decodeSlices(new BufReader(encC))
    }

    // low-card strings (dict path)
    val langs = Array.tabulate(rows)(i => SourceCodeGen.row(i.toLong, 42L).lang.getBytes(UTF_8))
    val langBytes = langs.map(_.length.toLong).sum
    time("string lang encode", langBytes, 5) { StringCodec.encode(langs, cfg) }
    val encL = StringCodec.encode(langs, cfg)
    time("lang decode (arena)", langBytes, 10) {
      StringCodec.decodeSlices(new BufReader(encL))
    }

    // commits (high entropy)
    val commits = Array.tabulate(rows)(i => SourceCodeGen.row(i.toLong, 42L).commit.getBytes(UTF_8))
    val commitBytes = commits.map(_.length.toLong).sum
    time("string commit encode", commitBytes, 3) { StringCodec.encode(commits, cfg) }
    val encK = StringCodec.encode(commits, cfg)
    println(f"  commit ratio ${commitBytes.toDouble / encK.length}%.2f scheme ${StringCodec.describeBlock(encK)}")

    // ints
    val rnd = new scala.util.Random(1)
    val ints = Array.fill(rows * 4)(rnd.nextInt(4096))
    time("int encode", ints.length * 4L, 10) { IntCodec.encode(ints, cfg) }
    val encI = IntCodec.encode(ints, cfg)
    time("int decode", ints.length * 4L, 10) { IntCodec.decode(encI) }

    // doubles
    val dbls = Array.fill(rows * 4)(rnd.nextInt(100000) / 100.0)
    time("double encode", dbls.length * 8L, 10) { DoubleCodec.encode(dbls, cfg) }
    val encD = DoubleCodec.encode(dbls, cfg)
    time("double decode", dbls.length * 8L, 10) { DoubleCodec.decode(encD) }
  }
}
