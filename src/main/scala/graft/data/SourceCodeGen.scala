package graft.data

import org.apache.spark.sql.{Dataset, SparkSession}

/** One file of the Iceberg-style source-code table (BASELINE.json
  * input_hint): (repo, path, commit, lang, content) + a row_id join key for
  * the sha256 round-trip verification.
  */
final case class FileRow(
    row_id: Long,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Deterministic synthesizer of the source-code table — the seeded-generator
  * pattern of the reference's tests (generate_data(size, unique, runlength,
  * seed), /root/reference/src/lib.rs:469-488), scaled out: every row is a
  * pure function of (seed, row_id), so any partitioning/ordering yields the
  * same table and resumed runs regenerate identical data.
  *
  * Distribution targets each codec path (FIXTURES.md F3): Zipf-skewed repos
  * (exercises salting), low-cardinality lang (Dict/OneValue), high-entropy
  * commit hashes (Uncompressed/FSST floor), template code content (FSST).
  */
object SourceCodeGen {
  private val Langs = Array(
    "scala", "java", "python", "go", "rust", "c", "cpp", "js", "ts", "ruby")
  private val LangExt = Array(
    "scala", "java", "py", "go", "rs", "c", "cc", "js", "ts", "rb")
  // skewed lang popularity (sums to 100)
  private val LangCum = Array(30, 50, 65, 75, 82, 88, 92, 96, 98, 100)

  private val Dirs = Array(
    "src", "main", "core", "util", "engine", "service", "model", "api",
    "internal", "common", "test", "lib")
  private val Keywords = Array(
    "def ", "val ", "var ", "return ", "import ", "class ", "object ",
    "if (", "else ", "while (", "for (", "match ", "case ", "private ",
    "public ", "static ", "override ")
  private val Idents = Array(
    "index", "value", "result", "buffer", "stream", "count", "config",
    "handler", "context", "builder", "parser", "writer", "reader", "cache",
    "worker", "client")

  final val NumRepos = 50
  /** Zipf(1.2) cumulative mass over NumRepos repos. */
  private val RepoCum: Array[Double] = {
    val w = Array.tabulate(NumRepos)(i => 1.0 / math.pow(i + 1, 1.2))
    val total = w.sum
    val cum = new Array[Double](NumRepos)
    var acc = 0.0
    var i = 0
    while (i < NumRepos) { acc += w(i) / total; cum(i) = acc; i += 1 }
    cum(NumRepos - 1) = 1.0
    cum
  }

  @inline private def mix(seed: Long, id: Long): Long = {
    var x = seed ^ (id * 0x9e3779b97f4a7c15L)
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def row(id: Long, seed: Long): FileRow = {
    val rnd = new scala.util.Random(mix(seed, id))
    val u = rnd.nextDouble()
    var r = 0
    while (RepoCum(r) < u) r += 1
    val repo = s"org${r % 7}/repo$r"

    val lp = rnd.nextInt(100)
    var li = 0
    while (LangCum(li) <= lp) li += 1
    val lang = Langs(li)

    val depth = 1 + rnd.nextInt(4)
    val sb = new StringBuilder
    var d = 0
    while (d < depth) { sb.append(Dirs(rnd.nextInt(Dirs.length))).append('/'); d += 1 }
    sb.append("file_").append(rnd.nextInt(10000)).append('.').append(LangExt(li))
    val path = sb.toString

    val hex = "0123456789abcdef"
    val commit = {
      val cb = new Array[Char](40)
      var i = 0
      while (i < 40) { cb(i) = hex(rnd.nextInt(16)); i += 1 }
      new String(cb)
    }

    val lines = 5 + rnd.nextInt(40)
    val cb = new StringBuilder(lines * 40)
    var l = 0
    while (l < lines) {
      var ind = rnd.nextInt(4)
      while (ind > 0) { cb.append("  "); ind -= 1 }
      cb.append(Keywords(rnd.nextInt(Keywords.length)))
        .append(Idents(rnd.nextInt(Idents.length)))
        .append(" = ")
        .append(Idents(rnd.nextInt(Idents.length)))
        .append('(')
        .append(rnd.nextInt(1000))
        .append(")\n")
      l += 1
    }

    FileRow(id, repo, path, commit, lang, cb.toString)
  }

  /** n-row table; row content depends only on (seed, row_id). */
  def table(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[FileRow] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map(id => row(id, seed)))
  }
}
