package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Round-trip + selector tests per FIXTURES.md F2; mirrors the reference's
  * per-column round-trip tests (/root/reference/src/lib.rs:390-421) and
  * seeded-random test (:423-467).
  */
class CodecSpec extends AnyFunSuite {
  val cfg = BtrConfig.default

  def rtInt(v: Array[Int]): Unit = {
    val enc = IntCodec.encode(v, cfg)
    val dec = IntCodec.decode(enc)
    assert(dec.sameElements(v), s"int roundtrip failed (n=${v.length})")
  }

  def rtDouble(v: Array[Double]): Unit = {
    val enc = DoubleCodec.encode(v, cfg)
    val dec = DoubleCodec.decode(enc)
    assert(dec.length == v.length)
    var i = 0
    while (i < v.length) {
      assert(
        java.lang.Double.doubleToRawLongBits(dec(i)) == java.lang.Double.doubleToRawLongBits(v(i)),
        s"double bit mismatch at $i: ${v(i)} vs ${dec(i)}")
      i += 1
    }
  }

  def rtString(v: Array[String]): Unit = {
    val bytes = v.map(_.getBytes(UTF_8))
    val enc = StringCodec.encode(bytes, cfg)
    val dec = StringCodec.decode(enc)
    assert(dec.length == v.length)
    var i = 0
    while (i < v.length) {
      assert(java.util.Arrays.equals(dec(i), bytes(i)), s"string mismatch at $i: '${v(i)}' vs '${new String(dec(i), UTF_8)}'")
      i += 1
    }
  }

  /** Mirror of the reference's seeded generator generate_data(size, unique,
    * runlength, seed) — /root/reference/src/lib.rs:469-488 (pattern, not code).
    */
  def genData(size: Int, unique: Int, runLength: Int, seed: Long): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    val out = new Array[Int](size)
    var i = 0
    while (i < size) {
      val v = rnd.nextInt(unique)
      var r = 0
      while (r < runLength && i < size) { out(i) = v; i += 1; r += 1 }
    }
    out
  }

  // ---------------------------------------------------------------- ints

  val edgeSizes = Seq(0, 1, 2, 65535, 65536, 65537)

  test("int constant -> OneValue, all edge sizes") {
    for (n <- edgeSizes) {
      val v = Array.fill(n)(42)
      rtInt(v)
      if (n > 0) {
        val tag = new BufReader(IntCodec.encode(v, cfg)).u8()
        assert(tag == IntCodec.TagOneValue)
      }
    }
  }

  test("int low-cardinality") {
    val rnd = new scala.util.Random(7)
    val v = Array.fill(100000)(rnd.nextInt(16) * 1000003)
    rtInt(v)
    val enc = IntCodec.encode(v, cfg)
    assert(enc.length < v.length * 4 / 4, s"low-card should compress >=4x, got ${enc.length}")
  }

  test("int runs (reference generate_data 640k/4095/40)") {
    for (seed <- Seq(69L, 42L)) {
      val v = genData(640000, 4095, 40, seed)
      rtInt(v)
      val enc = IntCodec.encode(v, cfg)
      val ratio = v.length * 4.0 / enc.length
      assert(ratio > 8.0, s"run-heavy data should compress >8x, got $ratio")
    }
  }

  test("int dense range -> FBP") {
    val v = Array.tabulate(100000)(i => 1000000 + (i % 250))
    rtInt(v)
    val enc = IntCodec.encode(v, cfg)
    assert(enc.length < v.length * 4 / 2)
  }

  test("int skewed -> Frequency") {
    val rnd = new scala.util.Random(11)
    val v = Array.fill(100000)(if (rnd.nextInt(100) < 95) 777 else rnd.nextInt())
    rtInt(v)
    val enc = IntCodec.encode(v, cfg)
    assert(enc.length < v.length * 4 / 3)
  }

  test("int random stays ~uncompressed and round-trips") {
    val rnd = new scala.util.Random(13)
    val v = Array.fill(70000)(rnd.nextInt())
    rtInt(v)
    val enc = IntCodec.encode(v, cfg)
    assert(enc.length <= v.length * 4 + 64)
  }

  test("int extremes (Int.MinValue / MaxValue mixed)") {
    rtInt(Array(Int.MinValue, Int.MaxValue, 0, -1, 1, Int.MinValue, Int.MaxValue))
    rtInt(Array.tabulate(70000)(i => if (i % 2 == 0) Int.MinValue else Int.MaxValue))
  }

  test("int property: decode(encode(x)) == x over 50 seeded random shapes") {
    val rnd = new scala.util.Random(1001)
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(2000)
      rtInt(Array.fill(n)(rnd.nextInt()))
      rtInt(genData(n, math.max(1, rnd.nextInt(100)), math.max(1, rnd.nextInt(50)), rnd.nextLong()))
    }
  }

  // ---------------------------------------------------------------- doubles

  test("double constant / edge sizes") {
    for (n <- edgeSizes) rtDouble(Array.fill(n)(3.14159))
  }

  test("double decimal-like (prices) -> Pseudodecimal") {
    val rnd = new scala.util.Random(17)
    val v = Array.fill(100000)((rnd.nextInt(100000)) / 100.0)
    rtDouble(v)
    val enc = DoubleCodec.encode(v, cfg)
    assert(enc.length < v.length * 8 / 2, s"decimal data should compress >2x, got ${v.length * 8.0 / enc.length}x")
  }

  test("double runs") {
    val base = genData(200000, 500, 40, 42L)
    val v = base.map(_ * 0.25)
    rtDouble(v)
    assert(DoubleCodec.encode(v, cfg).length < v.length * 8 / 4)
  }

  test("double specials bit-identical (NaN payloads, -0.0, inf, subnormal)") {
    val weird = Array(
      0.0, -0.0, Double.NaN, java.lang.Double.longBitsToDouble(0x7ff8000000000123L),
      Double.PositiveInfinity, Double.NegativeInfinity, Double.MinPositiveValue,
      java.lang.Double.MIN_NORMAL, Double.MaxValue, -Double.MaxValue, 1.0 / 3.0)
    rtDouble(weird)
    rtDouble(Array.tabulate(70000)(i => weird(i % weird.length)))
  }

  test("double property: bit-identical roundtrip over 50 seeded random shapes") {
    val rnd = new scala.util.Random(1002)
    val specials = Array(Double.NaN, 0.0, -0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(2000)
      rtDouble(Array.fill(n)(rnd.nextInt(4) match {
        case 0 => java.lang.Double.longBitsToDouble(rnd.nextLong())
        case 1 => math.rint(rnd.nextDouble() * 100000) / 100
        case 2 => specials(rnd.nextInt(specials.length))
        case _ => rnd.nextDouble() * 1e18 - 5e17
      }))
    }
  }

  // ---------------------------------------------------------------- strings

  test("string constant / edge sizes") {
    for (n <- Seq(0, 1, 2, 65537)) rtString(Array.fill(n)("hello world"))
  }

  test("string low-cardinality -> Dict") {
    val langs = Array("scala", "rust", "python", "go", "java", "c", "cpp", "js")
    val rnd = new scala.util.Random(23)
    val v = Array.fill(50000)(langs(rnd.nextInt(langs.length)))
    rtString(v)
    val enc = StringCodec.encode(v.map(_.getBytes(UTF_8)), cfg)
    val raw = v.map(_.length).sum
    assert(enc.length < raw / 4, s"low-card strings should compress >4x, got ${raw.toDouble / enc.length}")
    assert(StringCodec.describeBlock(enc).startsWith("Dict"))
  }

  test("string code-like text -> FSST compresses >2x") {
    val rnd = new scala.util.Random(29)
    val kw = Array("def ", "val ", "return ", "import ", "class ", "object ", "match ", "case ")
    val ids = Array("index", "value", "result", "buffer", "stream", "count")
    val v = Array.fill(20000) {
      val sb = new StringBuilder
      for (_ <- 0 until 5)
        sb.append("  " * rnd.nextInt(4)).append(kw(rnd.nextInt(kw.length)))
          .append(ids(rnd.nextInt(ids.length))).append(" = ")
          .append(ids(rnd.nextInt(ids.length))).append("(").append(rnd.nextInt(100)).append(")\n")
      sb.toString
    }
    rtString(v)
    val bytes = v.map(_.getBytes(UTF_8))
    val raw = bytes.map(_.length).sum
    val enc = StringCodec.encode(bytes, cfg)
    assert(enc.length * 2 < raw, s"code text should compress >2x, got ${raw.toDouble / enc.length}x")
  }

  test("string high-entropy (commit hashes) round-trips") {
    val rnd = new scala.util.Random(31)
    val v = Array.fill(20000)(Seq.fill(40)("0123456789abcdef" (rnd.nextInt(16))).mkString)
    rtString(v)
  }

  test("string empty strings, unicode, binary-ish") {
    rtString(Array("", "", "a", "", "日本語テキスト", "emoji 🎉🎊", "tab\tnewline\nnull"))
    val rnd = new scala.util.Random(1003)
    for (_ <- 0 until 30) {
      val n = rnd.nextInt(500)
      rtString(Array.fill(n)(rnd.nextInt(3) match {
        case 0 => ""
        case 1 => rnd.alphanumeric.take(rnd.nextInt(30)).mkString
        case _ => Array.fill(rnd.nextInt(20))(rnd.nextPrintableChar()).mkString
      }))
    }
  }

  // ---------------------------------------------------------------- fsst unit

  test("fsst: table round-trip on repetitive text") {
    val text = ("http://www.example.org/path/to/resource?id=" * 500).getBytes(UTF_8)
    val table = Fsst.train(text)
    assert(table.symbols.nonEmpty)
    val out = new BufWriter()
    val clen = table.compress(text, 0, text.length, out)
    assert(clen < text.length / 2, s"fsst should halve urls, got $clen vs ${text.length}")
    val dec = table.decompress(new BufReader(out.result()), clen)
    assert(java.util.Arrays.equals(dec, text))
  }

  test("fsst: empty table escapes everything") {
    val table = new FsstTable(Array.empty)
    val data = Array[Byte](1, 2, 3, -1, 0)
    val out = new BufWriter()
    val clen = table.compress(data, 0, data.length, out)
    assert(clen == data.length * 2)
    assert(java.util.Arrays.equals(table.decompress(new BufReader(out.result()), clen), data))
  }

  test("fsst: 0xFF bytes (escape collision) round-trip") {
    val data = Array.fill[Byte](1000)(-1) // 0xFF
    val table = Fsst.train(data)
    val out = new BufWriter()
    val clen = table.compress(data, 0, data.length, out)
    assert(java.util.Arrays.equals(table.decompress(new BufReader(out.result()), clen), data))
  }

  // ----------------------------------------------------------- arena slices

  def rtSlices(v: Array[String]): Unit = {
    val b = new StrSlicesBuilder()
    v.foreach(s => b.add(s.getBytes(UTF_8)))
    val out = new BufWriter()
    StringCodec.encodeSlices(out, b.result(), cfg.maxCascadeDepth, cfg)
    val dec = StringCodec.decode(out.result())
    assert(dec.length == v.length)
    var i = 0
    while (i < v.length) {
      assert(java.util.Arrays.equals(dec(i), v(i).getBytes(UTF_8)), s"slices mismatch at $i")
      i += 1
    }
  }

  test("slices encode: all string shapes round-trip via the arena path") {
    rtSlices(Array.empty)
    rtSlices(Array(""))
    rtSlices(Array.fill(70000)("const"))
    val langs = Array("scala", "rust", "python", "go")
    val rnd = new scala.util.Random(41)
    rtSlices(Array.fill(5000)(langs(rnd.nextInt(langs.length)))) // dict
    rtSlices(Array.fill(3000) { // fsst
      s"def f_${rnd.nextInt(50)}(x) = buffer.stream(${rnd.nextInt(100)})\n" * 5
    })
    rtSlices(Array.fill(2000)(Seq.fill(40)("0123456789abcdef" (rnd.nextInt(16))).mkString)) // high entropy
    rtSlices(Array.tabulate(1000)(i => if (i % 3 == 0) "" else s"v$i")) // empties mixed
  }

  test("slices and array paths choose the same scheme") {
    val rnd = new scala.util.Random(43)
    val langs = Array("en", "de", "fr")
    val dictData = Array.fill(4000)(langs(rnd.nextInt(3)))
    val b = new StrSlicesBuilder()
    dictData.foreach(s => b.add(s.getBytes(UTF_8)))
    val w = new BufWriter()
    StringCodec.encodeSlices(w, b.result(), cfg.maxCascadeDepth, cfg)
    val viaSlices = StringCodec.describeBlock(w.result())
    val viaArrays = StringCodec.describeBlock(StringCodec.encode(dictData.map(_.getBytes(UTF_8)), cfg))
    assert(viaSlices == viaArrays, s"$viaSlices vs $viaArrays")
    assert(viaSlices.startsWith("Dict"))
  }

  // ------------------------------------------------------------- cascading

  test("dict->fsst cascade on low-card long strings") {
    val paths = Array.tabulate(64)(i => s"src/main/scala/com/example/project/module$i/Service$i.scala")
    val rnd = new scala.util.Random(37)
    val v = Array.fill(50000)(paths(rnd.nextInt(paths.length)))
    rtString(v)
    val enc = StringCodec.encode(v.map(_.getBytes(UTF_8)), cfg)
    val desc = StringCodec.describeBlock(enc)
    assert(desc.startsWith("Dict"), desc)
  }
}
