package graft.expr

import graft.expr.BtrFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalyst expression layer: Column API, SQL registration, extensions. */
class ExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("expr-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.expr.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("btr_encode_int/btr_decode_int round-trip via Column API") {
    val df = Seq((1, Seq(5, 5, 5, 9, 9, 1, 2, 3)), (2, Seq.empty[Int]), (3, Seq(Int.MinValue, Int.MaxValue)))
      .toDF("id", "xs")
    val out = df.select($"id", btr_decode_int(btr_encode_int($"xs")).as("ys"))
      .as[(Int, Seq[Int])].collect().toMap
    assert(out(1) == Seq(5, 5, 5, 9, 9, 1, 2, 3))
    assert(out(2) == Seq.empty)
    assert(out(3) == Seq(Int.MinValue, Int.MaxValue))
  }

  test("btr_encode_double/string round-trip via Column API") {
    val df = Seq((1, Seq(1.5, -0.0, Double.NaN), Seq("a", "", "hello hello hello")))
      .toDF("id", "ds", "ss")
    val r = df.select(
      btr_decode_double(btr_encode_double($"ds")).as("ds2"),
      btr_decode_string(btr_encode_string($"ss")).as("ss2"))
      .as[(Seq[Double], Seq[String])].head()
    assert(r._1(0) == 1.5)
    assert(java.lang.Double.doubleToRawLongBits(r._1(1)) == java.lang.Double.doubleToRawLongBits(-0.0))
    assert(r._1(2).isNaN)
    assert(r._2 == Seq("a", "", "hello hello hello"))
  }

  test("SQL surface via SparkSessionExtensions injection") {
    val schemes = spark.sql(
      """SELECT btr_scheme_int(btr_encode_int(array_repeat(7, 1000))) AS s1,
        |       btr_scheme_string(btr_encode_string(array('x','y','x','y'))) AS s2,
        |       btr_decode_int(btr_encode_int(sequence(1, 100))) AS xs
        |""".stripMargin).head()
    assert(schemes.getString(0) == "One")
    assert(schemes.getAs[scala.collection.Seq[Int]]("xs").toSeq == (1 to 100))
  }

  test("SQL surface via explicit register()") {
    val s2 = spark.newSession()
    BtrFunctions.register(s2)
    // decimal array literal exercises the ImplicitCastInputTypes coercion
    val r = s2.sql("SELECT btr_decode_double(btr_encode_double(array(1.0, 2.5, 2.5))) AS v").head()
    assert(r.getAs[scala.collection.Seq[Double]]("v").toSeq == Seq(1.0, 2.5, 2.5))
  }

  test("null input propagates null") {
    val r = spark.sql("SELECT btr_encode_int(CAST(NULL AS ARRAY<INT>)) AS v").head()
    assert(r.isNullAt(0))
  }

  test("type mismatch fails analysis") {
    val e = intercept[Exception] {
      spark.sql("SELECT btr_encode_int(array('a'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("btr_encode_int") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch") ||
      e.getMessage.toLowerCase.contains("cannot resolve"))
  }
}
