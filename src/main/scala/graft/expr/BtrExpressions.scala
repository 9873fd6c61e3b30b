package graft.expr

import graft.codec._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression layer over the codec kernels (SURVEY §2 E3-E5/D3-D5
  * as scalar expressions; the reference exposes them only as Rust functions,
  * /root/reference/src/ffi.rs:27-75). CodegenFallback is deliberate: each
  * call compresses a whole chunk, so codegen wins are negligible (SURVEY §4)
  * while the surrounding plan stays in whole-stage codegen.
  */
abstract class BtrUnary extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = child.nullable
}

case class BtrEncodeInt(child: Expression) extends BtrUnary with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  override def inputTypes = Seq(ArrayType(IntegerType))
  override def nullSafeEval(v: Any): Any =
    IntCodec.encode(v.asInstanceOf[ArrayData].toIntArray())
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "btr_encode_int"
}

case class BtrDecodeInt(child: Expression) extends BtrUnary with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes = Seq(BinaryType)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(IntCodec.decode(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "btr_decode_int"
}

case class BtrEncodeDouble(child: Expression) extends BtrUnary with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def nullSafeEval(v: Any): Any =
    DoubleCodec.encode(v.asInstanceOf[ArrayData].toDoubleArray())
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "btr_encode_double"
}

case class BtrDecodeDouble(child: Expression) extends BtrUnary with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def inputTypes = Seq(BinaryType)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(DoubleCodec.decode(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "btr_decode_double"
}

case class BtrEncodeString(child: Expression) extends BtrUnary with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryType
  override def inputTypes = Seq(ArrayType(StringType))
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = arr.getUTF8String(i).getBytes; i += 1 }
    StringCodec.encode(bytes)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "btr_encode_string"
}

case class BtrDecodeString(child: Expression) extends BtrUnary with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(BinaryType)
  override def nullSafeEval(v: Any): Any = {
    val decoded = StringCodec.decode(v.asInstanceOf[Array[Byte]])
    new GenericArrayData(decoded.map(b => UTF8String.fromBytes(b)): Array[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "btr_decode_string"
}

/** Scheme-tree description of an encoded block (codec-choice lineage). */
case class BtrSchemeOf(child: Expression, colType: Int) extends BtrUnary {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val desc = colType match {
      case ColType.Integer => IntCodec.describe(new BufReader(bytes))
      case ColType.Double  => DoubleCodec.describe(new BufReader(bytes))
      case ColType.String  => StringCodec.describeBlock(bytes)
    }
    UTF8String.fromString(desc)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "btr_scheme_of"
}

/** Column-API wrappers + SQL registration. */
object BtrFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim.{column, expression}

  def btr_encode_int(c: Column): Column = column(BtrEncodeInt(expression(c)))
  def btr_decode_int(c: Column): Column = column(BtrDecodeInt(expression(c)))
  def btr_encode_double(c: Column): Column = column(BtrEncodeDouble(expression(c)))
  def btr_decode_double(c: Column): Column = column(BtrDecodeDouble(expression(c)))
  def btr_encode_string(c: Column): Column = column(BtrEncodeString(expression(c)))
  def btr_decode_string(c: Column): Column = column(BtrDecodeString(expression(c)))
  def btr_scheme_int(c: Column): Column = column(BtrSchemeOf(expression(c), ColType.Integer))
  def btr_scheme_double(c: Column): Column = column(BtrSchemeOf(expression(c), ColType.Double))
  def btr_scheme_string(c: Column): Column = column(BtrSchemeOf(expression(c), ColType.String))

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "btr_encode_int" -> (es => BtrEncodeInt(es.head)),
    "btr_decode_int" -> (es => BtrDecodeInt(es.head)),
    "btr_encode_double" -> (es => BtrEncodeDouble(es.head)),
    "btr_decode_double" -> (es => BtrDecodeDouble(es.head)),
    "btr_encode_string" -> (es => BtrEncodeString(es.head)),
    "btr_decode_string" -> (es => BtrDecodeString(es.head)),
    "btr_scheme_int" -> (es => BtrSchemeOf(es.head, ColType.Integer)),
    "btr_scheme_double" -> (es => BtrSchemeOf(es.head, ColType.Double)),
    "btr_scheme_string" -> (es => BtrSchemeOf(es.head, ColType.String)))

  /** Register for spark.sql use in an existing session. */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Injection path for SparkSessionExtensions. */
  def inject(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.expr.BtrExpressions", name),
        builder))
    }
}

/** SparkSessionExtensions entry point:
  * .config("spark.sql.extensions", "graft.expr.GraftExtensions")
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    BtrFunctions.inject(e)
}
