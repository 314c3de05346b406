package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import graft.functions.ProtoWire.ProtoMessage

/** Codegen'd column forms of the [[ProtoWire]] codec (M1/M2). All three stay
  * inside whole-stage codegen: the generated code is one static call into
  * the codec per row, with bytes taken directly from the scan buffer. */

/** `proto_decode(value, msg)`: BINARY → STRUCT per the descriptor; null on
  * malformed bytes (E9 — splitCorrupt routes those to the DLQ). */
case class ProtoDecode(child: Expression, msg: ProtoMessage)
    extends UnaryExpression {
  override def dataType: DataType = msg.sparkType
  override def nullable: Boolean = true
  override def prettyName: String = "proto_decode"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"proto_decode requires BINARY, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    ProtoWire.decode(input.asInstanceOf[Array[Byte]], msg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val msgRef = ctx.addReferenceObj("protoMsg", msg)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.ProtoWire.decode(${childGen.value}, $msgRef);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoDecode =
    copy(child = newChild)
}

/** `proto_encode(struct, msg)`: STRUCT → BINARY wire bytes (proto3 default
  * omission, packed repeated numerics). The struct's field order must match
  * the descriptor's. */
case class ProtoEncode(child: Expression, msg: ProtoMessage)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "proto_encode"
  private def sameIgnoreNull(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: org.apache.spark.sql.types.StructType,
        y: org.apache.spark.sql.types.StructType) =>
      x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
        f.name == g.name && sameIgnoreNull(f.dataType, g.dataType) }
    case (org.apache.spark.sql.types.ArrayType(x, _),
        org.apache.spark.sql.types.ArrayType(y, _)) => sameIgnoreNull(x, y)
    // valueContainsNull is ignored like every other nullability flag
    // (from_json and most map-producing expressions yield true where
    // the descriptor's sparkType pins false); a runtime null map value
    // encodes as an omitted value field — proto3's default semantics
    case (org.apache.spark.sql.types.MapType(xk, xv, _),
        org.apache.spark.sql.types.MapType(yk, yv, _)) =>
      sameIgnoreNull(xk, yk) && sameIgnoreNull(xv, yv)
    case _ => a == b
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (sameIgnoreNull(child.dataType, msg.sparkType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"proto_encode requires ${msg.sparkType.simpleString}, " +
        s"got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    ProtoWire.encode(
      input.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow], msg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val msgRef = ctx.addReferenceObj("protoMsg", msg)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ProtoWire.encode($c, $msgRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoEncode =
    copy(child = newChild)
}

/** `proto_struct_json(value)`: `google.protobuf.Struct` wire bytes → JSON
  * string (M2 Struct flatten); null on malformed bytes. */
case class ProtoStructJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "proto_struct_json"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"proto_struct_json requires BINARY, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    ProtoWire.decodeStructJson(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      UTF8String ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.ProtoWire.decodeStructJson(${childGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoStructJson =
    copy(child = newChild)
}

object ProtoFunctions {
  def protoDecode(value: Column, msg: ProtoMessage): Column =
    ColumnBridge.column(ProtoDecode(ColumnBridge.expression(value), msg))
  def protoEncode(struct: Column, msg: ProtoMessage): Column =
    ColumnBridge.column(ProtoEncode(ColumnBridge.expression(struct), msg))
  def protoStructJson(value: Column): Column =
    ColumnBridge.column(ProtoStructJson(ColumnBridge.expression(value)))
}
