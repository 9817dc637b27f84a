package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import graft.functions.TokenKernels

/** Extraction-path custom expressions: one-pass kernels replacing the
  * interpreted higher-order-function chains of the compiler's hot
  * path (see TokenKernels for the why). All stay inside whole-stage
  * codegen — `doGenCode` emits one static call. */
object TokenExpressions {
  def splitBlocks(tokens: Column, recordStart: Int): Column =
    ExpressionUtils.column(SplitBlocks(ExpressionUtils.expression(tokens), recordStart))
  def splitFields(block: Column, delim: Int): Column =
    ExpressionUtils.column(SplitFields(ExpressionUtils.expression(block), delim))
  def tokenFindAll(payload: Column, pattern: Seq[Int]): Column = {
    val pat = org.apache.spark.sql.functions.array(
      pattern.map(org.apache.spark.sql.functions.lit): _*)
    ExpressionUtils.column(TokenFindAll(
      ExpressionUtils.expression(payload), ExpressionUtils.expression(pat)))
  }
  def decodeJoin(payload: Column): Column =
    ExpressionUtils.column(DecodeJoin(ExpressionUtils.expression(payload)))
}

case class SplitBlocks(child: Expression, recordStart: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(ArrayType(IntegerType, containsNull = false))
  override def nullSafeEval(arr: Any): Any =
    TokenKernels.splitBlocks(arr.asInstanceOf[ArrayData], recordStart)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TokenKernels.splitBlocks($a, $recordStart)")
  override protected def withNewChildInternal(c: Expression): SplitBlocks = copy(child = c)
}

case class SplitFields(child: Expression, delim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(ArrayType(IntegerType, containsNull = false))
  override def nullSafeEval(arr: Any): Any =
    TokenKernels.splitFields(arr.asInstanceOf[ArrayData], delim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.TokenKernels.splitFields($a, $delim)")
  override protected def withNewChildInternal(c: Expression): SplitFields = copy(child = c)
}

case class TokenFindAll(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(p: Any, q: Any): Any =
    TokenKernels.findAll(p.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, q) => s"graft.functions.TokenKernels.findAll($p, $q)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenFindAll =
    copy(left = l, right = r)
}

case class DecodeJoin(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override def nullSafeEval(arr: Any): Any =
    TokenKernels.decodeJoin(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TokenKernels.decodeJoin($a)")
  override protected def withNewChildInternal(c: Expression): DecodeJoin = copy(child = c)
}
