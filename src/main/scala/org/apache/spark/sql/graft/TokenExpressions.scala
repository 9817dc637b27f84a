package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
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
  def payloadsForTag(fields: Column, tag: Int): Column =
    ExpressionUtils.column(PayloadsForTag(ExpressionUtils.expression(fields), tag))
  def decodeAll(payloads: Column, ops: Int): Column =
    ExpressionUtils.column(DecodeAll(ExpressionUtils.expression(payloads), ops))
  def findAllFlat(payloads: Column, pattern: Seq[Int]): Column = {
    val pat = org.apache.spark.sql.functions.array(
      pattern.map(org.apache.spark.sql.functions.lit): _*)
    ExpressionUtils.column(FindAllFlat(
      ExpressionUtils.expression(payloads), ExpressionUtils.expression(pat)))
  }
  def intJoinAll(payloads: Column): Column =
    ExpressionUtils.column(IntJoinAll(ExpressionUtils.expression(payloads)))
  def synthPage(key: Column, ns: String): Column =
    ExpressionUtils.column(SynthPage(ExpressionUtils.expression(key), ns))
}

/** `synth_page(key) -> array<int>`: the deterministic key→page
  * function of the synthetic web (TokenGen.synthTokens) as a codegen
  * expression — the test/bench stand-in for a stored-table lookup
  * resolve, kept narrow so the details/crawl resolvers have no typed
  * map or Encoder round-trip in their plans. */
case class SynthPage(child: Expression, ns: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(k: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      graft.gen.TokenGen.synthTokens(ns, k.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", ns, "java.lang.String")
    defineCodeGen(ctx, ev, k =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.gen.TokenGen.synthTokens($nsRef, $k.toString()))")
  }
  override protected def withNewChildInternal(c: Expression): SynthPage = copy(child = c)
}

/** `decode_all(array<array<int>>) -> array<string>`: decodeJoin +
  * packed filter chain per payload (TokenKernels.decodeAll). */
case class DecodeAll(child: Expression, ops: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(ArrayType(IntegerType)))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(p: Any): Any =
    TokenKernels.decodeAll(p.asInstanceOf[ArrayData], ops)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.TokenKernels.decodeAll($p, $ops)")
  override protected def withNewChildInternal(c: Expression): DecodeAll = copy(child = c)
}

/** `find_all_flat(array<array<int>>, pattern) -> array<int>`: per-
  * payload findAll positions, flattened. */
case class FindAllFlat(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ArrayType(IntegerType)), ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(p: Any, q: Any): Any =
    TokenKernels.findAllFlat(p.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, q) => s"graft.functions.TokenKernels.findAllFlat($p, $q)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FindAllFlat =
    copy(left = l, right = r)
}

/** `int_join_all(array<array<int>>) -> string`: decimal tokens
  * space-joined per payload, payloads '|'-joined. */
case class IntJoinAll(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(ArrayType(IntegerType)))
  override def dataType: DataType = StringType
  override def nullSafeEval(p: Any): Any =
    TokenKernels.intJoinAll(p.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.TokenKernels.intJoinAll($p)")
  override protected def withNewChildInternal(c: Expression): IntJoinAll = copy(child = c)
}

/** `payloads_for_tag(array<array<int>>) -> array<array<int>>`: the
  * tag-stripped payloads of the fields headed by `tag` (fused
  * filter+slice of the extraction compiler's per-selector pair). */
case class PayloadsForTag(child: Expression, tag: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(ArrayType(IntegerType)))
  override def dataType: DataType = ArrayType(ArrayType(IntegerType, containsNull = false))
  override def nullSafeEval(fields: Any): Any =
    TokenKernels.payloadsForTag(fields.asInstanceOf[ArrayData], tag)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, f =>
      s"graft.functions.TokenKernels.payloadsForTag($f, $tag)")
  override protected def withNewChildInternal(c: Expression): PayloadsForTag = copy(child = c)
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
