package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import graft.functions.VectorKernels

/**
 * Catalyst expression bridge. Lives inside the org.apache.spark.sql
 * package tree because `AbstractDataType` / `TypeCollection` /
 * `ExpressionUtils.column` are `private[sql]` — the standard pattern
 * for Spark extension libraries that add native expressions. The
 * kernels themselves are plain code in [[graft.functions.VectorKernels]].
 */
object GraftExpressions {
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def simhash64(words: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(words)))
  def hyperplaneBucket(v: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(HyperplaneBucket(ExpressionUtils.expression(v), planes))
  def minhashSig(sh: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    ExpressionUtils.column(MinhashSig(ExpressionUtils.expression(sh), a, b, p))
  def shingleSet(words: Column, n: Int): Column =
    ExpressionUtils.column(ShingleSet(ExpressionUtils.expression(words), n))
  def ivfProbes(v: Column, cents: Array[Array[Double]], nProbe: Int): Column =
    ExpressionUtils.column(IvfProbes(ExpressionUtils.expression(v), cents, nProbe))
  def gramHashes(words: Column, n: Int): Column =
    ExpressionUtils.column(GramHashes(ExpressionUtils.expression(words), n))
  def winnowSelect(hashes: Column, window: Int): Column =
    ExpressionUtils.column(WinnowSelect(ExpressionUtils.expression(hashes), window))
}

/** `gram_hashes(array<string>) -> array<bigint>`: xxhash64 (seed 42,
  * = SQL xxhash64 of the concat_ws(" ") gram) per n-word gram. */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(words: Any): Any =
    VectorKernels.gramHashes(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.VectorKernels.gramHashes($w, $n)")

  override protected def withNewChildInternal(c: Expression): GramHashes = copy(child = c)
}

/** `winnow_select(array<bigint>) -> array<bigint>`: sorted distinct
  * window-minima (winnowing fingerprint selection), one O(n) pass. */
case class WinnowSelect(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(hashes: Any): Any =
    VectorKernels.winnowSelect(hashes.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.VectorKernels.winnowSelect($h, $window)")

  override protected def withNewChildInternal(c: Expression): WinnowSelect = copy(child = c)
}

/** `ivf_probes(array<float|double>) -> array<int>`: top-nProbe
  * centroid cells by cosine, descending (VectorKernels.probeCells). */
case class IvfProbes(child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.probeCells(v.asInstanceOf[ArrayData], cents, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorKernels.probeCells($v, $ref, $nProbe, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): IvfProbes = copy(child = c)
}

/** `shingle_set(array<string>) -> array<string>`: distinct n-word
  * shingles, first-occurrence order (VectorKernels.shingleSet). */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(words: Any): Any =
    VectorKernels.shingleSet(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.VectorKernels.shingleSet($w, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
}

/** `minhash_sig(array<string>) -> array<bigint>` against compile-time
  * permutation constants — one fused pass per row (see
  * VectorKernels.minhashSig). */
case class MinhashSig(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(sh: Any): Any =
    VectorKernels.minhashSig(sh.asInstanceOf[ArrayData], a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ar = ctx.addReferenceObj("mhA", a, "long[]")
    val br = ctx.addReferenceObj("mhB", b, "long[]")
    defineCodeGen(ctx, ev,
      sh => s"graft.functions.VectorKernels.minhashSig($sh, $ar, $br, ${p}L)")
  }

  override protected def withNewChildInternal(c: Expression): MinhashSig = copy(child = c)
}

/** `cosine_sim(array<float|double>, array<float|double>) -> double`.
  * Generated code is one static call — stays in whole-stage codegen. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType

  private lazy val lf = isFloat(left)
  private lazy val rf = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (lf && rf) VectorKernels.cosineF(x, y)
    else if (!lf && !rf) VectorKernels.cosineD(x, y)
    else VectorKernels.cosineM(x, y, lf, rf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val call =
        if (lf && rf) s"graft.functions.VectorKernels.cosineF($a, $b)"
        else if (!lf && !rf) s"graft.functions.VectorKernels.cosineD($a, $b)"
        else s"graft.functions.VectorKernels.cosineM($a, $b, $lf, $rf)"
      s"${ev.value} = $call;"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** `hyperplane_bucket(array<float|double>) -> bigint` against a
  * compile-time constant plane set: bit p = sign(dot(v, planes(p))).
  * One fused pass per row per table (vs nPlanes separate cosine
  * evaluations with redundant norm work — the ann_lsh hot path). */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = LongType

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.hyperBucket(v.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorKernels.hyperBucket($v, $ref, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
    copy(child = c)
}

/** `simhash64(array<string>) -> bigint`. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(words: Any): Any =
    VectorKernels.simhash64(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.VectorKernels.simhash64($w)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}
