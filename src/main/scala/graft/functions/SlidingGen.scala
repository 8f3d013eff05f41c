package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructField, StructType}

/** Native Catalyst GENERATOR (the table-function surface, alongside the
  * scalar expressions and typed Aggregators): `sliding_gen(arr, n)`
  * emits one output row per length-n sliding window of `arr`, as
  * `(pos INT, win ARRAY<elem>)` with pos 0-based.
  *
  * Versus the HOF idiom `explode(transform(sequence(1, size(w)-1),
  * i -> ...))` it replaces in the n-gram pipelines (q38/q92/q146):
  * no index array and no transformed copy of the input are ever
  * materialized per row — windows stream straight out of GenerateExec
  * — and the window logic is one auditable operator instead of a
  * per-query lambda. Generators execute eval-based inside GenerateExec
  * (like every non-builtin generator), which is also where the HOF
  * form's explode ran, so the codegen boundary is unchanged.
  *
  * `n` must be a foldable positive integer — enforced at analysis, so
  * an invalid call fails the query plan, not the tasks.
  */
case class SlidingGen(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  private lazy val width: Int = n.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType =>
      if (!n.foldable || n.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure("sliding_gen window size must be an INT literal")
      else if (n.eval(null) == null || n.eval(null).asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure("sliding_gen window size must be >= 1")
      else TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"sliding_gen expects an array, got ${other.sql}")
  }

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("win", ArrayType(elemType,
      child.dataType.asInstanceOf[ArrayType].containsNull), nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < width) Iterator.empty
    else {
      val elems = arr.toObjectArray(elemType)
      (0 to elems.length - width).iterator.map { i =>
        InternalRow(i, new GenericArrayData(
          java.util.Arrays.copyOfRange(elems.asInstanceOf[Array[AnyRef]], i, i + width)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SlidingGen =
    copy(child = newChildren(0), n = newChildren(1))
}
