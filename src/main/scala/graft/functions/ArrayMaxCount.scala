package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Max multiplicity of any element in a string array, in ONE pass
  * (hash-map counts per row) — the repetition-signal hot path.
  *
  * Replaces `array_max(transform(array_distinct(xs), t =>
  * size(filter(xs, _ === t))))`, which is O(distinct × n) per row and
  * re-walks the whole array once per distinct element: a 100k-token
  * document makes that a 10⁹-operation row, while this stays O(n).
  * Value semantics are identical (including NULL for an empty array,
  * matching `array_max([])`), so oracles verified against the
  * composition keep matching.
  */
object ArrayMaxCount {

  def maxCount(xs: Column): Column =
    GraftSqlBridge.toColumn(ArrayMaxCountExpr(GraftSqlBridge.toExpression(xs)))

  /** Shared by interpreted eval and generated code. Keys are the
    * array's UTF8String elements (byte-wise hash/equals). NULL
    * elements are SKIPPED, exactly like the HOF composition this
    * replaces (`filter(xs, x === t)` never matches a null, so nulls
    * contribute count 0 there) — an all-null non-empty array yields
    * 0, matching `array_max` over an all-zero counts array. */
  def ofStrings(a: ArrayData): Int = {
    val n = a.numElements()
    val counts = new java.util.HashMap[AnyRef, Array[Int]](Math.max(8, n * 2))
    var best = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val k: AnyRef = a.getUTF8String(i)
        var c = counts.get(k)
        if (c == null) { c = new Array[Int](1); counts.put(k, c) }
        c(0) += 1
        if (c(0) > best) best = c(0)
      }
      i += 1
    }
    best
  }
}

case class ArrayMaxCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"array_max_count needs array<string>, got $t")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null else ArrayMaxCount.ofStrings(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if ($a.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.ArrayMaxCount.ofStrings($a);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
