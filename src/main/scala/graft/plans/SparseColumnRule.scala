package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GetStructField, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{SparseStructDistExpr, SparseVec, VectorDistanceExpr}

/** Analyzer rule for the ONE-COLUMN sparsevec type (r17 — closes the
  * operator surface of the "sparsevec is a column pair" deviation,
  * SURVEY §2): whenever a vec_* kernel was built over operands that
  * RESOLVE to the sparse struct shape
  * (`struct<indices: array<bigint>, values: array<double>, dims: int>`,
  * [[graft.functions.SparseLiteralExpr]]'s output type), swap in the
  * sparse kernel the types actually call for.
  *
  *  - `VectorDistanceExpr(a, b, mode)` with a sparse-struct operand →
  *    [[graft.functions.SparseStructDistExpr]] (two-pointer merge,
  *    pgvector's dims-mismatch error). This is what pgvector's
  *    verbatim `sparse_col <-> '{1:2}/5'::sparsevec` becomes: the
  *    [[PgVectorSql]] rewrite emits `vec_l2(sparse_col, …)` without
  *    type knowledge, and the SQL builders construct the dense
  *    kernel whenever the operand types are still unresolved at
  *    build time — this rule is the type-directed dispatch.
  *  - `size(sparse_struct)` → the struct's `dims` field, so
  *    `vec_dims` / pgvector's `vector_dims` read the DECLARED
  *    dimensionality, not a struct field count of 3.
  *
  * Runs in the analyzer's resolution fixpoint (injected by
  * [[graft.GraftExtensions]]), so the rewrite lands before type
  * checks: `Size` over a struct would otherwise fail analysis.
  * Fires only on resolved children; the fallthrough (operands that
  * never resolve) is the stock analyzer error, unchanged. */
class SparseColumnRule extends Rule[LogicalPlan] {

  private def sparseTyped(e: Expression): Boolean =
    e.resolved && SparseVec.isSparseStructType(e.dataType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorDistanceExpr(l, r, mode) if sparseTyped(l) || sparseTyped(r) =>
        SparseStructDistExpr(l, r, mode)
      case Size(child, _) if sparseTyped(child) =>
        GetStructField(child, 2, Some("dims"))
    }
}
