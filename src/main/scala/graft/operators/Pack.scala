package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the concat-then-split placement
  * LLM pretraining uses: documents are concatenated in a
  * deterministic order within each group and the token stream is cut
  * every `budget` tokens; each document learns which training
  * sequence(s) it lands in.
  *
  * Scale shape: ONE window (running sum) partitioned by `groupCol` —
  * groups pack independently, so parallelism = number of groups. That
  * mirrors production packing, which is per-shard by construction
  * (a global pack order would serialize the pipeline); at 100 TB the
  * group key is the shard/file id and each partition packs locally.
  * All arithmetic is exact integer (running sums, `div`), so results
  * are bit-identical across engines and partitionings.
  */
object Pack {

  /** Adds placement columns to per-doc token counts:
    * `start_off`/`end_off` (token offsets in the group's concatenated
    * stream, end exclusive), `first_bin`/`last_bin` (budget-sized
    * training sequences touched), `bins_spanned`. */
  def pack(docs: DataFrame, groupCol: String, orderCol: String,
      nTokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTok = col(nTokCol).cast("long")
    docs
      .withColumn("end_off", sum(nTok).over(w))
      .withColumn("start_off", col("end_off") - nTok)
      .withColumn("first_bin", binOf(col("start_off"), budget))
      // an empty doc sits at a bin boundary with zero extent; clamp so
      // last_bin can't underrun first_bin
      .withColumn("last_bin",
        greatest(binOf(col("end_off") - 1, budget), binOf(col("start_off"), budget)))
      .withColumn("bins_spanned", col("last_bin") - col("first_bin") + 1)
  }

  /** Exact integer division (SQL `div`; operands are non-negative
    * here) — stays in long arithmetic, no double rounding at any
    * offset scale. */
  private def binOf(off: Column, budget: Long): Column =
    GraftSqlBridge.toColumn(
      IntegralDivide(GraftSqlBridge.toExpression(off), Literal(budget)))
}
