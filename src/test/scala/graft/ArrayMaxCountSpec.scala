package graft

import graft.functions.{ArrayMaxCount, TextFunctions}
import org.apache.spark.sql.functions._

/** The single-pass top-count expression must be value-identical to the
  * O(distinct × n) HOF composition it replaced (text_repetition's
  * oracle was verified against that composition). */
class ArrayMaxCountSpec extends SparkSpec {

  private def hofMaxCount(xs: org.apache.spark.sql.Column) =
    array_max(transform(array_distinct(xs), t => size(filter(xs, x => x === t))))

  test("matches the HOF composition on real corpus tokens and bigrams") {
    val toks = TextFunctions.tokens(col("text"))
    val df = Tables.documents(spark, Sf)
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("bi", TextFunctions.shingles(col("toks"), 2))
      .select(
        ArrayMaxCount.maxCount(col("toks")).as("fast_t"),
        hofMaxCount(col("toks")).as("slow_t"),
        ArrayMaxCount.maxCount(col("bi")).as("fast_b"),
        hofMaxCount(col("bi")).as("slow_b"))
    val bad = df.filter(
      !(col("fast_t") <=> col("slow_t")) || !(col("fast_b") <=> col("slow_b")))
    assert(bad.count() == 0, bad.limit(3).collect().mkString(", "))
  }

  test("edge cases: empty array is NULL, repeats and singletons count right") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("a", "b", "a", "c", "a")), // a×3
      (2L, Seq("x")),                     // singleton
      (3L, Seq.empty[String]),            // empty → NULL (array_max semantics)
      (4L, Seq("t", "t", "u", "u")),      // tie → still 2
      (5L, Seq(null, null, "a")),         // nulls skipped (HOF parity) → 1
      (6L, Seq[String](null, null))       // all-null non-empty → 0, not NULL
    ).toDF("id", "xs")
    val got = rows.select(col("id"), ArrayMaxCount.maxCount(col("xs")).as("mc"))
      .orderBy(col("id")).collect()
    assert(got(0).getInt(1) == 3)
    assert(got(1).getInt(1) == 1)
    assert(got(2).isNullAt(1))
    assert(got(3).getInt(1) == 2)
    assert(got(4).getInt(1) == 1)
    assert(got(5).getInt(1) == 0)
    // and the HOF composition agrees on the null-bearing rows
    val hof = rows.select(col("id"), hofMaxCount(col("xs")).as("mc"))
      .orderBy(col("id")).collect()
    assert(hof(4).getInt(1) == 1 && hof(5).getInt(1) == 0)
  }

  test("interpreted path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val lit = Literal(
      new GenericArrayData(Array[Any](
        UTF8String.fromString("a"), UTF8String.fromString("a"),
        UTF8String.fromString("b"))),
      ArrayType(StringType))
    assert(graft.functions.ArrayMaxCountExpr(lit).eval(null) == 2)
  }
}
