package graft

import graft.functions.VectorDistanceExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface of the engine: registers the pgvector operators as SQL
  * functions, so `spark.sql("... ORDER BY vec_l2(embedding, q) LIMIT
  * 5")` is the literal Spark translation of the reference's
  * `ORDER BY embedding <-> ?::vector LIMIT 5`
  * (SSEOpenAIController.java:316).
  *
  * Install with:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
object GraftExtensions {
  /** Runtime registration into an existing session (the
    * `withExtensions` path only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq("vec_dot" -> 0, "vec_l2" -> 1, "vec_cos_dist" -> 2, "vec_cos_sim" -> 3)
      .foreach { case (name, mode) =>
        reg.createOrReplaceTempFunction(name,
          exprs => {
            require(exprs.length == 2, s"$name expects (vector, vector), got ${exprs.length} args")
            VectorDistanceExpr(exprs.head, exprs(1), mode)
          }, "scala_udf")
      }
    reg.createOrReplaceTempFunction("array_max_count",
      exprs => {
        require(exprs.length == 1, s"array_max_count expects (array<string>), got ${exprs.length} args")
        graft.functions.ArrayMaxCountExpr(exprs.head)
      }, "scala_udf")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorDistanceExpr].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def binary(mode: Int)(args: Seq[Expression]): Expression = {
    require(args.length == 2, "expected (vector, vector)")
    VectorDistanceExpr(args.head, args(1), mode)
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - inner product (pgvector <#> is -vec_dot)"),
      binary(0) _))
    e.injectFunction((FunctionIdentifier("vec_l2"),
      info("vec_l2", "vec_l2(a, b) - Euclidean distance (pgvector <->)"),
      binary(1) _))
    e.injectFunction((FunctionIdentifier("vec_cos_dist"),
      info("vec_cos_dist", "vec_cos_dist(a, b) - cosine distance (pgvector <=>)"),
      binary(2) _))
    e.injectFunction((FunctionIdentifier("vec_cos_sim"),
      info("vec_cos_sim", "vec_cos_sim(a, b) - cosine similarity"),
      binary(3) _))
    e.injectFunction((FunctionIdentifier("array_max_count"),
      info("array_max_count",
        "array_max_count(xs) - max multiplicity of any element, one pass"),
      args => {
        require(args.length == 1, "expected (array<string>)")
        graft.functions.ArrayMaxCountExpr(args.head)
      }))
  }
}
