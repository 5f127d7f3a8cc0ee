package graft

import graft.functions.SparseVec
import graft.plans.PgVectorSql
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property coverage for the r16 pgvector text surfaces.
  *
  * 1. sparsevec literal roundtrip: any well-formed element list
  *    renders to text that parses back to the same (indices, values,
  *    dims) with zeros dropped — [[SparseVec.parseLiteral]] is a left
  *    inverse of rendering for every pgvector-legal input.
  * 2. parser-rewrite invariants: SQL with NO pgvector token passes
  *    through [[PgVectorSql.translate]] byte-identically, and
  *    operator rewrites never lose the non-operand text around them.
  */
object SparseLiteralPropertySpec extends Properties("sparse-literal") {

  // well-formed sparse element lists: strictly ascending 1-based
  // indices within dims, double values (some zero)
  private val elemsGen: Gen[(Seq[(Long, Double)], Int)] = for {
    dims <- Gen.chooseNum(1, 10000)
    n <- Gen.chooseNum(0, math.min(20, dims))
    idx <- Gen.pick(n, 1L to dims.toLong)
    vals <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.chooseNum(-1000, 1000).map(_ / 16.0),
      1 -> Gen.const(0.0)))
  } yield (idx.sorted.zip(vals).toSeq, dims)

  property("literal text roundtrips with zeros dropped") =
    forAll(elemsGen) { case (elems, dims) =>
      val text = elems.map { case (i, v) => s"$i:$v" }
        .mkString("{", ",", s"}/$dims")
      val (qi, qv, d) = SparseVec.parseLiteral(text)
      val expected = elems.filter(_._2 != 0.0)
      d == dims &&
        qi.toSeq == expected.map(_._1) &&
        qv.toSeq == expected.map(_._2)
    }

  property("typmod match accepts, mismatch raises pgvector's error") =
    forAll(elemsGen) { case (elems, dims) =>
      val text = elems.map { case (i, v) => s"$i:$v" }
        .mkString("{", ",", s"}/$dims")
      val ok = SparseVec.parseLiteral(text, dims)._3 == dims
      val bad =
        try { SparseVec.parseLiteral(text, dims + 1); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains(s"expected ${dims + 1} dimensions, not $dims") }
      ok && bad
    }

  // SQL free of every pgvector marker: translate must be identity
  private val plainSqlGen: Gen[String] = Gen.chooseNum(1, 30).flatMap { n =>
    Gen.listOfN(n, Gen.frequency(
      10 -> Gen.identifier.map(_.take(8)),
      3 -> Gen.oneOf("SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY",
        "JOIN", "ON", "AND", "<", ">", "<=", ">=", "=", ",", "(", ")",
        "'a<->b'", "0.5", "42"),
      1 -> Gen.const("x -> x + 1"))).map(_.mkString(" "))
  }

  property("pgvector-free SQL passes through byte-identically") =
    forAll(plainSqlGen) { sql =>
      // the '<->' inside a string literal is data, not an operator —
      // identity must hold even when the quoted arrow trips the cheap
      // contains() guard into running the lexer
      PgVectorSql.translate(sql) == sql
    }

  // operator rewrites preserve surrounding text: prefix/suffix
  // around `a <-> '[1,2]'::vector(2)` survive the rewrite verbatim
  private val affixGen: Gen[String] =
    Gen.listOfN(4, Gen.identifier.map(_.take(6))).map(_.mkString(" "))

  property("operator rewrite preserves the surrounding statement text") =
    forAll(affixGen, affixGen) { (pre, post) =>
      val sql = s"SELECT $pre, a <-> '[1,2]'::vector(2) AS d, $post FROM t"
      val out = PgVectorSql.translate(sql)
      out == s"SELECT $pre, vec_l2(a, vec_literal('[1,2]', 2)) AS d, $post FROM t"
    }

  property("halfvec operator rewrite preserves surrounding text") =
    forAll(affixGen) { pre =>
      val sql = s"SELECT $pre, hv <#> '[1,2]'::halfvec AS d FROM t"
      PgVectorSql.translate(sql) ==
        s"SELECT $pre, (-vec_half_dot(hv, vec_literal('[1,2]'))) AS d FROM t"
    }
}
