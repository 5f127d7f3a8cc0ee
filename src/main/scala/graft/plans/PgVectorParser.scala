package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** pgvector operator syntax for Spark SQL (VERDICT r8 #3): the
  * reference's literal query text —
  * `ORDER BY embedding <-> '[0.1,...]'::vector LIMIT 5`
  * (SSEOpenAIController.java:316) — runs UNMODIFIED. A delegating
  * [[ParserInterface]] rewrites the SQL string before the stock
  * parser sees it:
  *
  *  - `a <-> b`  → `vec_l2(a, b)`          (l2_distance)
  *  - `a <=> b`  → `vec_cos_dist(a, b)`    (cosine_distance — only in
  *                                          statements that carry
  *                                          another pgvector marker;
  *                                          see [[cosineDialect]])
  *  - `a <#> b`  → `(-vec_dot(a, b))`      (NEGATIVE inner product —
  *                                          pgvector's operator value)
  *  - `a <+> b`  → `vec_l1(a, b)`          (l1_distance)
  *  - `a <~> b`  → `vec_hamming(a, b)`     (bit(n) hamming)
  *  - `a <%> b`  → `vec_jaccard(a, b)`     (bit(n) jaccard)
  *  - `x::vector` → `vec_literal(x)`       (the pgvector text-format
  *                                          literal cast; `?::vector`
  *                                          keeps the parameter marker)
  *
  * The rewrite is token-exact: a real lexer (strings with ''
  * escapes, quoted identifiers, comments, balanced brackets) finds
  * each operator's adjacent PRIMARY operands — qualified column
  * refs, literals, parameter markers, function calls, parenthesized
  * groups, with postfix `::type` casts — and splices the function
  * call around the original operand text. Operand shapes beyond a
  * primary (e.g. `a + b <-> q`) are left untouched rather than
  * guessed: pgvector queries in the wild put parens there anyway.
  * SQL without any pgvector token passes through with zero overhead
  * (one contains() scan).
  *
  * Composes with [[IvfProbeRule]]: `vec_literal` is foldable, so
  * constant folding turns the rewritten sort key into
  * `VectorDistanceExpr(col, Literal(array))` — exactly the shape the
  * probe rule's literal rewrite matches, and the optimizer picks the
  * IVF index for the reference's verbatim SQL (spec-asserted).
  */
object PgVectorSql {

  private sealed trait Tok { def s: Int; def e: Int }
  private final case class Ws(s: Int, e: Int) extends Tok
  private final case class Str(s: Int, e: Int) extends Tok
  private final case class QId(s: Int, e: Int) extends Tok
  private final case class Ident(s: Int, e: Int) extends Tok
  private final case class Num(s: Int, e: Int) extends Tok
  private final case class Op(s: Int, e: Int, text: String) extends Tok
  private final case class P(s: Int, e: Int, c: Char) extends Tok

  private val VecOps = Map(
    "<->" -> (("vec_l2", false)),
    "<=>" -> (("vec_cos_dist", false)),
    "<#>" -> (("vec_dot", true)), // pgvector <#> = NEGATIVE inner product
    "<+>" -> (("vec_l1", false)),
    "<~>" -> (("vec_hamming", false)),
    "<%>" -> (("vec_jaccard", false)))

  private val MultiOps = Seq("<->", "<=>", "<#>", "<+>", "<~>", "<%>", "::")

  /** Cast target types the rewriter claims (pgvector's column types;
    * `bit(n)` stays with the stock parser — Spark has no bit type and
    * the engine's bit storage is `vec_binary_quantize` words). */
  private val VecTypes = Set("vector", "halfvec", "sparsevec")

  /** pgvector halfvec distance operators → the packed-column half
    * kernels ([[graft.functions.HalfDistExpr]] modes). `<~>`/`<%>`
    * have no halfvec reading in pgvector either. */
  private val HalfOps = Map(
    "<->" -> (("vec_half_l2", false)),
    "<#>" -> (("vec_half_dot", true)),
    "<=>" -> (("vec_half_cos_dist", false)),
    "<+>" -> (("vec_half_l1", false)))

  /** Cheap guard: only SQL that can contain pgvector syntax pays the
    * lexer. */
  def mayContain(sql: String): Boolean = {
    val lower = sql.toLowerCase(java.util.Locale.ROOT)
    VecOps.keysIterator.exists(sql.contains) || lower.contains("::vector") ||
      lower.contains("::halfvec") || lower.contains("::sparsevec")
  }

  /** `<=>` is ALSO Spark SQL's native null-safe-equality operator, so
    * claiming it unconditionally would hijack valid upstream SQL
    * (`JOIN … ON a.k <=> b.k`). The cosine reading applies only when
    * the statement carries another UNAMBIGUOUS pgvector marker — a
    * `::vector` cast or one of the five operators Spark doesn't own
    * (`<->`/`<#>`/`<+>`/`<~>`/`<%>`); otherwise `<=>` passes through
    * to the stock parser as EqualNullSafe. Decided ONCE on the
    * original statement (rewrites consume the markers, so per-step
    * re-detection would flip mid-fixpoint). */
  private def cosineDialect(sql: String): Boolean = {
    val lower = sql.toLowerCase(java.util.Locale.ROOT)
    VecOps.keysIterator.exists(op => op != "<=>" && sql.contains(op)) ||
      lower.contains("::vector") || lower.contains("::halfvec") ||
      lower.contains("::sparsevec")
  }

  private def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = sql.length
    var i = 0
    def isIdStart(c: Char) = c.isLetter || c == '_'
    def isIdPart(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = sql.charAt(i)
      val s = i
      if (c.isWhitespace) {
        while (i < n && sql.charAt(i).isWhitespace) i += 1
        out += Ws(s, i)
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
        out += Ws(s, i)
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
        out += Ws(s, i)
      } else if (c == '\'') {
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
            else { i += 1; done = true }
          } else i += 1
        }
        out += Str(s, i)
      } else if (c == '`' || c == '"') {
        i += 1
        while (i < n && sql.charAt(i) != c) i += 1
        i = math.min(n, i + 1)
        out += QId(s, i)
      } else if (isIdStart(c)) {
        while (i < n && isIdPart(sql.charAt(i))) i += 1
        out += Ident(s, i)
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        // permissive numeric literal: digits, dots, exponents, suffixes
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '.' ||
          ((sql.charAt(i) == '+' || sql.charAt(i) == '-') && i > s &&
            (sql.charAt(i - 1) == 'e' || sql.charAt(i - 1) == 'E')))) i += 1
        out += Num(s, i)
      } else {
        MultiOps.find(op => sql.startsWith(op, i)) match {
          case Some(op) => i += op.length; out += Op(s, i, op)
          case None => i += 1; out += P(s, i, c)
        }
      }
    }
    out.result()
  }

  private def prevNonWs(ts: Vector[Tok], k: Int): Int = {
    var j = k - 1
    while (j >= 0 && ts(j).isInstanceOf[Ws]) j -= 1
    j
  }

  private def nextNonWs(ts: Vector[Tok], k: Int): Int = {
    var j = k + 1
    while (j < ts.length && ts(j).isInstanceOf[Ws]) j += 1
    j
  }

  private def closerOf(c: Char): Char = if (c == '(') ')' else ']'
  private def openerOf(c: Char): Char = if (c == ')') '(' else '['

  /** SQL keywords that can directly precede a parenthesized
    * expression — an identifier from this set before `(…)` is NOT a
    * function name, so the parenthesized group alone is the operand. */
  private val Keywords = Set(
    "select", "where", "from", "and", "or", "not", "on", "when", "then",
    "else", "in", "by", "having", "all", "any", "some", "exists",
    "between", "like", "ilike", "rlike", "as", "distinct", "union",
    "intersect", "except", "over", "partition", "order", "group",
    "limit", "offset", "case", "end", "join", "using", "values", "set",
    "if", "escape", "is", "div", "return", "returns", "lateral")

  private def isKeyword(sql: String, t: Tok): Boolean = t match {
    case Ident(s, e) => Keywords.contains(
      sql.substring(s, e).toLowerCase(java.util.Locale.ROOT))
    case _ => false
  }

  /** Token range [from, to] of the primary ENDING at token index k
    * (inclusive), or None. */
  private def leftPrimary(sql: String, ts: Vector[Tok], k: Int): Option[Int] = {
    def dottedChainStart(j0: Int): Int = {
      var j = j0
      var more = true
      while (more) {
        val d = prevNonWs(ts, j)
        if (d >= 0 && (ts(d) match { case P(_, _, '.') => true; case _ => false })) {
          val id = prevNonWs(ts, d)
          ts.lift(id) match {
            case Some(_: Ident) | Some(_: QId) => j = id
            case _ => more = false
          }
        } else more = false
      }
      j
    }
    ts.lift(k) match {
      case Some(P(_, _, close)) if close == ')' || close == ']' =>
        // balanced group back to the opener
        var depth = 0
        var j = k
        var open = -1
        while (j >= 0 && open < 0) {
          ts(j) match {
            case P(_, _, c2) if c2 == close => depth += 1
            case P(_, _, c2) if c2 == openerOf(close) =>
              depth -= 1
              if (depth == 0) open = j
            case _ =>
          }
          if (open < 0) j -= 1
        }
        if (open < 0) None
        else {
          val before = prevNonWs(ts, open)
          ts.lift(before) match {
            case Some(id: Ident) if !isKeyword(sql, id) =>
              Some(dottedChainStart(before))
            case Some(_: QId) => Some(dottedChainStart(before))
            case _ => Some(open)
          }
        }
      case Some(_: Ident) | Some(_: QId) | Some(_: Str) | Some(_: Num) =>
        Some(dottedChainStart(k))
      case Some(P(_, _, '?')) => Some(k)
      case _ => None
    }
  }

  /** Token index of the last token of the primary STARTING at or
    * after token index k (k = first non-ws candidate), or None. */
  private def rightPrimary(ts: Vector[Tok], k0: Int): Option[Int] = {
    def balancedEnd(j0: Int, open: Char): Option[Int] = {
      val close = closerOf(open)
      var depth = 0
      var j = j0
      while (j < ts.length) {
        ts(j) match {
          case P(_, _, c2) if c2 == open => depth += 1
          case P(_, _, c2) if c2 == close =>
            depth -= 1
            if (depth == 0) return Some(j)
          case _ =>
        }
        j += 1
      }
      None
    }
    def postfixCasts(j0: Int): Int = {
      var j = j0
      var more = true
      while (more) {
        val d = nextNonWs(ts, j)
        ts.lift(d) match {
          case Some(Op(_, _, "::")) =>
            val id = nextNonWs(ts, d)
            ts.lift(id) match {
              case Some(_: Ident) =>
                j = id
                // a typmod group — `::vector(1536)` — belongs to the
                // cast, not to whatever follows the primary
                val pOpen = nextNonWs(ts, j)
                ts.lift(pOpen) match {
                  case Some(P(_, _, '(')) =>
                    val nIdx = nextNonWs(ts, pOpen)
                    val close = nextNonWs(ts, nIdx)
                    (ts.lift(nIdx), ts.lift(close)) match {
                      case (Some(_: Num), Some(P(_, _, ')'))) => j = close
                      case _ =>
                    }
                  case _ =>
                }
              case _ => more = false
            }
          case _ => more = false
        }
      }
      j
    }
    def afterIdentChain(j0: Int): Int = {
      // qualified name, then an optional call-argument group
      var j = j0
      var more = true
      while (more) {
        val d = nextNonWs(ts, j)
        if (ts.lift(d).exists { case P(_, _, '.') => true; case _ => false }) {
          val id = nextNonWs(ts, d)
          ts.lift(id) match {
            case Some(_: Ident) | Some(_: QId) => j = id
            case _ => more = false
          }
        } else more = false
      }
      val d = nextNonWs(ts, j)
      ts.lift(d) match {
        case Some(P(_, _, '(')) => balancedEnd(d, '(').getOrElse(j)
        case _ => j
      }
    }
    var k = k0
    // a single leading sign binds tighter than the vector operators
    ts.lift(k) match {
      case Some(P(_, _, '-')) | Some(P(_, _, '+')) => k = nextNonWs(ts, k)
      case _ =>
    }
    val core = ts.lift(k) match {
      case Some(_: Ident) | Some(_: QId) => Some(afterIdentChain(k))
      case Some(_: Str) | Some(_: Num) => Some(k)
      case Some(P(_, _, '?')) => Some(k)
      case Some(P(_, _, '(')) => balancedEnd(k, '(')
      case Some(P(_, _, '[')) => balancedEnd(k, '[')
      case _ => None
    }
    core.map(postfixCasts)
  }

  /** If the token at `last` ENDS a `:: halfvec [( n )]` cast suffix,
    * return (last token index of the cast's operand, typmod) — the
    * operator branch uses this to route a halfvec-cast operand to the
    * half kernels with the operand kept as a FLOAT query. */
  private def halfCastEnd(sql: String, ts: Vector[Tok], last: Int): Option[(Int, Option[Int])] = {
    def identIsHalf(j: Int): Boolean = ts.lift(j).exists {
      case id: Ident => sql.substring(id.s, id.e).equalsIgnoreCase("halfvec")
      case _ => false
    }
    ts.lift(last) match {
      case Some(P(_, _, ')')) =>
        val nIdx = prevNonWs(ts, last)
        val pOpen = prevNonWs(ts, nIdx)
        val idIdx = prevNonWs(ts, pOpen)
        val castOp = prevNonWs(ts, idIdx)
        (ts.lift(nIdx), ts.lift(pOpen), identIsHalf(idIdx), ts.lift(castOp)) match {
          case (Some(num: Num), Some(P(_, _, '(')), true, Some(Op(_, _, "::"))) =>
            sql.substring(num.s, num.e).toIntOption.map { n =>
              (prevNonWs(ts, castOp), Some(n))
            }
          case _ => None
        }
      case Some(_: Ident) if identIsHalf(last) =>
        val castOp = prevNonWs(ts, last)
        ts.lift(castOp) match {
          case Some(Op(_, _, "::")) => Some((prevNonWs(ts, castOp), None))
          case _ => None
        }
      case _ => None
    }
  }

  /** One rewrite step: leftmost `::vector` cast or vector operator
    * whose operands extract cleanly. Returns the rewritten SQL, or
    * None when nothing (more) rewrites. */
  private def step(sql: String, claimCosEq: Boolean): Option[String] = {
    val ts = lex(sql)
    // candidate positions in source order: casts and operators together
    val candidates = ts.indices.filter(i => ts(i) match {
      case Op(_, _, "::") =>
        ts.lift(nextNonWs(ts, i)).exists {
          case id: Ident => VecTypes.contains(
            sql.substring(id.s, id.e).toLowerCase(java.util.Locale.ROOT))
          case _ => false
        }
      case Op(_, _, "<=>") => claimCosEq
      case Op(_, _, op) => VecOps.contains(op)
      case _ => false
    })
    candidates.iterator.flatMap { i =>
      ts(i) match {
        case Op(_, _, "::") =>
          val idIdx = nextNonWs(ts, i)
          // optional typmod — `::vector(1536)`, the form pgvector's
          // docs and most ORMs emit (the reference's own column is
          // `vector(1536)`, Function.java DDL). Consume `(n)` and
          // thread the declared dims through so vec_literal applies
          // pgvector's dimension check. Anything that is not exactly
          // `( <integer> )` is left alone (not valid SQL after a cast
          // anyway — the stock parser reports it).
          val typmod: Option[(Int, Int)] = { // (declared dims, ')' token idx)
            val pOpen = nextNonWs(ts, idIdx)
            ts.lift(pOpen) match {
              case Some(P(_, _, '(')) =>
                val nIdx = nextNonWs(ts, pOpen)
                val close = nextNonWs(ts, nIdx)
                (ts.lift(nIdx), ts.lift(close)) match {
                  case (Some(num: Num), Some(P(_, _, ')'))) =>
                    sql.substring(num.s, num.e).toIntOption.map(n => (n, close))
                  case _ => None
                }
              case _ => None
            }
          }
          val castType = sql.substring(ts(idIdx).s, ts(idIdx).e)
            .toLowerCase(java.util.Locale.ROOT)
          val end = typmod.fold(ts(idIdx).e) { case (_, close) => ts(close).e }
          // a halfvec cast that is an operand of a distance operator is
          // claimed by the OPERATOR branch (the query side of a half
          // kernel must stay float — packing it would mistype the
          // call); only a standalone `x::halfvec` packs to binary here
          val nextIsVecOp = ts.indices
            .find(j => ts(j).s >= end && !ts(j).isInstanceOf[Ws])
            .exists(j => ts(j) match {
              case Op(_, _, o) => HalfOps.contains(o); case _ => false })
          if (castType == "halfvec" && nextIsVecOp) None
          else {
            val li = prevNonWs(ts, i)
            (ts.lift(li).flatMap {
              // the parameter marker must survive for parameterized sql
              case P(_, _, '?') => Some(li)
              case _ => leftPrimary(sql, ts, li)
            }).map { from =>
              val operand = sql.substring(ts(from).s, ts(li).e)
              val inner = typmod match {
                case Some((n, _)) => s"$operand, $n"
                case None => operand
              }
              val call = castType match {
                case "sparsevec" => s"vec_sparse_literal($inner)"
                case "halfvec" => s"vec_half(vec_literal($inner))"
                case _ => s"vec_literal($inner)"
              }
              sql.substring(0, ts(from).s) + call + sql.substring(end)
            }
          }
        case Op(_, _, op) =>
          val (fn, negate) = VecOps(op)
          val li = prevNonWs(ts, i)
          val riStart = nextNonWs(ts, i)
          // pgvector's halfvec form — one operand carries a
          // `::halfvec[(n)]` cast (`halfcol <-> '[...]'::halfvec(3)`)
          // — routes to the half kernels with the cast operand kept
          // as a FLOAT query (packing it, the standalone-cast
          // rewrite, would mistype the kernel call). The kernels are
          // symmetric, so the query may sit on either side.
          val lCast = if (HalfOps.contains(op)) halfCastEnd(sql, ts, li) else None
          def lOperandEnd = lCast.fold(li)(_._1)
          def primEnd(k: Int): Option[Int] = ts.lift(k) match {
            case Some(P(_, _, '?')) => Some(k) // parameter marker survives
            case _ => leftPrimary(sql, ts, k)
          }
          for {
            lFrom <- primEnd(lOperandEnd)
            rTo <- rightPrimary(ts, riStart)
          } yield {
            val rCast = if (HalfOps.contains(op)) halfCastEnd(sql, ts, rTo) else None
            val call = (lCast, rCast) match {
              case (None, None) =>
                val l = sql.substring(ts(lFrom).s, ts(li).e)
                val r = sql.substring(ts(riStart).s, ts(rTo).e)
                if (negate) s"(-$fn($l, $r))" else s"$fn($l, $r)"
              case _ =>
                val (hfn, hneg) = HalfOps(op)
                // right cast wins when both sides carry one: the left
                // keeps its cast text and the NEXT step's standalone
                // rewrite packs it to a halfvec column
                val (colText, qText, qTypmod) = rCast match {
                  case Some((rEnd, tm)) =>
                    (sql.substring(ts(lFrom).s, ts(li).e),
                      sql.substring(ts(riStart).s, ts(rEnd).e), tm)
                  case None =>
                    (sql.substring(ts(riStart).s, ts(rTo).e),
                      sql.substring(ts(lFrom).s, ts(lOperandEnd).e), lCast.get._2)
                }
                val qCall = qTypmod.fold(s"vec_literal($qText)")(n =>
                  s"vec_literal($qText, $n)")
                if (hneg) s"(-$hfn($colText, $qCall))" else s"$hfn($colText, $qCall)"
            }
            sql.substring(0, ts(lFrom).s) + call + sql.substring(ts(rTo).e)
          }
        case _ => None
      }
    }.nextOption()
  }

  /** Full translation: rewrite until fixpoint (each step removes one
    * cast or operator; nested operands surface on later steps). */
  def translate(sql: String): String = {
    if (!mayContain(sql)) return sql
    val claimCosEq = cosineDialect(sql)
    var cur = sql
    var continue = true
    var guard = 0
    while (continue && guard < 10000) {
      step(cur, claimCosEq) match {
        case Some(next) => cur = next; guard += 1
        case None => continue = false
      }
    }
    cur
  }
}

/** The injected delegating parser: plan/query/expression text is
  * translated, identifier/schema entry points pass through. */
final class PgVectorParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    VectorIndexDdl.toCommand(sqlText).getOrElse(
      delegate.parsePlan(PgVectorSql.translate(sqlText)))
  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    VectorIndexDdl.toCommand(sqlText).getOrElse(
      delegate.parsePlanWithParameters(PgVectorSql.translate(sqlText), ctx))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(PgVectorSql.translate(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(PgVectorSql.translate(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
