package graft.plans

import graft.sources.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import scala.collection.concurrent.TrieMap

/** Plan-time aggregate pushdown for transaction-log tables: a user
  * writes the classic warehouse probe —
  * `SELECT count(*), min(k), max(k) FROM t` — over a
  * [[GraftTable]] snapshot read, and the optimizer answers it from
  * the commit log's per-file (rows, min, max) records, replacing the
  * whole Aggregate with a one-row [[LocalRelation]]. ZERO data files
  * are scanned: on a 100 TB table the query costs driver
  * milliseconds, the same leverage [[GraftTable.statsAgg]] offers as
  * an explicit API — here picked the way an RDBMS picks an
  * index-only scan, with no API call in the query (the optimizer-rule
  * discipline of [[IvfProbeRule]], SURVEY §6a tier (c) logical half).
  *
  * Soundness rules (each failure falls back to the real scan — the
  * rewrite is never required for correctness):
  *  - only a bare snapshot scan qualifies: pass-through Projects are
  *    peeled, any Filter/Join/other node aborts (a residual predicate
  *    would make log-level totals wrong);
  *  - every file in the scan's resolved file list must carry a log
  *    record (version-agnostic: files are immutable and
  *    [[GraftTable.knownMetas]] spans the whole log, so a TIME-TRAVEL
  *    read rewrites correctly to ITS version's totals);
  *  - `count(*)`/`count(1)` only — `count(col)` skips NULLs, which
  *    file-level row counts cannot see;
  *  - `min/max(col)` needs stats for `col` in every live data file
  *    (an untracked column or an all-NULL file makes metadata min/max
  *    unsound) and a string/numeric type whose stringified stats
  *    order faithfully (the [[GraftTable.statsAgg]] contract);
  *  - no DISTINCT, no FILTER clause, no grouping keys.
  */
object GraftStatsCatalog {

  private val tables = TrieMap.empty[String, GraftTable]

  private def canonical(path: String): String =
    new org.apache.hadoop.fs.Path(path).toUri.getPath

  /** Register a table for metadata-aggregate rewriting. Like
    * [[IvfCatalog]], registration is per-path driver metadata; the
    * log itself is re-read at rewrite time, so commits after
    * registration are answered correctly. */
  def register(table: GraftTable): Unit =
    tables(canonical(table.path)) = table

  /** A snapshot read plans over an explicit file list, so the scan's
    * root paths are the files themselves — match their parent (the
    * table root). */
  def lookup(rootPaths: Seq[org.apache.hadoop.fs.Path]): Option[GraftTable] =
    rootPaths.headOption.flatMap { p =>
      tables.get(p.toUri.getPath).orElse(
        Option(p.getParent).flatMap(pp => tables.get(pp.toUri.getPath)))
    }

  def invalidate(path: String): Unit = { tables.remove(canonical(path)); () }

  def clear(): Unit = tables.clear()
}

object GraftStatsRule {

  /** Idempotent per-session installation alongside [[IvfProbeRule]]. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[GraftStatsRule])) {
      spark.experimental.extraOptimizations = cur :+ new GraftStatsRule(spark)
    }
  }
}

final class GraftStatsRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg: Aggregate if agg.groupingExpressions.isEmpty &&
        agg.aggregateExpressions.nonEmpty =>
      rewrite(agg).getOrElse(agg)
  }

  private def rewrite(agg: Aggregate): Option[LocalRelation] =
    for {
      lr <- bareScan(agg.child)
      fsRel <- lr.relation match {
        case f: HadoopFsRelation => Some(f)
        case _ => None
      }
      table <- GraftStatsCatalog.lookup(fsRel.location.rootPaths)
      metas <- scannedMetas(table, fsRel)
      values <- valuesFor(agg.aggregateExpressions, lr, metas)
    } yield LocalRelation(agg.output, Seq(InternalRow.fromSeq(values)))

  /** Peel pass-through (attribute-only) Projects down to the scan;
    * any other node — above all a Filter — aborts the rewrite. */
  private def bareScan(p: LogicalPlan): Option[LogicalRelation] = p match {
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      bareScan(child)
    case lr: LogicalRelation => Some(lr)
    case _ => None
  }

  /** The log records of EXACTLY the files this scan resolved — the
    * snapshot (any version) the reader holds. None if any scanned
    * file has no record (not this table's file → cannot answer). */
  private def scannedMetas(table: GraftTable,
      fsRel: HadoopFsRelation): Option[Seq[graft.sources.FileMeta]] = {
    val known = table.knownMetas
    val files = fsRel.location.inputFiles
    if (files.isEmpty) None
    else {
      val metas = files.flatMap(f => known.get(f.split('/').last))
      if (metas.length == files.length) Some(metas.toSeq) else None
    }
  }

  /** One internal value per aggregate expression, or None if any
    * expression is outside the answerable set. */
  private def valuesFor(aggExprs: Seq[NamedExpression], lr: LogicalRelation,
      metas: Seq[graft.sources.FileMeta]): Option[Seq[Any]] = {
    val dataFiles = metas.filter(_.rows > 0)
    val vals = aggExprs.map(e => valueFor(strip(e), lr, metas, dataFiles))
    if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
  }

  private def strip(e: NamedExpression): Expression = e match {
    case a: Alias => a.child
    case other => other
  }

  private def valueFor(e: Expression, lr: LogicalRelation,
      metas: Seq[graft.sources.FileMeta],
      dataFiles: Seq[graft.sources.FileMeta]): Option[Any] = e match {
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null =>
          Some(metas.map(_.rows).sum)
        case Min(a: AttributeReference) => statValue(a, lr, dataFiles, isMin = true)
        case Max(a: AttributeReference) => statValue(a, lr, dataFiles, isMin = false)
        case _ => None
      }
    case _ => None
  }

  /** min/max over the scanned files' per-file stats. The stringified
    * stats order faithfully for strings (binary ≈ lexicographic) and
    * numerics (via BigDecimal) — the same contract statsAgg applies;
    * other types abort. The picked string becomes a typed value
    * through Cast(string → column type), the exact inverse of the
    * `min(col).cast("string")` that recorded it. */
  private def statValue(attr: AttributeReference, lr: LogicalRelation,
      dataFiles: Seq[graft.sources.FileMeta], isMin: Boolean): Option[Any] = {
    if (!lr.output.exists(_.exprId == attr.exprId)) return None
    val ord: Option[Ordering[String]] = attr.dataType match {
      case _: StringType => Some(Ordering.String)
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType =>
        Some(Ordering.by((s: String) => BigDecimal(s)))
      case _ => None // a type whose stringified stats don't order faithfully
    }
    ord.flatMap { o =>
      if (dataFiles.isEmpty) Some(null) // min/max over no rows is NULL
      else if (!dataFiles.forall(_.stats.contains(attr.name))) None
      else {
        val picked = dataFiles.map(m =>
          if (isMin) m.stats(attr.name)._1 else m.stats(attr.name)._2)
        val s = if (isMin) picked.min(o) else picked.max(o)
        try Some(Cast(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
            StringType), attr.dataType,
          Some(session.sessionState.conf.sessionLocalTimeZone)).eval(null))
        catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }
}
