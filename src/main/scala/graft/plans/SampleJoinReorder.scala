package graft.plans

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Sample-driven join reordering — the Spark analog of the reference's
  * per-predicate sample selectivity estimation (reference
  * src/compiler/Dialect/RelAlg/Transforms/queryopt/QueryGraph.cpp:264-294,
  * which evaluates predicates against stored Arrow samples before DPhyp
  * ordering). Catalyst's CBO covers column-stat histograms (ANALYZE TABLE,
  * PlanSpec's flip test) but falls back to guesses for complex/correlated
  * predicates — exactly where sampling shines.
  *
  * Mechanics: `tools.ScaleUp` persists a ~2k-row uniform sample per table
  * (`_samples/<table>.parquet` + `.count` with the true row count). At
  * optimize time this rule flattens each maximal inner-join tree, evaluates
  * every leaf's pushed-down filter against its table's sample (driver-local,
  * cached per (table, predicate) — the one deliberately driver-sized object,
  * like the reference's Arrow sample blocks), scales to estimated rows, and
  * rebuilds a left-deep tree greedily: smallest estimated leaf first, then
  * repeatedly the smallest leaf connected to the built prefix by a join
  * predicate (never introducing a cross join the query didn't have).
  *
  * Opt-in (`spark.graft.sampleReorder.enabled=true`) and conservative: it
  * only fires when EVERY leaf of the join tree maps to a sampled table, the
  * joins are plain hint-free inner joins, and predicates are deterministic
  * and subquery-free. PlanSpec holds the ON/OFF flip test.
  */
case class SampleJoinReorder(spark: SparkSession) extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.sampleReorder.enabled").exists(_.toBoolean)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case j: Join if eligible(j) =>
        val (items, conds) = flatten(j)
        if (items.size < 3) j
        else estimateAll(items) match {
          case Some(est) =>
            val ordered = greedyOrder(est, conds)
            // no-op when greedy confirms the written order (fixed-point safety)
            if (ordered.fastEquals(j)) j else Project(j.output, ordered)
          case None => j
        }
    }

  private def eligible(j: Join): Boolean =
    j.joinType == Inner && j.hint == JoinHint.NONE && j.condition.isDefined

  /** Flatten a tree of plain inner joins into (leaf plans, conjuncts). */
  private def flatten(plan: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) =
    plan match {
      case Join(l, r, Inner, cond, hint) if hint == JoinHint.NONE =>
        val (li, lc) = flatten(l)
        val (ri, rc) = flatten(r)
        (li ++ ri, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case other => (Seq(other), Nil)
    }

  /** (leaf, estimated rows) for every leaf, or None if any leaf is not a
    * sampled table scan (rule must then stand down). */
  private def estimateAll(items: Seq[LogicalPlan]): Option[Seq[(LogicalPlan, Double)]] = {
    val ests = items.map(leaf => estimate(leaf).map(leaf -> _))
    if (ests.forall(_.isDefined)) Some(ests.flatten) else None
  }

  /** Estimated output rows of a leaf: true row count × sampled selectivity
    * of its (already pushed-down) filters. */
  private def estimate(leaf: LogicalPlan): Option[Double] = leaf match {
    case Project(_, child) => estimate(child)
    case Filter(cond, child) =>
      for {
        base <- estimate(child)
        sel <- selectivity(child, cond)
      } yield base * sel
    case rel: LogicalRelation => SampleJoinReorder.tableOf(rel).map(_._2.toDouble)
    case _ => None
  }

  private def selectivity(scan: LogicalPlan, cond: Expression): Option[Double] = {
    val ok = cond.deterministic &&
      !cond.exists(_.isInstanceOf[SubqueryExpression])
    if (!ok) return None
    scan match {
      case rel: LogicalRelation =>
        SampleJoinReorder.tableOf(rel).flatMap { case (samplePath, _) =>
          val key = samplePath + "#" + cond.canonicalized.toString
          Option(SampleJoinReorder.selCache.get(key)).orElse {
            val computed = evalOnSample(samplePath, cond)
            computed.foreach(v => SampleJoinReorder.selCache.put(key, v))
            computed
          }
        }
      case _ => None
    }
  }

  /** Fraction of the stored sample matching `cond` (attributes re-bound by
    * name; a name the sample lacks → no estimate). */
  private def evalOnSample(samplePath: String, cond: Expression): Option[Double] = {
    val sample = SampleJoinReorder.sampleCache.computeIfAbsent(
      samplePath, p => spark.read.parquet(p))
    val byName = sample.schema.fieldNames.toSet
    if (!cond.references.forall(a => byName.contains(a.name))) return None
    val attrByName: Map[String, Attribute] =
      sample.queryExecution.analyzed.output.map(a => a.name -> a).toMap
    val rebound = cond.transform {
      case a: AttributeReference => attrByName(a.name)
    }
    val n = sample.count().toDouble
    if (n == 0) return Some(1.0)
    val m = sample.filter(GraftColumnBridge.column(rebound)).count().toDouble
    Some(m / n)
  }

  /** Left-deep tree: smallest leaf first, then smallest leaf connected via
    * some conjunct; conjuncts are attached as soon as both sides exist. */
  private def greedyOrder(
      est: Seq[(LogicalPlan, Double)], conds: Seq[Expression]): LogicalPlan = {
    val unused = mutable.Buffer(conds: _*)
    var remaining = est.sortBy(_._2)
    var result = remaining.head._1
    remaining = remaining.tail
    while (remaining.nonEmpty) {
      val idx = remaining.indexWhere { case (p, _) =>
        unused.exists { c =>
          c.references.subsetOf(result.outputSet ++ p.outputSet) &&
            c.references.intersect(p.outputSet).nonEmpty &&
            c.references.intersect(result.outputSet).nonEmpty
        }
      }
      val pick = math.max(idx, 0) // disconnected remainder: keep size order
      val (p, _) = remaining(pick)
      remaining = remaining.patch(pick, Nil, 1)
      val applicable = unused.filter(c =>
        c.references.subsetOf(result.outputSet ++ p.outputSet)).toSeq
      unused --= applicable
      result = Join(result, p,
        if (applicable.isEmpty) Cross else Inner,
        applicable.reduceOption(And), JoinHint.NONE)
    }
    unused.reduceOption(And).map(Filter(_, result)).getOrElse(result)
  }
}

object SampleJoinReorder {
  private val sampleCache = new ConcurrentHashMap[String, DataFrame]()
  private val selCache = new ConcurrentHashMap[String, Double]()

  /** Resolve a relation to its (sample parquet path, true row count): the
    * table `<dir>/<name>.parquet` samples to `<dir>/_samples/<name>.parquet`
    * (+ `.count`); the bucketed layout `<dir>/_bucketed/<name>` resolves to
    * the same `_samples` of its parent dir. */
  private[plans] def tableOf(rel: LogicalRelation): Option[(String, Long)] = {
    val root = rel.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
    root.flatMap { r =>
      val p = r.stripPrefix("file:")
      val f = new java.io.File(p)
      val (dir, name) =
        if (f.getParentFile != null && f.getParentFile.getName == "_bucketed")
          (f.getParentFile.getParentFile.getPath, f.getName)
        else (f.getParent, f.getName.stripSuffix(".parquet"))
      val sample = new java.io.File(s"$dir/_samples/$name.parquet")
      val countF = new java.io.File(s"$dir/_samples/$name.count")
      if (sample.isDirectory && countF.isFile) {
        val src = scala.io.Source.fromFile(countF)
        try Some((sample.getPath, src.mkString.trim.toLong))
        finally src.close()
      } else None
    }
  }
}
