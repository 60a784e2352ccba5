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
            // ≤8 relations: exact DP enumeration (the reference runs DPhyp
            // when the subgraph count is small, OptimizeJoinOrder.cpp:122,
            // queryopt/DPhyp.cpp:4-70); larger trees and disconnected
            // graphs keep the greedy pass
            // canonical leaf order (estimate, then semantic hash): the DP
            // must be IDEMPOTENT — after a rewrite the optimizer re-runs
            // the rule on the rebuilt tree, whose flatten() yields leaves
            // in a different order; a tie broken differently would emit a
            // flipped orientation forever (no fixpoint)
            val canon = est.sortBy { case (p, e) => (e, p.semanticHash()) }
            val ordered =
              (if (est.size <= SampleJoinReorder.DpMaxRelations)
                dpOrder(canon, conds)
              else None).getOrElse(greedyOrder(est, conds))
            // no-op when the chosen order confirms the written one
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

  /** Exact bottom-up DP over connected subsets (DPsize shape — the bushy
    * search space DPhyp enumerates, sized for ≤[[SampleJoinReorder.DpMaxRelations]]
    * relations where 3^n split enumeration is trivial). Cost model is
    * C_out: Σ of estimated intermediate cardinalities, with
    *   card(S) = Π leaf-card(i∈S) × Π sel(conjunct fully inside S)
    * under predicate independence. Equi-join selectivity is the System-R
    * 1/max(ndv_a, ndv_b) with ndv estimated from the stored table SAMPLES
    * via the Chao1 richness estimator (d + f1²/2f2 — a 2k uniform sample
    * measures low-cardinality columns exactly and flags near-unique ones,
    * which linear d·N/n scaling gets wrong in both directions); non-equi
    * conjuncts take the classic 1/3. Cross joins are never introduced: a
    * split is legal only when some conjunct spans it, so a disconnected
    * graph yields None and the greedy pass (which preserves the query's own
    * cross) takes over. */
  private def dpOrder(
      est: Seq[(LogicalPlan, Double)], conds: Seq[Expression]): Option[LogicalPlan] = {
    val n = est.size
    val leaves = est.map(_._1)
    val cards = est.map(_._2)
    val outSets = leaves.map(_.outputSet)
    val allOut = outSets.reduce(_ ++ _)
    if (!conds.forall(_.references.subsetOf(allOut))) return None
    // per-conjunct: bitmask of referenced leaves + estimated selectivity
    val cMasks = conds.map { c =>
      (0 until n).foldLeft(0) { (m, i) =>
        if (c.references.intersect(outSets(i)).nonEmpty) m | (1 << i) else m
      }
    }
    // exprId → (sample path, true count): the relation's own attributes,
    // traced through Filter/Project pass-throughs (an aliased column simply
    // doesn't resolve and its conjunct takes the fallback selectivity)
    val attrMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId, (String, Long)] =
      leaves.flatMap { leaf =>
        relOf(leaf) match {
          case Some(r) => SampleJoinReorder.tableOf(r) match {
            case Some(info) => r.output.map(a => a.exprId -> info)
            case None => Nil
          }
          case None => Nil
        }
      }.toMap
    val cSels = conds.map(c => selOfConjunct(c, attrMap))
    val full = (1 << n) - 1
    // card(S) for every subset
    val card = new Array[Double](full + 1)
    var s = 1
    while (s <= full) {
      var c = 1.0
      var i = 0
      while (i < n) { if ((s & (1 << i)) != 0) c *= cards(i); i += 1 }
      var k = 0
      while (k < conds.length) {
        if (cMasks(k) != 0 && (cMasks(k) & s) == cMasks(k)) c *= cSels(k)
        k += 1
      }
      card(s) = c
      s += 1
    }
    // DP: best cost + winning split per connected subset
    val cost = Array.fill(full + 1)(Double.PositiveInfinity)
    val split = new Array[Int](full + 1)
    var i0 = 0
    while (i0 < n) { cost(1 << i0) = 0.0; i0 += 1 }
    var size = 2
    while (size <= n) {
      var sMask = 1
      while (sMask <= full) {
        if (Integer.bitCount(sMask) == size) {
          var s1 = (sMask - 1) & sMask
          while (s1 > 0) {
            val s2 = sMask ^ s1
            if (s1 < s2 || true) { // both orientations priced identically below
              if (cost(s1).isFinite && cost(s2).isFinite) {
                val connects = conds.indices.exists { k =>
                  (cMasks(k) & sMask) == cMasks(k) &&
                    (cMasks(k) & s1) != 0 && (cMasks(k) & s2) != 0
                }
                if (connects) {
                  val c = cost(s1) + cost(s2) + card(sMask)
                  // strict tie-break on the split mask keeps the plan
                  // deterministic under equal costs (idempotence)
                  if (c < cost(sMask) ||
                    (c == cost(sMask) && s1 < split(sMask))) {
                    cost(sMask) = c; split(sMask) = s1
                  }
                }
              }
            }
            s1 = (s1 - 1) & sMask
          }
        }
        sMask += 1
      }
      size += 1
    }
    if (!cost(full).isFinite) return None
    // emit, attaching each conjunct at the first join covering its refs
    def build(sMask: Int): LogicalPlan =
      if (Integer.bitCount(sMask) == 1)
        leaves(Integer.numberOfTrailingZeros(sMask))
      else {
        val s1 = split(sMask)
        val s2 = sMask ^ s1
        val applicable = conds.indices.filter { k =>
          (cMasks(k) & sMask) == cMasks(k) &&
            !((cMasks(k) & s1) == cMasks(k)) && !((cMasks(k) & s2) == cMasks(k))
        }.map(conds)
        Join(build(s1), build(s2), Inner,
          applicable.reduceOption(And), JoinHint.NONE)
      }
    Some(build(full))
  }

  private def relOf(leaf: LogicalPlan): Option[LogicalRelation] = leaf match {
    case Project(_, c) => relOf(c)
    case Filter(_, c) => relOf(c)
    case r: LogicalRelation => Some(r)
    case _ => None
  }

  /** Selectivity of one join conjunct (see [[dpOrder]] model). */
  private def selOfConjunct(c: Expression,
      attrMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId, (String, Long)]): Double =
    c match {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          a: AttributeReference, b: AttributeReference) =>
        (ndvOfAttr(a, attrMap), ndvOfAttr(b, attrMap)) match {
          case (Some(x), Some(y)) => 1.0 / math.max(math.max(x, y), 1.0)
          case _ => 0.1
        }
      case _ => 1.0 / 3.0
    }

  /** NDV of the table column backing `a`, estimated from its stored sample
    * (Chao1; exact for saturated low-cardinality columns, true-count for
    * near-unique keys), cached per (sample, column). None if no sampled
    * table exposes the attribute. */
  private def ndvOfAttr(a: AttributeReference,
      attrMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId, (String, Long)])
      : Option[Double] = {
    attrMap.get(a.exprId).flatMap { case (samplePath, total) =>
      val key = samplePath + "#ndv#" + a.name
      Option(SampleJoinReorder.selCache.get(key)).orElse {
        val sample = SampleJoinReorder.sampleCache.computeIfAbsent(
          samplePath, p => spark.read.parquet(p))
        if (!sample.schema.fieldNames.contains(a.name)) None
        else {
          import org.apache.spark.sql.functions.{col, count, lit}
          val freqs = sample.groupBy(col(a.name)).agg(count(lit(1)).as("f"))
            .collect().map(_.getLong(1))
          val nS = freqs.sum.toDouble
          val d = freqs.length.toDouble
          val f1 = freqs.count(_ == 1L).toDouble
          val f2 = freqs.count(_ == 2L).toDouble
          val ndv =
            if (nS == 0) 1.0
            else if (f2 > 0) math.min(d + f1 * f1 / (2 * f2), total.toDouble)
            else if (f1 >= nS) total.toDouble // all singletons: unique key
            else d // saturated: sample captured the full domain
          val v = math.max(ndv, 1.0)
          SampleJoinReorder.selCache.put(key, v)
          Some(v)
        }
      }
    }
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
  /** Exact-DP threshold: the reference's DPhyp fires below its own subgraph
    * bound (OptimizeJoinOrder.cpp:122); 8 relations keeps split
    * enumeration at 3^8 ≈ 6.6k — microseconds. */
  val DpMaxRelations: Int = 8

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
