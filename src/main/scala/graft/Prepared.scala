package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.ExecSubqueryExpression

import scala.collection.mutable

/** Prepared-query execution — the engine's plan cache.
  *
  * A query that runs repeatedly (a dashboard refresh, a bench loop, a
  * nightly job re-invoked per partition) pays Catalyst's analyze → optimize
  * → physical-plan pipeline on every submission even though the plan is
  * identical each time; at small scale factors that driver-side cost rivals
  * the execution itself (PhaseProbe at sf1: ~0.8 s of the comparable-14's
  * ~4 s total). Every mature engine amortizes this with a prepared-
  * statement / plan cache (the reference caches its compiled query module
  * per statement too — a LingoDB query is JIT-compiled ONCE and re-invoked,
  * src/execution/Execution.cpp); this is the Spark-native equivalent.
  *
  * Semantics — plan caching, NOT result caching: the cache maps the
  * canonicalized ANALYZED plan to the prepared physical plan, and every
  * execution deep-CLONES that plan before running it. Cloning re-instances
  * every operator, so whole-stage codegen, shuffle exchanges and broadcast
  * builds are all fresh per execution — scans re-read, shuffles re-write,
  * hash tables rebuild. Only the driver-side front half (parse/analyze/
  * optimize/physical planning) is amortized, exactly what EXECUTE of a
  * prepared statement amortizes elsewhere.
  *
  * Deliberately NOT cached (falls back to the normal per-query pipeline):
  *  - adaptive plans (AQE re-plans from runtime stats by design — caching
  *    its first-run shape would defeat it; AQE is enabled in the scale
  *    regime where planning cost is immaterial anyway);
  *  - plans carrying ReusedExchangeExec or subquery expressions: those
  *    nodes hold CROSS-REFERENCES to sibling operator instances that a
  *    tree clone does not re-wire, so a cloned run could silently reuse
  *    the previous run's shuffle output — result caching by accident.
  *
  * Staleness: the cache is session-scoped and keyed purely on the plan, so
  * a session that mutates the underlying files or flips planning-relevant
  * conf mid-stream should [[invalidate]] first (the bench never does
  * either; Tables.invalidate calls through).
  */
object Prepared {
  private val cache =
    new java.util.WeakHashMap[SparkSession, mutable.Map[LogicalPlan, SparkPlan]]()

  private def sessionCache(spark: SparkSession) = cache.synchronized {
    var m = cache.get(spark)
    if (m == null) { m = mutable.Map.empty; cache.put(spark, m) }
    m
  }

  def invalidate(spark: SparkSession): Unit =
    cache.synchronized { cache.remove(spark); () }

  /** Conservative full flush (Tables.invalidate is dir-keyed across
    * sessions; prepared plans don't record their dir, so drop them all). */
  def invalidateAll(): Unit = cache.synchronized { cache.clear() }

  /** True when the plan is safe to cache+clone (see object scaladoc).
    * ReusedExchangeExec over a BROADCAST exchange is allowed — cloneForRun
    * re-wires it to a fresh copy of the exchange (duplicate build of a
    * small broadcast, honest and cheap); SHUFFLE reuse is not re-wired
    * (duplicating a fact-scale shuffle would change the plan's cost), so
    * those plans fall back. */
  private def cacheable(p: SparkPlan): Boolean = p match {
    case _: AdaptiveSparkPlanExec => false
    case _ => !p.exists {
      case r: ReusedExchangeExec => !r.child.isInstanceOf[BroadcastExchangeExec]
      case q => q.expressions.exists(_.exists(_.isInstanceOf[ExecSubqueryExpression]))
    }
  }

  /** Deep-clone for one execution: every operator re-instanced (fresh
    * codegen/exchanges/broadcasts), and broadcast-reuse cross-references
    * re-pointed at fresh exchange copies so no run can observe a previous
    * run's broadcast relation. The ReusedExchangeExec wrapper stays (it
    * carries the output-attribute mapping its parents reference). */
  private def cloneForRun(planned: SparkPlan): SparkPlan =
    planned.clone().transformUp {
      case r: ReusedExchangeExec if r.child.isInstanceOf[BroadcastExchangeExec] =>
        ReusedExchangeExec(r.output, r.child.clone().asInstanceOf[BroadcastExchangeExec])
    }

  /** A FRESH QueryExecution over `df`'s analyzed plan — fresh optimizer/
    * planner run, fresh exchanges, fresh shuffle ids. The uncacheable
    * paths must use this, never `df.queryExecution.toRdd`: `toRdd` is a
    * memoized lazy val, so a caller holding one Dataset across runs (the
    * bench's prepared-statement protocol) would get the SAME RDD back and
    * a re-drain would skip every completed shuffle map stage — silent
    * result reuse, exactly what this object exists to avoid. */
  private def freshExec(df: DataFrame): RDD[InternalRow] =
    df.sparkSession.sessionState.executePlan(df.queryExecution.analyzed).toRdd

  /** Execute `df`'s query through the plan cache: on a hit the analyzed
    * plan's canonical form resolves to the prepared physical plan, which is
    * cloned and executed from scratch. Uncacheable plans re-run the normal
    * pipeline on a fresh QueryExecution per call (honest re-plan — see
    * [[freshExec]]). The returned RDD recomputes fully when drained. */
  def freshRdd(df: DataFrame): RDD[InternalRow] = {
    val qe = df.queryExecution
    if (!df.sparkSession.conf.get("spark.graft.planCache.enabled", "true").toBoolean)
      return freshExec(df) // A/B escape hatch
    val m = sessionCache(df.sparkSession)
    val key = qe.analyzed.canonicalized
    m.get(key) match {
      case Some(planned) => cloneForRun(planned).execute()
      case None =>
        val p = qe.executedPlan
        if (cacheable(p)) {
          m(key) = p
          // run the clone, not the original: the original stays pristine in
          // the cache (executing it would burn its lazy exchange state) and
          // run 1 measures the same path as run N
          cloneForRun(p).execute()
        } else freshExec(df)
    }
  }
}
