package org.apache.spark.graft

import java.util.concurrent.{Future => JFuture}

import scala.concurrent.{ExecutionContext, Future => SFuture}
import scala.concurrent.duration.Duration
import scala.reflect.ClassTag

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastMode, BroadcastPartitioning, Partitioning}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, BroadcastExchangeLike, Exchange}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.util.{KnownSizeEstimation, ThreadUtils}

/** A stable [[Broadcast]] handle over a swappable current generation.
  *
  * Whole-stage codegen captures the build side's Broadcast OBJECT into the
  * generated plan's reference array at RDD-construction time, so a cached
  * RDD DAG (graft.Prepared's rdd tier) would otherwise read the same built
  * hash relation on every drain — materialized-state reuse. This wrapper is
  * what gets captured instead: `value()` reads whatever generation is
  * current, and [[RebroadcastExchangeExec.refresh]] swaps in a freshly
  * rebuilt one (destroying the old generation's blocks) before each
  * re-drain. Tasks deserialize the wrapper from the task binary — which the
  * DAGScheduler re-serializes on every stage submission — so executors
  * always observe the current generation.
  */
class RefreshableBroadcast[T: ClassTag](first: Broadcast[T])
    extends Broadcast[T](first.id) {
  @volatile private var cur: Broadcast[T] = first

  private[graft] def swap(next: Broadcast[T]): Unit = {
    val old = cur
    cur = next
    if (old ne next) old.destroy() // async: frees the stale generation's blocks
  }

  override protected def getValue(): T = cur.value
  override protected def doUnpersist(blocking: Boolean): Unit = cur.unpersist(blocking)
  override protected def doDestroy(blocking: Boolean): Unit = cur.destroy(blocking)
}

private[graft] object Rebroadcast {
  /** Build pool for overlapped rebuilds (the analog of
    * BroadcastExchangeExec.executionContext). */
  lazy val ec: ExecutionContext = ExecutionContext.fromExecutorService(
    ThreadUtils.newDaemonCachedThreadPool("graft-rebroadcast", 32))
}

/** A broadcast exchange whose built relation is honestly REBUILT per drain.
  *
  * The prepared-RDD tier (graft.Prepared) caches a built RDD DAG and forces
  * every shuffle map stage to recompute per drain via ShuffleReset. A stock
  * [[BroadcastExchangeExec]] defeats that honesty: it memoizes its
  * relationFuture, and the consuming join captures the resulting Broadcast
  * object into codegen references — re-drains would reuse the built hash
  * table. This node is the broadcast analog of the shuffle reset: the
  * consumer captures a [[RefreshableBroadcast]] wrapper once, and
  * [[refresh]] re-runs the full build, then swaps the fresh relation in.
  *
  * Per rebuild (run 1 and every refresh alike):
  *  - the child subtree's own shuffle map outputs are forgotten first
  *    (ShuffleExchangeExec memoizes its ShuffledRowRDD, so without the
  *    reset a rebuild would skip the build side's map stages);
  *  - the rows are re-collected from the child's CACHED RDD DAG (built
  *    once, like the main DAG — what is amortized here is codegen source
  *    text and RDD construction, never data movement);
  *  - the relation is rebuilt on the driver (`mode.transform`) and shipped
  *    as a fresh TorrentBroadcast; the previous generation is destroyed.
  *
  * The 512M-row/8GB broadcast caps the stock node enforces are not
  * re-checked here: the tier only engages in the engine's tiny/small
  * regime (AQE-off sessions), where build sides are KB-MB scale.
  *
  * Nested broadcasts compose: an inner RebroadcastExchangeExec inside this
  * node's child subtree keeps its own wrapper, which the re-collected child
  * consumes; graft.Prepared refreshes innermost-first (depth groups,
  * overlapped within a group via [[beginRefresh]]/[[awaitRefresh]]) so an
  * outer rebuild only ever observes already-refreshed inner relations.
  */
case class RebroadcastExchangeExec(mode: BroadcastMode, child: SparkPlan)
    extends Exchange with BroadcastExchangeLike {

  override def outputPartitioning: Partitioning = BroadcastPartitioning(mode)

  /** The child's RDD DAG, built once; rows copied out of codegen's reused
    * UnsafeRow buffers before they cross the collect boundary. */
  @transient private lazy val collectRdd: RDD[InternalRow] =
    child.execute().mapPartitions(it => it.map(_.copy()))

  /** Shuffles feeding the child subtree. Stable across rebuilds:
    * ShuffleExchangeExec's ShuffleDependency is a memoized lazy val, which
    * is exactly why they must be forgotten per rebuild. */
  @transient private lazy val childShuffleIds: Seq[Int] =
    ShuffleReset.shuffleIds(collectRdd)

  @transient private var wrapper: RefreshableBroadcast[Any] = _
  @transient private var pending: SFuture[Broadcast[Any]] = _
  @transient private var lastRows: Long = 0L
  @transient private var lastBytes: Long = 0L

  /** One full honest build: collect job over the child DAG, driver-side
    * relation build, fresh TorrentBroadcast. */
  private def buildOnce(): Broadcast[Any] = {
    val rows = collectRdd.collect()
    val relation = mode.transform(rows)
    synchronized {
      lastRows = rows.length.toLong
      lastBytes = relation match {
        case h: KnownSizeEstimation => h.estimatedSize // HashedRelation
        case a: Array[InternalRow] =>
          a.iterator.map {
            case u: UnsafeRow => u.getSizeInBytes.toLong
            case _ => 64L
          }.sum
        case _ => 64L
      }
    }
    session.sparkContext.broadcastInternal(relation, serializedOnly = true)
      .asInstanceOf[Broadcast[Any]]
  }

  /** First half of a refresh: forget the child subtree's shuffle outputs
    * and submit the rebuild asynchronously, so graft.Prepared can overlap
    * all rebuilds of one nesting-depth group — the same overlap the normal
    * execution path gets from prepare(). No-op until a consumer has
    * captured the wrapper (run 1 builds through [[doExecuteBroadcast]]). */
  def beginRefresh(): Unit = synchronized {
    if (wrapper != null) {
      if (childShuffleIds.nonEmpty)
        ShuffleReset.forgetMapOutputs(session.sparkContext, childShuffleIds)
      pending = SFuture(buildOnce())(Rebroadcast.ec)
    }
  }

  /** Second half: await the rebuild and swap the fresh relation into the
    * stable wrapper (destroying the old generation). */
  def awaitRefresh(): Unit = {
    val p = synchronized(pending)
    if (p != null) {
      val next = ThreadUtils.awaitResult(
        p, Duration(SQLConf.get.broadcastTimeout, "s"))
      synchronized {
        wrapper.swap(next)
        pending = null
      }
    }
  }

  /** Full synchronous rebuild. */
  def refresh(): Unit = { beginRefresh(); awaitRefresh() }

  override def doExecuteBroadcast[T](): Broadcast[T] = synchronized {
    if (wrapper == null) wrapper = new RefreshableBroadcast[Any](buildOnce())
    wrapper.asInstanceOf[Broadcast[T]]
  }

  // BroadcastExchangeLike surface — non-AQE plans (the only ones the rdd
  // tier admits) consume broadcasts solely through doExecuteBroadcast, but
  // keep these truthful for any other caller.
  override def relationFuture: JFuture[Broadcast[Any]] =
    java.util.concurrent.CompletableFuture.completedFuture(doExecuteBroadcast[Any]())
  override def completionFuture: SFuture[Broadcast[Any]] =
    SFuture.successful(doExecuteBroadcast[Any]())
  override def runtimeStatistics: Statistics = synchronized {
    Statistics(sizeInBytes = BigInt(lastBytes), rowCount = Some(BigInt(lastRows)))
  }

  override protected def doExecute(): RDD[InternalRow] =
    throw new UnsupportedOperationException(
      "RebroadcastExchangeExec does not support the execute() code path.")

  override protected def doCanonicalize(): SparkPlan =
    BroadcastExchangeExec(mode.canonicalized, child.canonicalized)

  override protected def withNewChildInternal(newChild: SparkPlan): RebroadcastExchangeExec =
    copy(child = newChild)
}
