package graft.sqlsurface

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import scala.collection.mutable
import scala.util.Try

/** `CREATE INDEX` as a real physical layout — the Spark-native counterpart
  * of the reference's persistent hash index (reference
  * src/runtime/LingoDBHashIndex.cpp, src/catalog/IndexCatalogEntry.cpp;
  * `CREATE INDEX` wiring in src/catalog/Catalog.cpp). The reference builds
  * a hash table keyed on the index columns and its optimizer turns an
  * equi-join against the indexed table into an index-nested-loop join
  * (OptimizeImplementations.cpp:587-588). On Spark the equivalent physical
  * property is a BUCKETED, per-bucket-sorted parquet layout: a scan of the
  * indexed table reports `HashPartitioning(leadingCol, nBuckets)`, so an
  * equi-join or aggregate keyed on the index column runs with ZERO shuffle
  * exchange on the indexed side (and zero on both sides when both are
  * indexed on the join key with the same bucket count) — the same
  * pre-organized-by-key contract the reference's hash index provides, in
  * the form a 1000-executor cluster can use.
  *
  * Mechanics per `CREATE [UNIQUE] INDEX name ON table(cols...)`:
  *  1. snapshot `table` (temp view or catalog table) and write it
  *     `bucketBy(n, leading)` + `sortBy(index cols)` under a session temp
  *     dir; one file per bucket (repartition before write) so Spark's
  *     sorted-bucket metadata stays usable;
  *  2. register the layout as a bucketed catalog table;
  *  3. shadow the original name with a temp view over the bucketed table —
  *     every later read (SQL or `spark.table`) resolves to the indexed
  *     layout, exactly as reference queries transparently use the index.
  *     If the original name was itself a temp view, its DataFrame is saved
  *     so un-shadowing restores the original binding instead of losing it.
  *
  * Bucket count scales with table size (`max(1, bytes/128MB)` capped at the
  * session shuffle parallelism): a 130-row sqllogictest table gets one
  * bucket (cheap, and two such tables indexed on a shared join key are
  * trivially co-partitioned), a fact table gets the full parallelism.
  *
  * Writes to an indexed table keep results correct rather than going
  * stale: [[beforeWrite]] drops the shadow so the statement hits the base
  * table, [[afterWrite]] brings the index up to date. When the caller can
  * supply the just-inserted rows, the delta is APPENDED to the bucketed
  * layout — O(delta) work, the Spark analog of the reference's in-place
  * hash-index append (src/catalog/IndexCatalogEntry.cpp) — with a periodic
  * full compaction (every [[CompactEvery]] appends) restoring the
  * one-file-per-bucket sorted form. Writes with no extractable delta
  * (INSERT OVERWRITE, column-list INSERTs) fall back to a full rebuild.
  * `CREATE TABLE`/`DROP TABLE` of a shadowed name discard its indexes.
  *
  * UNIQUE is enforced at build AND append time over non-null keys only —
  * SQL unique-index semantics: NULL keys never collide (NULL != NULL), so
  * any number of NULL-keyed rows is legal. Violation raises instead of
  * silently indexing.
  *
  * Unparseable CREATE INDEX forms (expression indexes like `ON t(a+b)`,
  * columns missing from the table) degrade to accept-as-no-op: the corpus
  * treats index DDL as `statement ok` and results never depend on it.
  */
object IndexSurface {

  /** Full compaction (rewrite to one sorted file per bucket) after this
    * many delta appends — bounds read amplification from multi-file
    * buckets while keeping the common append O(delta). */
  val CompactEvery = 16

  private val createIndexRe =
    """(?is)^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+ON\s+(\w+)\s*\(([^)]*)\)\s*;?\s*$""".r

  val isCreateIndex: String => Boolean =
    s => """(?is)^\s*CREATE\s+(?:UNIQUE\s+)?INDEX\s+.*$""".r.matches(s)

  private val dropIndexRe =
    """(?is)^\s*DROP\s+INDEX\s+(?:IF\s+EXISTS\s+)?(\w+)\s*;?\s*$""".r

  val isDropIndex: String => Boolean = s => dropIndexRe.matches(s)

  private val identRe = """[A-Za-z_][A-Za-z0-9_]*""".r

  private case class IndexDef(name: String, table: String,
      cols: Seq[String], unique: Boolean, dir: String)

  /** Session-scoped registry: table name (lowercase) → its indexes, newest
    * last (the newest one backs the shadow view). Weak-keyed so a stopped
    * session's entries are collectable. */
  private val registry =
    new java.util.WeakHashMap[SparkSession, mutable.Map[String, List[IndexDef]]]()

  /** Temp-view bases captured at first index build: table name → the
    * original view's DataFrame, restored on un-shadow (a temp-view base
    * would otherwise be REPLACED by the shadow and lost at DROP INDEX). */
  private val baseViews =
    new java.util.WeakHashMap[SparkSession, mutable.Map[String, DataFrame]]()

  /** Delta appends since the last full build, per index dir (compaction). */
  private val appendCounts = mutable.Map.empty[String, Int]

  private def sessionIndexes(spark: SparkSession) = registry.synchronized {
    var m = registry.get(spark)
    if (m == null) { m = mutable.Map.empty; registry.put(spark, m) }
    m
  }

  private def sessionBases(spark: SparkSession) = registry.synchronized {
    var m = baseViews.get(spark)
    if (m == null) { m = mutable.Map.empty; baseViews.put(spark, m) }
    m
  }

  /** Execute one CREATE INDEX statement (no-op degrade for invalid forms —
    * see object scaladoc). */
  def create(spark: SparkSession, stmt: String): Unit = stmt match {
    case createIndexRe(uniq, name, table, colList) =>
      // strip per-column ASC/DESC/NULLS FIRST|LAST (select4.test: `e8 DESC, d8 ASC`)
      val cols = colList.split(",").map(_.trim
        .replaceAll("(?i)\\s+(asc|desc)\\b", "")
        .replaceAll("(?i)\\s+nulls\\s+(first|last)\\b", "")
        .trim).filter(_.nonEmpty).toSeq
      val schema = Try(spark.table(table).schema).toOption
      // expression indexes (`ON t(a+b)`) or unknown columns: tolerated no-op,
      // not an AnalysisException mid-`statement ok`
      val valid = schema.exists(sch => cols.nonEmpty && cols.forall(c =>
        identRe.matches(c) && sch.fieldNames.exists(_.equalsIgnoreCase(c))))
      if (valid) {
        drop(spark, s"DROP INDEX IF EXISTS $name") // re-CREATE replaces
        build(spark, IndexDef(name, table.toLowerCase, cols,
          unique = uniq != null, dir = newIndexDir(name)))
      }
    case _ => () // tolerated, not indexed
  }

  def drop(spark: SparkSession, stmt: String): Unit = stmt match {
    case dropIndexRe(name) =>
      val idxs = sessionIndexes(spark)
      idxs.find(_._2.exists(_.name.equalsIgnoreCase(name))).foreach {
        case (table, defs) =>
          val remaining = defs.filterNot(_.name.equalsIgnoreCase(name))
          dropShadow(spark, table)
          defs.filter(_.name.equalsIgnoreCase(name)).foreach(unregister(spark, _))
          if (remaining.isEmpty) {
            idxs.remove(table)
            sessionBases(spark).remove(table) // dropShadow already restored it
          } else { idxs(table) = remaining; shadow(spark, remaining.last) }
      }
    case _ => ()
  }

  /** Route a write statement (INSERT/COPY/CTAS target) at the base table:
    * drop the shadow view so name resolution reaches the real table (a
    * temp-view base is restored, not just unshadowed). */
  def beforeWrite(spark: SparkSession, table: String): Unit =
    if (sessionIndexes(spark).contains(table.toLowerCase))
      dropShadow(spark, table.toLowerCase)

  /** Reject a write that would violate a UNIQUE index BEFORE it executes,
    * so the base table is left unchanged (the reference's hash index
    * rejects the offending append in place). Only possible when the delta
    * is known; otherwise the violation surfaces at the afterWrite rebuild. */
  def preWriteCheck(spark: SparkSession, table: String,
      delta: Option[DataFrame]): Unit =
    delta.foreach { dd =>
      sessionIndexes(spark).get(table.toLowerCase).foreach { defs =>
        defs.filter(_.unique).foreach { d =>
          val snapT = Try(spark.table(registeredName(d)))
          if (snapT.isSuccess && dd.schema.length == snapT.get.schema.length) {
            val aligned = dd.toDF(snapT.get.schema.fieldNames: _*)
            assertNoDupKeys(aligned, d, "inserted rows")
            assertNoKeyClash(aligned, snapT.get, d)
          }
        }
      }
    }

  /** Bring the indexes of a just-written table up to date. With `delta`
    * (the inserted rows, materialized BEFORE the write ran) each index
    * appends O(delta) to its bucketed layout; without, the snapshot is
    * rebuilt from the base table. */
  def afterWrite(spark: SparkSession, table: String,
      delta: Option[DataFrame] = None): Unit =
    sessionIndexes(spark).get(table.toLowerCase).foreach { defs =>
      defs.foreach { d =>
        val appended = delta.exists(appendDelta(spark, d, _))
        if (!appended) { buildFiles(spark, d); appendCounts.remove(d.dir) }
      }
      shadow(spark, defs.last)
    }

  /** A table is being re-created or dropped: its indexes no longer apply,
    * and the old name binding is intentionally discarded (not restored). */
  def invalidate(spark: SparkSession, table: String): Unit = {
    val idxs = sessionIndexes(spark)
    idxs.remove(table.toLowerCase).foreach { defs =>
      spark.catalog.dropTempView(table.toLowerCase)
      sessionBases(spark).remove(table.toLowerCase)
      defs.foreach(unregister(spark, _))
    }
  }

  /** Table names (lowercase) that currently carry an index shadow. */
  def indexedTables(spark: SparkSession): Set[String] =
    sessionIndexes(spark).keySet.toSet

  // ------------------------------------------------------------ internals

  private def build(spark: SparkSession, d: IndexDef): Unit = {
    val idxs = sessionIndexes(spark)
    if (!idxs.contains(d.table)) {
      // first index on this table: if the name is a temp view, remember its
      // DataFrame — the shadow will REPLACE the view, not stack under it
      val isTempView = Try(spark.catalog.getTable(d.table).isTemporary).getOrElse(false)
      if (isTempView) sessionBases(spark)(d.table) = spark.table(d.table)
    }
    buildFiles(spark, d)
    idxs(d.table) = idxs.getOrElse(d.table, Nil) :+ d
    shadow(spark, d)
  }

  /** UNIQUE-index duplicate check over NON-NULL keys only (NULL != NULL:
    * any number of NULL-keyed rows is legal in SQL unique-index semantics). */
  private def assertNoDupKeys(df: DataFrame, d: IndexDef, what: String): Unit = {
    val keyCols = d.cols.map(c => col(quote(c)))
    val dups = df.filter(keyCols.map(_.isNotNull).reduce(_ && _))
      .groupBy(keyCols: _*).count()
      .filter(col("count") > 1).limit(1).count()
    require(dups == 0L, s"UNIQUE index ${d.name}: duplicate key in $what")
  }

  /** Inserted keys must not collide with keys already indexed (non-null
    * keys only, same NULL semantics as [[assertNoDupKeys]]). */
  private def assertNoKeyClash(delta: DataFrame, snap: DataFrame, d: IndexDef): Unit = {
    val keyCols = d.cols.map(c => col(quote(c)))
    val clash = delta
      .filter(keyCols.map(_.isNotNull).reduce(_ && _))
      .select(keyCols: _*)
      .join(snap.select(keyCols: _*), d.cols)
      .limit(1).count()
    require(clash == 0L,
      s"UNIQUE index ${d.name}: inserted key already present in ${d.table}")
  }

  /** Write the bucketed snapshot + register the bucketed catalog table.
    * Resolves the table through the CURRENT name (an earlier index's shadow
    * holds the same rows; on an afterWrite rebuild the shadow is already
    * dropped, so this reads the freshly-written base table). */
  private def buildFiles(spark: SparkSession, d: IndexDef): Unit = {
    val src = spark.table(d.table)
    if (d.unique) assertNoDupKeys(src, d, d.table)
    val bytes = src.queryExecution.optimizedPlan.stats.sizeInBytes
    val parallelism = spark.sessionState.conf.numShufflePartitions
    val nBuckets = math.max(1L, math.min(parallelism.toLong,
      (bytes / (128L << 20)).toLong)).toInt
    val lead = d.cols.head
    val tmp = new File(d.dir); deleteRec(tmp); tmp.mkdirs()
    // repartition on the bucket expression → each task owns whole buckets →
    // exactly one file per bucket, which is what keeps Spark's sorted-bucket
    // metadata usable at read time (multi-file buckets lose the sort)
    val tbl = registeredName(d)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    src.repartition(nBuckets, col(lead))
      .write.mode("overwrite")
      .option("path", d.dir)
      .bucketBy(nBuckets, lead)
      .sortBy(d.cols.head, d.cols.tail: _*)
      .format("parquet")
      .saveAsTable(tbl)
  }

  /** Append just-inserted rows to the existing bucketed layout — O(delta),
    * no full-table rewrite. Multi-file buckets keep the zero-exchange
    * HashPartitioning property (only the per-bucket sort claim is lost
    * until the next compaction). Returns false (caller rebuilds) on any
    * shape mismatch; a UNIQUE violation raises, matching build-time. */
  private def appendDelta(spark: SparkSession, d: IndexDef, delta: DataFrame): Boolean = {
    val tbl = registeredName(d)
    val snapT = Try(spark.table(tbl))
    if (snapT.isFailure) return false
    val snap = snapT.get
    if (delta.schema.length != snap.schema.length) return false
    val count = appendCounts.getOrElse(d.dir, 0)
    if (count >= CompactEvery) return false // caller full-rebuilds = compaction
    val aligned = delta.toDF(snap.schema.fieldNames: _*)
    if (d.unique) {
      assertNoDupKeys(aligned, d, "inserted rows")
      assertNoKeyClash(aligned, snap, d)
    }
    val ok = Try {
      // insertInto picks up the catalog table's bucketSpec: the write hashes
      // rows into the existing bucket scheme (new files, same bucket ids)
      aligned.write.mode("append").insertInto(tbl)
    }.isSuccess
    if (ok) appendCounts(d.dir) = count + 1
    ok
  }

  /** Point the table name at the indexed layout (temp views shadow catalog
    * tables in resolution, so SQL and `spark.table` both see it). */
  private def shadow(spark: SparkSession, d: IndexDef): Unit =
    spark.table(registeredName(d)).createOrReplaceTempView(d.table)

  /** Remove the shadow; a temp-view base gets its original binding back. */
  private def dropShadow(spark: SparkSession, table: String): Unit =
    sessionBases(spark).get(table) match {
      case Some(base) => base.createOrReplaceTempView(table)
      case None => spark.catalog.dropTempView(table); ()
    }

  private def unregister(spark: SparkSession, d: IndexDef): Unit = {
    Try(spark.sql(s"DROP TABLE IF EXISTS ${registeredName(d)}"))
    appendCounts.remove(d.dir)
    deleteRec(new File(d.dir))
  }

  private def registeredName(d: IndexDef) =
    s"graft_idx_${d.table}_${d.name.toLowerCase}"

  private def quote(c: String) = s"`$c`"

  private def newIndexDir(name: String): String =
    Files.createTempDirectory(s"graft_idx_${name.toLowerCase}_").toFile.getAbsolutePath

  private def deleteRec(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }
}
