package graft

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Parquet-backed table loader over a scale-factor directory.
  *
  * The reference's equivalent is the persistent catalog of Arrow tables
  * (reference src/catalog/Catalog.cpp, include/lingodb/runtime/storage/LingoDBTable.h:12-40);
  * on Spark the idiomatic form is a columnar datasource scan — Catalyst pushes
  * filters and prunes columns into the parquet reader, which is the moral
  * equivalent of LingoDB's scan-with-restriction
  * (relalg.basetable, reference include/lingodb/compiler/Dialect/RelAlg/IR/RelAlgOps.td:120-130).
  *
  * Bucketed layout: when a scale dir carries `_bucketed/<table>/` (written by
  * tools.ScaleUp), the table is registered as a bucketed catalog table and
  * read with Spark's bucketed scan — the Spark-native analog of the
  * reference's persistent hash index (reference
  * src/runtime/LingoDBHashIndex.cpp, OptimizeImplementations.cpp:587-588):
  * both sides of an equi-join on the bucket key are pre-partitioned on disk,
  * so the join (and any groupBy on that key) runs with ZERO shuffle
  * exchanges. This is what keeps a 100 TB fact-fact join shuffle-free on a
  * real cluster; SURVEY §2.5.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-scoped catalog cache: (dir, table) → loaded DataFrame.
    *
    * `spark.read.parquet` pays a directory listing plus a schema-inference
    * Spark job (a footer read) on EVERY call — measured ~68 ms per table at
    * sf0.1, so a 6-table query spent ~0.4 s re-deriving schemas it already
    * knew (tools.StageProbe, PERF_r10 §2). A real engine resolves tables
    * against a persistent catalog (the reference keeps Arrow-table metadata
    * in src/catalog/Catalog.cpp; DuckDB likewise never re-reads footers per
    * query), so caching the resolved LogicalRelation is the Spark-native
    * catalog analog, not a benchmark trick. The logical plan is immutable
    * and the file listing is a snapshot — correct for the engine's
    * read-only table contract; call [[invalidate]] after rewriting a dir
    * in-place (no in-repo caller does).
    *
    * Keyed weakly per SparkSession so a stopped session's plans are
    * collectable and tests with multiple sessions don't cross-wire. */
  private val catalogCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  private def sessionCache(spark: SparkSession) = catalogCache.synchronized {
    var m = catalogCache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
      catalogCache.put(spark, m)
    }
    m
  }

  /** Drop cached plans for `dir` (all sessions); use after an in-place
    * rewrite. Prepared physical plans capture scan file listings, so the
    * plan cache goes with it. */
  def invalidate(dir: String): Unit = catalogCache.synchronized {
    catalogCache.values.forEach { m =>
      m.keySet.removeIf(k => k._1 == dir)
    }
    Prepared.invalidateAll()
  }

  /** Bucketed-layout marker written by tools.ScaleUp:
    * `_bucketed/<name>/_bucketspec` holds "<bucketKey> <numBuckets>". */
  private def bucketSpec(dir: String, name: String): Option[(String, Int)] = {
    val f = new File(s"$dir/_bucketed/$name/_bucketspec")
    if (!f.isFile) None
    else {
      val src = scala.io.Source.fromFile(f)
      try {
        val Array(k, n) = src.mkString.trim.split("\\s+")
        Some((k, n.toInt))
      } finally src.close()
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    sessionCache(spark).computeIfAbsent((dir, name), { _ =>
      normalizeTs(bucketSpec(dir, name) match {
        case Some((key, n)) => bucketed(spark, dir, name, key, n)
        case None => spark.read.parquet(s"$dir/$name.parquet")
      })
    })

  /** Scan-path load: ALWAYS the plain range-clustered layout, even when a
    * bucketed layout exists. A bucketed scan is one task per bucket file —
    * the price of hash-clustering, worth paying only when the query joins
    * or aggregates ON the bucket key (zero-exchange). A query that never
    * touches the key (tpch_q1/q6 full-table scans, o_custkey aggregates
    * over orderkey-bucketed orders) gets nothing back for the lost
    * splittability: at sf100 the 32 unsplittable ~400 MB bucket files
    * serialize q1's scan to one wave of 32 tasks with no straggler
    * absorption — measured 7.6 → 5.8 s (tools.LayoutProbe) against the
    * plain layout's 32 MB-row-group size-based splits. The same choice an
    * optimizer makes between a clustered index scan and a heap scan. */
  def loadScan(spark: SparkSession, dir: String, name: String): DataFrame =
    sessionCache(spark).computeIfAbsent((dir, name + "#scan"), { _ =>
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    })

  /** The driver's `events.ts` has shipped as TIMESTAMP(NANOS) (read as raw
    * ns longs via the nanosAsLong session config) and as TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ) across testdata revisions. All downstream time
    * arithmetic is exact integer math on ns-since-epoch longs (matching
    * DuckDB's epoch_ns), so normalize any timestamp-typed `ts` to that
    * representation here — one map-side projection over the scan, no
    * shuffle, and every consumer stays physical-type agnostic. Sessions run
    * with spark.sql.session.timeZone=UTC, so the NTZ→instant cast is the
    * identity mapping DuckDB applies to naive parquet timestamps. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
      case _ => df
    }

  /** Register (once per session) and read the bucketed layout. The files are
    * plain parquet written by Spark's bucketed writer (bucket id encoded in
    * the file name), so the only session state is the catalog entry — DDL
    * with an explicit column list because CLUSTERED BY forbids schema
    * inference. */
  private def bucketed(
      spark: SparkSession, dir: String, name: String,
      key: String, n: Int): DataFrame = synchronized {
    val tbl = s"graft_bkt_${name}_${Integer.toHexString(dir.hashCode)}"
    if (!spark.catalog.tableExists(tbl)) {
      val path = s"$dir/_bucketed/$name"
      val ddl = spark.read.parquet(path).schema.toDDL
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $tbl ($ddl) USING parquet " +
          s"CLUSTERED BY ($key) SORTED BY ($key) INTO $n BUCKETS " +
          s"LOCATION '$path'")
    }
    spark.table(tbl)
  }

  /** Register every table of a scale-factor dir as a temp view (for the
    * SQL-entry surface, mirroring the reference's `Connection.sql`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Dimension-side join strategy, regime-aware (Engine sets
    * spark.graft.smallData from the data dir's largest table).
    *
    * At scale: an explicit BROADCAST hint — the estimate-blind choice the
    * fact-side plans rely on at sf100 (a 20 MB key set pruning a 600M-row
    * fact is worth any driver build cost, and estimates routinely block it).
    *
    * Tiny/small data: a SHUFFLE_HASH hint instead. The same hash relation
    * is built per-partition in parallel out of an 8-wide exchange, rather
    * than collected to the driver, built single-threaded, serialized and
    * re-deserialized per task — HitProbe r11 measured that broadcast path
    * at 0.06–0.18 s per run across the seven broadcast-bearing headline
    * queries, several times the actual fact-side work at these sizes.
    * Keeping the plan broadcast-free also makes it eligible for the
    * prepared-RDD execution tier (Prepared.scala), which amortizes
    * whole-stage-codegen source generation across runs. */
  def dim(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.smallData", "false").toBoolean)
      df.hint("shuffle_hash")
    else org.apache.spark.sql.functions.broadcast(df)

  /** Shuffle-hash hint applied ONLY on small data (identity at scale) —
    * for joins whose hinted side must never be broadcast at scale (e.g. a
    * per-key aggregate that grows with the fact table) but where the
    * planner's estimate-driven pick at KB-MB sizes is a broadcast whose
    * driver-side build costs more than the join (see [[dim]]). */
  def hashIfSmall(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get("spark.graft.smallData", "false").toBoolean)
      df.hint("shuffle_hash")
    else df

}
