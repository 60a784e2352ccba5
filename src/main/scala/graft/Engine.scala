package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine — the Spark analog of the reference's
  * session/connection object (`Connection.sql`, reference
  * tools/python/lingodb/__init__.py:44-75; DefaultQueryExecuter,
  * src/execution/Execution.cpp:280-394). Catalyst's optimizer pipeline plays
  * the role of the reference's RelAlg pass pipeline
  * (src/compiler/Dialect/RelAlg/Passes.cpp:17-50); AQE is the runtime
  * re-optimizer standing in for sample-driven DPhyp join ordering (SURVEY §4.1).
  */
object Engine {
  /** Scan-split sizing derived from the data directory's actual file layout.
    *
    * Parquet scans split at [maxPartitionBytes] boundaries; the right value
    * is a function of file size, not scale factor. The driver's small-SF
    * testdata is MB-sized single files — the production defaults (128 MB
    * budget, 4 MB open cost) pack every one into 1-2 scan partitions and
    * serialize the map side on 32 cores, so small layouts get 4 MB/512 KB
    * (one task per file). sf100's files are 100 MB-1 GB — production-shaped
    * — and there the 4 MB setting over-splits into thousands of tiny tasks
    * (measured at sf100: tpch_q6 2.23→1.23 s, q1 5.68→4.32 s moving to
    * 128 MB). Threshold: any table part-file ≥64 MB → production defaults.
    */
  def scanSplitConf(dataDir: String): (Long, Long) = {
    val root = new java.io.File(dataDir)
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.endsWith(".parquet"))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .filter(_.getName.endsWith(".parquet"))
    val maxBytes = if (parts.isEmpty) 0L else parts.map(_.length).max
    if (maxBytes >= 64L * 1024 * 1024) (128L * 1024 * 1024, 4L * 1024 * 1024)
    else (4L * 1024 * 1024, 512L * 1024)
  }

  def create(
      master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
      appName: String = "graft",
      dataDir: Option[String] = None): SparkSession = {
    val (splitBytes, openCost) = dataDir.map(scanSplitConf)
      .getOrElse((4L * 1024 * 1024, 512L * 1024))
    val base = SparkSession.builder()
      .master(master)
      .appName(appName)
      // Neumann-style decorrelation beyond Catalyst's subquery support
      // (SURVEY §2.1 relalg unnesting; reference Transforms/Unnesting.cpp)
      .withExtensions { e =>
        e.injectResolutionRule(_ => plans.DecorrelateComplexAggs)
        // sample-driven join reorder (reference QueryGraph.cpp:264-294);
        // opt-in via spark.graft.sampleReorder.enabled — see its scaladoc
        e.injectOptimizerRule(s => plans.SampleJoinReorder(s))
      }
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Scan-split sizing — derived from the file layout, see scanSplitConf
      .config("spark.sql.files.maxPartitionBytes", splitBytes.toString)
      .config("spark.sql.files.openCostInBytes", openCost.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Bucketed scans report their on-disk sort order so co-located
      // SMJs skip the Sort entirely (ScaleUp writes exactly one file per
      // bucket, the shape Spark requires before it trusts the ordering;
      // with >1 file per bucket Spark ignores the flag rather than
      // mis-sorting). Measured at sf10: tpch_q5 3.11→2.29s, q21 1.69→1.40s.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // Long-lived sessions (bench loops, ETL services) accumulate shuffle
      // files until the DRIVER garbage-collects the ShuffleDependency that
      // owns them — with a large heap that can be never. The sf100 bench
      // filled a 54 GB disk this way (17 queries × 6 runs of retained spill).
      // ContextCleaner's periodic GC defaults to 30 min; 2 min bounds the
      // retained-shuffle window at a negligible GC cost.
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc tuning overrides for bench A/B runs: "k=v;k=v"
    val withExtra = sys.env.get("GRAFT_SPARK_EXTRA").iterator
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
      .foldLeft(base) { (b, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) => b.config(k, v)
          case _ => throw new IllegalArgumentException(
            s"GRAFT_SPARK_EXTRA entry '$kv' is not key=value (entries are ';'-separated)")
        }
      }
    val built = withExtra.getOrCreate()
    built.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(built)
    built
  }
}
