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
    * is a function of data volume vs core count, not a fixed constant.
    * Continuous rule: size splits so a scan of the LARGEST table yields
    * ~3 tasks per core (inside the classic 2-4×-cores target that keeps all
    * cores busy without per-task overhead dominating), clamped to
    * [4 MB, 128 MB]. The previous binary ≥64 MB-file threshold had a cliff:
    * sf10's 32 × 32 MB lineitem files packed into 128 MB bins made only ~9
    * scan tasks on 32 cores — the same wall time as sf100 on 10× less data —
    * while sf100's 242 MB files were fine at 128 MB. The continuous rule
    * gives sf10 ~12 MB splits (≈96 tasks), sf100 ~76 MB (≈128 tasks), and
    * small SFs the 4 MB floor (one task per MB-sized file), with no cliff in
    * between. Open cost scales with the split (split/8, clamped to
    * [512 KB, 4 MB]) so small-file packing stays proportional.
    */
  def scanSplitConf(dataDir: String): (Long, Long) = {
    val root = new java.io.File(dataDir)
    val tableBytes = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.endsWith(".parquet"))
      .map { d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      }
    val largest = if (tableBytes.isEmpty) 0L else tableBytes.max
    val cores = Runtime.getRuntime.availableProcessors.toLong
    val split = math.max(4L * 1024 * 1024,
      math.min(128L * 1024 * 1024, largest / (cores * 3)))
    val openCost = math.max(512L * 1024, math.min(4L * 1024 * 1024, split / 8))
    (split, openCost)
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
