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
  def create(
      master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
      appName: String = "graft"): SparkSession = {
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
      // Scan-split sizing for the bench SFs: tables here are MBs, not the
      // 128MB+ files of a production lake, and the defaults (128MB budget,
      // 4MB open cost) pack every small file into 1-2 scan partitions —
      // serializing the map side on 32 cores. 4MB/512KB keeps one task per
      // file at bench scale; at 100 TB these two lines are the knobs a
      // deployment sizes to its file layout (default-sized files → defaults).
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
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
