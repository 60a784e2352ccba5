package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Source/sink surface beyond the parquet catalog: CSV and JSON round-trips
  * and hive-partitioned parquet sinks, each hash-checked by reading the
  * engine-written files back in DuckDB.
  *
  * Reference surface: the engine's COPY/load path is an Arrow CSV reader into
  * catalog tables (reference src/runtime/RelationHelper.cpp:93-141); JSON and
  * partitioned layouts have no reference analog but are table stakes for a
  * Spark-native lake engine — a 100 TB corpus arrives as directory trees of
  * compressed JSONL/CSV and ships as partitioned parquet, so the contract here
  * checks the full write→read loop (quoting, nested types, partition
  * reconstruction), not just that an API exists.
  *
  * Scale notes: the coalesce(1) on the CSV/JSON sinks is oracle plumbing only
  * (one deterministic file for DuckDB to re-read); real deployments keep the
  * default one-file-per-task layout. The partitioned sink is the layout that
  * matters at scale — the read-back filter prunes to one partition directory
  * without touching the rest (PlanSpec asserts the pruned scan).
  */
object Sources {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  /** Engine-written files land here; the oracle SQL re-reads the same paths
    * (both sides render from this val in the same JVM, so they always agree).
    * The driver's gate runs Verify (Spark writes) strictly before the DuckDB
    * compare, so the contract is self-materializing. The property override
    * exists so the test JVM (which smoke-runs every query at sf0.001) cannot
    * clobber a concurrently-running Verify's files at another SF. */
  private[graft] val Root =
    sys.props.getOrElse("graft.sources.root", "/tmp/graft_sources")

  val queries: Map[String, Q] = Map(
    // CSV round-trip with hostile content: embedded commas, double quotes,
    // and multibyte text. Spark's writer defaults to backslash-escaping;
    // RFC 4180 quote-doubling (escape = quote char) is what every other
    // reader — DuckDB included — expects, so the contract pins that option.
    "src_csv_roundtrip" -> ((s, d) => {
      val out = s"$Root/nation_csv"
      t(s, d, "nation")
        .select(big(col("n_nationkey")).as("k"),
          concat(col("n_name"), lit(", \"q\" ünï")).as("name"),
          big(col("n_regionkey")).as("rk"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(out)
      s.read
        .option("header", "true").option("escape", "\"")
        .schema("k long, name string, rk long")
        .csv(out)
        .orderBy("k")
    }),

    // JSONL round-trip of NESTED types (struct + array): the shape multimodal
    // metadata and crawl records arrive in. Doubles survive exactly — the
    // writer emits shortest-round-trip literals and both parsers are exact.
    "src_json_nested" -> ((s, d) => {
      val out = s"$Root/orders_json"
      t(s, d, "orders")
        .filter(col("o_orderkey") <= 1000)
        .select(big(col("o_orderkey")).as("k"),
          struct(col("o_orderstatus").as("st"), col("o_totalprice").as("tp")).as("meta"),
          array(big(col("o_custkey")), length(col("o_orderpriority")).cast("long")).as("arr"))
        .coalesce(1)
        .write.mode("overwrite")
        .json(out)
      s.read
        .schema("k long, meta struct<st:string,tp:double>, arr array<long>")
        .json(out)
        .select(col("k"), col("meta.st").as("st"), col("meta.tp").as("tp"),
          element_at(col("arr"), 1).as("a1"), element_at(col("arr"), 2).as("a2"))
        .orderBy("k")
    }),

    // Hive-partitioned parquet sink + pruned read-back: the write produces
    // status=<v>/ directories, the read filter prunes to ONE of them at
    // planning time (no data from other partitions is scanned — the property
    // that makes a date-partitioned 100 TB lake queryable).
    "src_parquet_partitioned" -> ((s, d) => {
      val out = s"$Root/orders_part"
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus").as("status"))
        .write.mode("overwrite").partitionBy("status").parquet(out)
      s.read.parquet(out)
        .filter(col("status") === "F")
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          big(max(col("o_orderkey"))).as("max_key"))
        .orderBy("status")
    })
  )

  val oracle: Map[String, String] = Map(
    "src_csv_roundtrip" ->
      s"""SELECT k, name, rk
          FROM read_csv('$Root/nation_csv/*.csv', header = true,
                        columns = {'k': 'BIGINT', 'name': 'VARCHAR', 'rk': 'BIGINT'})
          ORDER BY k""",
    "src_json_nested" ->
      s"""SELECT k, meta.st AS st, meta.tp AS tp, arr[1] AS a1, arr[2] AS a2
          FROM read_json_auto('$Root/orders_json/*.json')
          ORDER BY k""",
    "src_parquet_partitioned" ->
      s"""SELECT status, count(*) AS n,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                 CAST(max(o_orderkey) AS BIGINT) AS max_key
          FROM parquet_scan('$Root/orders_part/*/*.parquet', hive_partitioning = 1)
          WHERE status = 'F'
          GROUP BY status ORDER BY status"""
  )
}
