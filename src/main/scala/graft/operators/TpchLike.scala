package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** TPC-H-shaped headline queries, adapted to the driver's synthetic star schema
  * (TESTDATA.md — no partsupp; lineitem/orders carry a column subset).
  * Reference query texts: resources/sql/tpch/{1,3,5,6,10}.sql; golden results
  * methodology test/sqlite-datasets/tpchSf1.test:2-28 (SURVEY §5, §6).
  *
  * Scale notes (100 TB thinking):
  * - q1: single scan → partial agg on 6 tiny groups → final agg. No shuffle of
  *   raw rows; the parquet scan prunes to the 7 referenced columns and the
  *   shipdate filter is pushed to the reader.
  * - q3/q5/q10: the fact table (lineitem) is never broadcast; dimension sides
  *   (region/nation, filtered customer) are small enough for Catalyst/AQE to
  *   broadcast, so lineitem is joined without a full shuffle where possible.
  * - Aggregates go through exact decimals (Det) — same bit-for-bit results on
  *   one node or a thousand.
  */
object TpchLike {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  /** Scan-path load for queries that never touch the bucket key (q1/q6):
    * the plain splittable layout beats the one-task-per-bucket-file
    * bucketed scan when the clustering buys nothing (Tables.loadScan —
    * measured at sf100: q1 7.6 → 5.8 s). */
  private def tScan(s: SparkSession, d: String, n: String): DataFrame = Tables.loadScan(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  /** Q1 pricing summary — the flagship (SURVEY §7.2 M1). */
  def q1(s: SparkSession, d: String): DataFrame =
    tScan(s, d, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        msum(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        msum(col("l_extendedprice"), lit(1) - col("l_discount"), lit(1) + col("l_tax"))
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val queries: Map[String, Q] = Map(
    "tpch_q1" -> (q1 _),

    // Q3 shipping-priority: 3-way join, filtered both sides, top-10 by revenue.
    // Bucketing-aware shape: the filtered customer segment (selectivity ~1/5,
    // key column only) broadcasts INTO orders, so the orders scan keeps its
    // on-disk orderkey clustering and the orders⋈lineitem join runs with
    // zero exchanges on the bucketed layout; joining customer⋈orders as a
    // shuffle join first would re-partition orders on custkey and forfeit it.
    "tpch_q3" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
      // hashIfSmall on the pruned orders side: the planner's pick for the
      // orderkey join at small SFs was a sort-merge that externally sorts
      // BOTH fact sides; per-partition hash build of the ~1/5-selectivity
      // cust⋈orders side skips the sorts. Identity at scale, where the
      // bucketed zero-exchange merge is the right shape.
      Tables.hashIfSmall(
          ord.join(Tables.dim(cust), col("c_custkey") === col("o_custkey")))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(msum(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("o_date"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q5 local-supplier revenue: 6-way join incl. the c_nationkey = s_nationkey
    // locality condition, grouped by nation.
    // Bucketing-aware shape (same reasoning as q3): region⋈nation⋈customer
    // reduces to the ASIA customer keys (2 narrow columns, ~1/5 of customer)
    // and broadcasts into orders; the orders⋈lineitem join then runs on the
    // bucketed layout with zero exchanges.
    //
    // Supplier-side pre-reduction: the locality condition c_nationkey =
    // s_nationkey plus customer-in-ASIA already forces the SUPPLIER into
    // ASIA, so the ASIA⋈nation⋈supplier broadcast filters lineitem to ASIA
    // suppliers (~1/5 of rows) BEFORE the fact-side merge join, not after —
    // a BroadcastHashJoin between the bucketed scan and the SMJ preserves
    // the scan's partitioning AND sort order, so the merge still runs
    // zero-exchange but streams 5× fewer lineitem rows. n_name rides the
    // supplier side (it equals the customer nation by the join condition).
    "tpch_q5" -> ((s, d) => {
      // Inner dim-side joins go through Tables.dim (broadcast at scale,
      // shuffle-hash on small data): at small SFs the old explicit
      // broadcasts nested THREE deep (asiaCust's build job waited on
      // asiaNation's, which waited on region's — plans/r11/
      // tpch_q5_before.txt operators 12→18→21), serializing ~3 driver
      // broadcast-build jobs per run on the clone tier. None of these
      // joins probe a fact side, so the small-SF shuffle-hash flip only
      // exchanges KB-scale dim rows inside one job. The FACT-probing
      // broadcasts below (asiaSupp into lineitem, asiaCust into orders)
      // stay explicit broadcast at every scale — the r11 A/B showed
      // flipping those re-exchanges the fact side for a net loss
      // (q5 0.38 -> 0.60 s median).
      val asiaNation = t(s, d, "region").filter(col("r_name") === "ASIA")
        .join(t(s, d, "nation"), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val asiaSupp = t(s, d, "supplier")
        .join(Tables.dim(asiaNation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val asiaCust = t(s, d, "customer")
        .join(Tables.dim(asiaNation.select(col("n_nationkey").as("cn_key"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"), col("c_nationkey"))
      val li = t(s, d, "lineitem")
        .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
      // hashIfSmall: at small SFs the orderkey merge would sort both fact
      // sides; a per-partition hash build of the date+ASIA-pruned orders
      // side skips that. Identity at scale - the bucketed zero-exchange
      // sort-merge stays.
      val j = Tables.hashIfSmall(t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey")))
        // the locality equality is written as an arithmetic residual, NOT
        // `s_nationkey === c_nationkey`: ExtractEquiJoinKeys would fold a
        // plain equality into the SMJ's join keys, re-shuffling BOTH fact
        // sides on the composite (orderkey, nationkey) and forfeiting the
        // bucketed single-key co-partitioning (measured: the composite-key
        // plan re-exchanges 600M rows and erases the supplier-filter win)
        .join(li, col("l_orderkey") === col("o_orderkey") &&
          (col("s_nationkey") - col("c_nationkey")) === 0)
      j.groupBy(col("n_name"))
        .agg(msum(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q6 forecasting revenue change: pure scan-filter-aggregate.
    "tpch_q6" -> ((s, d) =>
      tScan(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24)
        .agg(msum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))),

    // Q10 returned items: customer-level revenue loss from returns.
    // Fact-first + eager aggregation (same reasoning as q3/q5/agg_groupjoin):
    // joining customer⋈orders first re-partitions orders on custkey and
    // forfeits the bucketed orderkey layout. Instead the orders⋈lineitem
    // join runs zero-exchange on the buckets, revenue is aggregated down to
    // one row per custkey (map-side combine; c_custkey is unique so grouping
    // by o_custkey pre-join is exactly the post-join (c_custkey,c_name,
    // n_name) grouping), and only then do customer and nation attach — the
    // only remaining shuffle moves per-customer partials, not fact rows.
    "tpch_q10" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      // The date-filtered orders keys auto-broadcast into lineitem at small
      // SFs (~0.2 s driver build per run, HitProbe r11). Flipping to
      // shuffle-hash was TRIED and measured WORSE (0.31 -> 0.52 median):
      // the lineitem exchange outweighs the saved build. Broadcast stays.
      val rev = ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(msum(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      // rev is ~|active customers| narrow rows: exchange both thin sides and
      // hash-build on rev — NOT a broadcast (collecting a per-customer
      // aggregate to the driver is exactly the 100 TB anti-pattern, and the
      // measured local cost of broadcasting 1.5M customer rows was 4× the
      // whole query).
      t(s, d, "customer")
        .join(rev.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"))
        .join(Tables.dim(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })
  )

  val oracle: Map[String, String] = Map(
    "tpch_q1" ->
      // decimal→double via VARCHAR: DuckDB's direct decimal→double cast
      // double-rounds (int128→double, then ÷10^scale — observed 1-ulp off
      // on 2 of 6 groups at sf1 magnitudes ~3.8e10 with 6-decimal sums),
      // while the engine's Decimal.toDouble (BigDecimal) rounds the exact
      // value once. strtod on the exact decimal string is correctly
      // rounded, so the VARCHAR hop makes the oracle match the exact path.
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_charge,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(l_quantity) AS avg_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(l_extendedprice) AS avg_price,
                CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(l_discount) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "tpch_q3" ->
      """SELECT l_orderkey,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
                CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tpch_q5" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         FROM region
         JOIN nation ON n_regionkey = r_regionkey
         JOIN customer ON c_nationkey = n_nationkey
         JOIN orders ON o_custkey = c_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
                count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount >= 0.02 AND l_discount <= 0.04
           AND l_quantity < 24""",
    "tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_returnflag = 'R'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20"""
  )
}
