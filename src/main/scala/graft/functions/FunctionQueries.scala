package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Scalar-function surface (SURVEY §2.2/§2.3) — the reference's runtime
  * function registry (src/compiler/Dialect/DB/RuntimeFunctions/RuntimeFunctions.cpp:271-344)
  * re-expressed as Spark builtins, plus the two custom Catalyst expressions
  * (erf, rolling_hash) Spark lacks. All stay inside whole-stage codegen.
  */
object FunctionQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // String registry: Substring/ToUpper/ToLower/StringLength/Replace/
    // Concatenate/Contains/StringFind/Ord (RuntimeFunctions.cpp:276-288).
    "fn_string" -> ((s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 8).as("sub"),
          length(col("p_name")).cast("long").as("len"),
          regexp_replace(col("p_type"), " ", "_").as("repl"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("cat"),
          ascii(col("p_name")).cast("int").as("first_cp"),
          instr(col("p_name"), "a").cast("long").as("pos_a"),
          col("p_name").contains("o").as("has_o"),
          (instr(col("p_name"), "an") - 1).cast("long").as("py_find_an"))
        .orderBy("p_partkey")),

    // Like / ConstLike (RuntimeFunctions.cpp:291-292).
    "fn_like" -> ((s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          col("p_type").like("PRO%").as("is_promo"),
          col("p_type").like("%ED%").as("has_ed"),
          (!col("p_type").like("%O%")).as("no_o"),
          col("p_brand").startsWith("Brand#1").as("b1"),
          col("p_type").endsWith("M").as("ends_m"))
        .orderBy("p_partkey")),

    // RegexpReplace (RuntimeFunctions.cpp:290) + extract + match.
    "fn_regex" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 500)
        .select(
          col("c_custkey"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          col("c_name").rlike("[02468]$").as("even_end"))
        .orderBy("c_custkey")),

    // StringSplit (RuntimeFunctions.cpp:279) → db.list<string> → ArrayType.
    "fn_split" -> ((s, d) =>
      t(s, d, "documents")
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          element_at(split(col("text"), " "), 1).as("first_tok"),
          element_at(split(col("text"), " "), -1).as("last_tok"))
        .orderBy("doc_id")),

    // Date registry: Extract*/DateTrunc/DateDiff/DateAdd/DateSubtract
    // (RuntimeFunctions.cpp:316-330).
    "fn_date" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_custkey") <= 50)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("int").as("y"),
          month(col("o_orderdate")).cast("int").as("m"),
          dayofmonth(col("o_orderdate")).cast("int").as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_99"),
          date_add(col("o_orderdate").cast("date"), 90).as("plus90"),
          last_day(col("o_orderdate").cast("date")).as("eom"))
        .orderBy("o_orderkey")),

    // Math registry: Abs/Sqrt/Log/Exp/Sin/Cos/ASin (RuntimeFunctions.cpp:332-340).
    // Transcendentals rounded to 6 decimals — libm vs JDK may differ by 1 ulp.
    "fn_math" -> ((s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).cast("long").as("abs_sz"),
          sqrt(col("p_size").cast("double")).as("sqrt_sz"),
          pow(col("p_size").cast("double"), 2).as("sq_sz"),
          (col("p_partkey") % 7).cast("long").as("mod7"),
          floor(col("p_retailprice")).cast("long").as("fl"),
          ceil(col("p_retailprice")).cast("long").as("ce"),
          round(log(col("p_retailprice")), 6).as("ln_p"),
          round(exp(col("p_size").cast("double") / 10.0), 6).as("exp_p"),
          round(sin(col("p_size").cast("double")), 6).as("sin_sz"),
          round(cos(col("p_size").cast("double")), 6).as("cos_sz"),
          round(asin(col("p_size").cast("double") / 50.0), 6).as("asin_sz"),
          signum(col("p_size") - 25).cast("int").as("sgn"),
          greatest(col("p_size"), lit(25)).cast("long").as("gr"),
          least(col("p_size"), lit(25)).cast("long").as("le"))
        .orderBy("p_partkey")),

    // Casts (db.cast, DBOps.td:547; string casts via runtime LowerToStd.cpp:300-372).
    "fn_cast" -> ((s, d) =>
      t(s, d, "part").filter(col("p_partkey") <= 100)
        .select(
          col("p_partkey"),
          lit("42").cast("long").as("s2i"),
          col("p_size").cast("string").as("i2s"),
          lit("3.5").cast("double").as("s2d"),
          col("p_size").cast("double").as("i2d"),
          lit("1998-03-15").cast("date").as("s2date"))
        .orderBy("p_partkey")),

    // CASE WHEN / COALESCE / NULLIF (sql_analyzer.cpp:2840; SURVEY §2.3).
    "fn_case" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") <= 300)
        .select(
          col("l_orderkey"), big(col("l_linenumber")).as("ln"),
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 40, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_neg1"))
        .orderBy("l_orderkey", "ln")),

    // BETWEEN / IN value list (db.between DBOps.td:501, db.oneof :511).
    "fn_between_in" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderdate").between(
          to_timestamp(lit("1997-01-01 00:00:00")), to_timestamp(lit("1997-03-31 00:00:00"))))
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy("o_orderkey")),

    // JSON field extraction over the events.props payload column.
    "fn_json" -> ((s, d) =>
      t(s, d, "events").filter(col("event_id") <= 2000)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // Hash (RuntimeFunctions.cpp:341) — content hashes with portable semantics.
    "fn_hash" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          md5(col("c_name").cast("binary")).as("h_md5"),
          sha2(col("c_name").cast("binary"), 256).as("h_sha256"))
        .orderBy("c_custkey")),

    // erf — custom Catalyst expression (no DuckDB equivalent → rows-only).
    "fn_erf" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          GraftFunctions.erf(col("c_acctbal") / 10000.0).as("erf_bal"))
        .orderBy("c_custkey")),

    // RandomInRange (RuntimeFunctions.cpp:310) — nondeterministic → rows-only;
    // range + distribution contract locked by FunctionsSpec.
    "fn_random_range" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          GraftFunctions.random_in_range(lit(10), lit(20)).as("r"))
        .orderBy("c_custkey")),

    // CREATE FUNCTION ... LANGUAGE sql/c → Catalyst expression macro
    // (graft.sqlsurface.UdfSurface; reference udf.test surface).
    "fn_udf_macro" -> ((s, d) => {
      graft.sqlsurface.UdfSurface.execute(s,
        "CREATE OR REPLACE FUNCTION graft_add_one(x int) RETURNS int LANGUAGE c AS $$ return x+1; $$")
      graft.sqlsurface.UdfSurface.execute(s,
        "CREATE OR REPLACE FUNCTION graft_scaled(x double, f double) RETURNS double LANGUAGE sql AS $$ x * f + 1.0 $$")
      t(s, d, "part").filter(col("p_partkey") <= 300)
        .select(col("p_partkey"),
          expr("graft_add_one(p_size)").cast("int").as("size1"),
          expr("graft_scaled(p_retailprice, 2.0)").as("scaled"))
        .orderBy("p_partkey")
    }),

    // interpreted Python UDF (reference py_interp bridge; PyInterp.scala) —
    // the oracle replays the same arithmetic/string semantics in plain SQL
    "fn_py_udf" -> ((s, d) => {
      graft.sqlsurface.UdfSurface.execute(s,
        "CREATE OR REPLACE FUNCTION graft_py_tax(x int) RETURNS int AS $$\n" +
          "def graft_py_tax(x):\n    t = 0\n    for i in range(1, 4):\n" +
          "        t = t + x * i\n    return t\n$$ LANGUAGE python")
      graft.sqlsurface.UdfSurface.execute(s,
        "CREATE OR REPLACE FUNCTION graft_py_shout(s varchar) RETURNS varchar AS $$\n" +
          "def graft_py_shout(s):\n    return s.upper()\n$$ LANGUAGE python")
      t(s, d, "part").filter(col("p_partkey") <= 300)
        .select(col("p_partkey"),
          expr("graft_py_tax(p_size)").as("tax6"),
          expr("graft_py_shout(p_brand)").as("brand_up"))
        .orderBy("p_partkey")
    }),

    // rolling_hash — custom fingerprint expression, hash-checked against a
    // DuckDB replay of the same 61-bit polynomial (util.OracleSql.rollingFp).
    "fn_rolling_hash" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), GraftFunctions.rolling_hash(col("text")).as("fp"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
                substring(p_name, 1, 8) AS sub, CAST(length(p_name) AS BIGINT) AS len,
                replace(p_type, ' ', '_') AS repl,
                p_brand || '/' || p_type AS cat,
                CAST(ascii(p_name) AS INTEGER) AS first_cp,
                CAST(instr(p_name, 'a') AS BIGINT) AS pos_a,
                contains(p_name, 'o') AS has_o,
                CAST(instr(p_name, 'an') - 1 AS BIGINT) AS py_find_an
         FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",
    "fn_like" ->
      """SELECT p_partkey, p_type LIKE 'PRO%' AS is_promo, p_type LIKE '%ED%' AS has_ed,
                p_type NOT LIKE '%O%' AS no_o,
                p_brand LIKE 'Brand#1%' AS b1, p_type LIKE '%M' AS ends_m
         FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",
    "fn_regex" ->
      """SELECT c_custkey, regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
                regexp_extract(c_name, '([0-9]+)', 1) AS digits,
                regexp_matches(c_name, '[02468]$') AS even_end
         FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""",
    "fn_split" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                string_split(text, ' ')[1] AS first_tok,
                string_split(text, ' ')[-1] AS last_tok
         FROM documents ORDER BY doc_id""",
    "fn_date" ->
      """SELECT o_orderkey, CAST(extract(year FROM o_orderdate) AS INTEGER) AS y,
                CAST(extract(month FROM o_orderdate) AS INTEGER) AS m,
                CAST(extract(day FROM o_orderdate) AS INTEGER) AS dom,
                CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_99,
                CAST(o_orderdate AS DATE) + 90 AS plus90,
                last_day(CAST(o_orderdate AS DATE)) AS eom
         FROM orders WHERE o_custkey <= 50 ORDER BY o_orderkey""",
    "fn_math" ->
      """SELECT p_partkey, CAST(abs(p_size - 25) AS BIGINT) AS abs_sz,
                sqrt(CAST(p_size AS DOUBLE)) AS sqrt_sz,
                pow(CAST(p_size AS DOUBLE), 2) AS sq_sz,
                CAST(p_partkey % 7 AS BIGINT) AS mod7,
                CAST(floor(p_retailprice) AS BIGINT) AS fl,
                CAST(ceil(p_retailprice) AS BIGINT) AS ce,
                round(ln(p_retailprice), 6) AS ln_p,
                round(exp(CAST(p_size AS DOUBLE) / 10.0), 6) AS exp_p,
                round(sin(CAST(p_size AS DOUBLE)), 6) AS sin_sz,
                round(cos(CAST(p_size AS DOUBLE)), 6) AS cos_sz,
                round(asin(CAST(p_size AS DOUBLE) / 50.0), 6) AS asin_sz,
                CAST(sign(p_size - 25) AS INTEGER) AS sgn,
                CAST(greatest(p_size, 25) AS BIGINT) AS gr,
                CAST(least(p_size, 25) AS BIGINT) AS le
         FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",
    "fn_cast" ->
      """SELECT p_partkey, CAST('42' AS BIGINT) AS s2i, CAST(p_size AS VARCHAR) AS i2s,
                CAST('3.5' AS DOUBLE) AS s2d, CAST(p_size AS DOUBLE) AS i2d,
                CAST('1998-03-15' AS DATE) AS s2date
         FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""",
    "fn_case" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
                CASE WHEN l_quantity < 10 THEN 'low'
                     WHEN l_quantity < 40 THEN 'mid' ELSE 'high' END AS band,
                coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg1
         FROM lineitem WHERE l_orderkey <= 300 ORDER BY l_orderkey, ln""",
    "fn_between_in" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-03-31 00:00:00'
           AND o_orderpriority IN ('1-URGENT', '2-HIGH')
         ORDER BY o_orderkey""",
    "fn_json" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
         FROM events WHERE event_id <= 2000 ORDER BY event_id""",
    "fn_udf_macro" ->
      """SELECT p_partkey, CAST(p_size + 1 AS INTEGER) AS size1,
                p_retailprice * 2.0 + 1.0 AS scaled
         FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""",
    "fn_py_udf" ->
      """SELECT p_partkey, CAST(p_size * 6 AS INTEGER) AS tax6,
                upper(p_brand) AS brand_up
         FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""",
    "fn_hash" ->
      """SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256
         FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""",
    "fn_rolling_hash" ->
      s"""SELECT doc_id, fp FROM (${graft.util.OracleSql.rollingFp("text")}) t
          ORDER BY doc_id"""
  )
}
