package graft.ssb

import graft.tpcds.TpcdsGen.{Dia, SparkDia, DuckDia}

/** Deterministic, closed-form Star Schema Benchmark dataset, rendered
  * identically in Spark SQL and DuckDB SQL (same technique as
  * [[graft.tpcds.TpcdsGen]] / [[graft.job.JobGen]]).
  *
  * The reference ships BOTH SSB variants (resources/sql/ssb — string
  * dimensions — and resources/sql/ssb_simplified — the Crystal GPU library's
  * integer-coded dimensions) and loads dbgen-generated .tbl files
  * (tools/generate/ssb.sh, a network fetch unavailable here). Both variants
  * are generated from the SAME per-row draws, with the Crystal integer
  * coding derived from the TPC-H orderings the real generator uses:
  * nation code 23 = UNITED KINGDOM → city 231 = 'UNITED KI1',
  * mfgr/category/brand1 codes m, m*5+c, (m*5+c)*40+b → 'MFGR#<m+1>',
  * 'MFGR#<m+1><c+1>', 'MFGR#<m+1><c+1><b+1>' (so coded 260 is the named
  * 'MFGR#2221', exactly the pairs the two query sets probe).
  */
object SsbGen {

  val NDate = 2556L // 1992-01-01 .. 1998-12-31
  val NCust = 30000L
  val NSupp = 2000L
  val NPart = 20000L
  val NLo = 600000L

  /** TPC-H nation order (nationkey 0..24) — the coding the Crystal variant's
    * literals assume (231='UNITED KI1', 24='UNITED STATES'). */
  private val nations = Seq(
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA",
    "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES")
  private val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  /** regionkey per nation, TPC-H region assignment. */
  private val regionOfNation = Seq(0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4,
    0, 0, 0, 1, 2, 3, 4, 2, 3, 3, 1)

  private val monAbbr = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
    "Aug", "Sep", "Oct", "Nov", "Dec")
  private val monFull = Seq("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")
  private val dowNames = Seq("Sunday", "Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday")
  private val seasons = Seq("Winter", "Spring", "Summer", "Fall", "Christmas")
  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECI", "5-LOW")
  private val shipmodes = Seq("AIR", "FOB", "MAIL", "RAIL", "REG AIR",
    "SHIP", "TRUCK")
  private val colors = Seq("almond", "azure", "blue", "chocolate", "coral",
    "khaki", "lime", "navy", "plum", "salmon", "tan")
  private val types = Seq("STANDARD POLISHED TIN", "SMALL PLATED COPPER",
    "MEDIUM BRUSHED STEEL", "ECONOMY ANODIZED BRASS", "PROMO BURNISHED NICKEL")
  private val containers = Seq("SM CASE", "LG BOX", "MED BAG", "JUMBO JAR",
    "WRAP PACK")

  private final case class G(d: Dia, tab: String) {
    def u(key: String): String = {
      val salt = (((tab + "." + key).hashCode.toLong & 0x7fffffffL) *
        2654435761L) % 4294967296L
      val a = d.xor("((id * 2654435761) % 4294967296)", salt.toString)
      val b = s"(($a) * 48271 % 2147483647)"
      val c = d.xor(s"($b)", d.shr(s"($b)", 15))
      s"((($c) * 69621) % 2147483647)"
    }
    def ui(key: String, n: Long, off: Long = 0): String =
      s"((${u(key)} % $n) + $off)"
    def pick(key: String, vals: Seq[String]): String =
      d.elem(vals, s"(${u(key)} % ${vals.length})")
  }

  private def render(cols: Seq[(String, String)], src: String): String =
    cols.map { case (n, e) => s"$e AS $n" }.mkString("SELECT ", ", ", s" FROM $src")

  private def idiv(a: String, b: String): String =
    s"cast(floor(($a) / ($b)) as bigint)"

  /** `'1992-01-01' + id days` in the dialect. TpcdsGen's date epoch is
    * 1998-01-01; SSB needs 1992 — shift by the 2192-day difference. */
  private def dte(d: Dia): String = d.dateAdd("(id - 2192)")

  private def datekeyOf(d: Dia, dateExpr: String): String =
    s"(year($dateExpr) * 10000 + month($dateExpr) * 100 + ${d.dom(dateExpr)})"

  // -------------------------------------------------------------- date dim

  private def dateDim(d: Dia): String = {
    val dt = dte(d)
    val cols = Seq(
      "d_datekey" -> datekeyOf(d, dt),
      "d_date" -> (s"(${d.elem(monFull, s"(month($dt) - 1)")} || ' ' || " +
        s"${d.str(d.dom(dt))} || ', ' || ${d.str(s"year($dt)")})"),
      "d_dayofweek" -> d.elem(dowNames, d.dow(dt)),
      "d_month" -> d.elem(monFull, s"(month($dt) - 1)"),
      "d_year" -> s"year($dt)",
      "d_yearmonthnum" -> s"(year($dt) * 100 + month($dt))",
      "d_yearmonth" -> s"(${d.elem(monAbbr, s"(month($dt) - 1)")} || ${d.str(s"year($dt)")})",
      "d_daynuminweek" -> s"(${d.dow(dt)} + 1)",
      "d_daynuminmonth" -> d.dom(dt),
      "d_daynuminyear" -> s"dayofyear($dt)",
      "d_monthnuminyear" -> s"month($dt)",
      "d_weeknuminyear" -> s"(${idiv(s"dayofyear($dt) - 1", "7")} + 1)",
      "d_sellingseason" -> d.elem(seasons, s"((month($dt) - 1) % 5)"),
      "d_lastdayinweekfl" -> s"CASE WHEN ${d.dow(dt)} = 6 THEN 1 ELSE 0 END",
      "d_lastdayinmonthfl" -> s"CASE WHEN ${d.dom(s"($dt + 1)")} = 1 THEN 1 ELSE 0 END",
      "d_holidayfl" -> s"CASE WHEN month($dt) = 12 AND ${d.dom(dt)} = 25 THEN 1 ELSE 0 END",
      "d_weekdayfl" -> s"CASE WHEN ${d.dow(dt)} IN (0, 6) THEN 0 ELSE 1 END")
    render(cols, d.seq(NDate))
  }

  // ------------------------------------------------------- dimension tables

  /** Nation draw with a 1-in-5 boost to nation 23 (UNITED KINGDOM): the
    * q34 pair-of-UK-cities × one-month predicate selects ~(2/250)² × (31/2556)
    * of lineorder under a uniform draw — expectation < 1 row at this scale,
    * so the query was (correctly but uselessly) empty. The boost raises
    * p(nation=23) to 0.232 per side, making q33/q34's city pairs non-empty
    * at the gate SF while every other nation keeps a 3.2% uniform share. */
  private def natDraw(g: G): String =
    s"(CASE WHEN ${g.u("natboost")} % 5 = 0 THEN 23 ELSE ${g.u("nat")} % 25 END)"

  /** coded=false → string city/nation/region (ssb); true → Crystal ints. */
  private def customer(d: Dia, coded: Boolean): String = {
    val g = G(d, "customer")
    val n = natDraw(g)
    val cdig = s"(${g.u("city")} % 10)"
    val natName = d.elem(nations, n)
    val cols = Seq(
      "c_custkey" -> "(id + 1)",
      "c_name" -> s"('Customer#' || ${d.str("(id + 1)")})",
      "c_address" -> s"('addr ' || ${d.str(g.u("ad"))})",
      "c_city" -> (if (coded) s"(($n) * 10 + $cdig)"
        else s"(rpad(substring($natName, 1, 9), 9, ' ') || ${d.str(cdig)})"),
      "c_nation" -> (if (coded) n else natName),
      "c_region" -> (if (coded) d.elem(regionOfNation.map(_.toString), n)
        else d.elem(regionOfNation.map(regions), n)),
      "c_phone" -> s"('33-' || ${d.str(g.ui("ph", 10000000L, 1000000L))})",
      "c_mktsegment" -> g.pick("seg", Seq("AUTOMOBILE", "BUILDING",
        "FURNITURE", "HOUSEHOLD", "MACHINERY")))
    render(if (coded) cols.map { case (k, v) =>
      if (k == "c_region") (k, s"cast($v as int)") else (k, v)
    } else cols, d.seq(NCust))
  }

  private def supplier(d: Dia, coded: Boolean): String = {
    val g = G(d, "supplier")
    val n = natDraw(g)
    val cdig = s"(${g.u("city")} % 10)"
    val natName = d.elem(nations, n)
    val cols = Seq(
      "s_suppkey" -> "(id + 1)",
      "s_name" -> s"('Supplier#' || ${d.str("(id + 1)")})",
      "s_address" -> s"('addr ' || ${d.str(g.u("ad"))})",
      "s_city" -> (if (coded) s"(($n) * 10 + $cdig)"
        else s"(rpad(substring($natName, 1, 9), 9, ' ') || ${d.str(cdig)})"),
      "s_nation" -> (if (coded) n else natName),
      "s_region" -> (if (coded) d.elem(regionOfNation.map(_.toString), n)
        else d.elem(regionOfNation.map(regions), n)),
      "s_phone" -> s"('33-' || ${d.str(g.ui("ph", 10000000L, 1000000L))})")
    render(if (coded) cols.map { case (k, v) =>
      if (k == "s_region") (k, s"cast($v as int)") else (k, v)
    } else cols, d.seq(NSupp))
  }

  private def part(d: Dia, coded: Boolean): String = {
    val g = G(d, "part")
    val m = s"(${g.u("mfgr")} % 5)"
    val c = s"(${g.u("cat")} % 5)"
    val b = s"(${g.u("brand")} % 40)"
    val cols = Seq(
      "p_partkey" -> "(id + 1)",
      "p_name" -> s"(${g.pick("n1", colors)} || ' ' || ${g.pick("n2", colors)})",
      "p_mfgr" -> (if (coded) m else s"('MFGR#' || ${d.str(s"($m + 1)")})"),
      "p_category" -> (if (coded) s"(($m) * 5 + $c)"
        else s"('MFGR#' || ${d.str(s"($m + 1)")} || ${d.str(s"($c + 1)")})"),
      "p_brand1" -> (if (coded) s"((($m) * 5 + $c) * 40 + $b)"
        else s"('MFGR#' || ${d.str(s"($m + 1)")} || ${d.str(s"($c + 1)")} || ${d.str(s"($b + 1)")})"),
      "p_color" -> g.pick("col", colors),
      "p_type" -> g.pick("typ", types),
      "p_size" -> g.ui("sz", 50, 1),
      "p_container" -> g.pick("cont", containers))
    render(cols, d.seq(NPart))
  }

  // ------------------------------------------------------------- lineorder

  private def lineorder(d: Dia): String = {
    val g = G(d, "lineorder")
    val odayIdx = s"(${g.u("od")} % $NDate)"
    val odate = d.dateAdd(s"($odayIdx - 2192)")
    val cdate = d.dateAdd(s"($odayIdx - 2192 + 30 + (${g.u("cd")} % 60))")
    val disc = s"(${g.u("disc")} % 11)"
    val extCents = g.ui("ext", 5400000L, 90000L)
    val cols = Seq(
      "lo_orderkey" -> s"(${idiv("id", "4")} + 1)",
      "lo_linenumber" -> "((id % 4) + 1)",
      "lo_custkey" -> g.ui("ck", NCust, 1),
      "lo_partkey" -> g.ui("pk", NPart, 1),
      "lo_suppkey" -> g.ui("sk", NSupp, 1),
      "lo_orderdate" -> datekeyOf(d, odate),
      "lo_orderpriority" -> g.pick("pri", priorities),
      "lo_shippriority" -> "'0'",
      "lo_quantity" -> g.ui("qty", 50, 1),
      "lo_extendedprice" -> s"cast(($extCents) * 0.01 as decimal(18,2))",
      "lo_ordtotalprice" -> s"cast((${g.ui("tot", 40000000L, 2000000L)}) * 0.01 as decimal(18,2))",
      "lo_discount" -> disc,
      // revenue = extendedprice * (100-discount)% — exact in integer cents
      "lo_revenue" -> s"cast((${idiv(s"($extCents) * (100 - $disc)", "100")}) * 0.01 as decimal(18,2))",
      "lo_supplycost" -> s"cast((${idiv(s"($extCents) * 6", "10")}) * 0.01 as decimal(18,2))",
      "lo_tax" -> s"(${g.u("tax")} % 9)",
      "lo_commitdate" -> datekeyOf(d, cdate),
      "lo_shipmode" -> g.pick("shp", shipmodes))
    render(cols, d.seq(NLo))
  }

  /** Named-dimension variant (resources/sql/ssb), prefix ssb_. */
  val tables: Seq[(String, Dia => String)] = Seq(
    "date" -> (dateDim _),
    "customer" -> (customer(_, coded = false)),
    "supplier" -> (supplier(_, coded = false)),
    "part" -> (part(_, coded = false)),
    "lineorder" -> (lineorder _))

  /** Crystal integer-coded variant (resources/sql/ssb_simplified), prefix ssb2_. */
  val tablesCoded: Seq[(String, Dia => String)] = Seq(
    "date" -> (dateDim _),
    "customer" -> (customer(_, coded = true)),
    "supplier" -> (supplier(_, coded = true)),
    "part" -> (part(_, coded = true)),
    "lineorder" -> (lineorder _))
}
