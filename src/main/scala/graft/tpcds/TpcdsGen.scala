package graft.tpcds

/** Deterministic, closed-form TPC-DS dataset, rendered identically as Spark
  * SQL and DuckDB SQL.
  *
  * The reference ships the 24-table TPC-DS schema
  * (reference resources/sql/tpcds/initialize.sql) and generates data with
  * dsdgen (reference tools/generate/tpcds.sh) — a network download that is
  * unavailable here. Instead, every table is defined as a pure closed-form
  * expression over a row index (`range(n)`), using only arithmetic with
  * identical semantics in Spark and DuckDB. Both engines therefore compute
  * bit-identical tables, which makes the driver's DuckDB hash-compare a real
  * oracle for the 99 TPC-DS queries (same technique as TpchFull's derived
  * partsupp, scaled to the full schema).
  *
  * Design constraints on every expression:
  *  - integer arithmetic only (`+ * %`), all operands non-negative, so `%`
  *    and overflow behavior agree across engines;
  *  - pseudo-randomness via a xor-scrambled multiplicative hash (the xor
  *    breaks linearity so per-column streams are decorrelated);
  *  - integer division as cast(floor(a/b) as bigint) — exact in double for
  *    the < 2^40 values used here;
  *  - money as integer cents * 0.01 cast to decimal — exact on both sides;
  *  - dates only via epoch + day-index (epoch 1998-01-01 = date_sk 0).
  *
  * Returns tables are derived row-wise from their sales tables through an
  * invertible index remap (j -> (j*97+11) mod N), so ticket/order/item
  * linkage, return_qty <= sold_qty and returned_date > sold_date hold
  * exactly, as the queries (e.g. 17, 25, 50, 85) require.
  *
  * Value domains (counties, states, categories, brands, buy potentials, …)
  * are seeded from the literals the 99 queries filter on, so predicates are
  * selective but non-empty at this scale.
  *
  * Planted correlations: a purely-uniform draw leaves the queries that look
  * for cross-channel or cross-attribute coincidences empty at the gate SF
  * (expectation < 1 row), so small deterministic slices are planted, each
  * derived from the same closed forms on both engines:
  *  - variable ticket sizes (1..24 items) so ticket-size windows (q34/q73)
  *    select rows;
  *  - "magic" item slices pinning manufact/category/color/price combos
  *    (q37/q41/q54/q64/q24);
  *  - a shared 24-zip pool for store and customer addresses (q8/q24);
  *  - NULL planting on ss_customer/ss_cdemo/ws_warehouse/cs_bill_hdemo
  *    (q44/q76);
  *  - "echo" rows: the first 3000 catalog/web rows mirror a scattered
  *    store-sales row's (item, customer, date, qty, price) — cross-channel
  *    coincidence queries (q25/q29/q58, TPCx-BB q21);
  *  - 50 "whale" customers with large equal store totals + hot (item,date)
  *    cells + July-1999 catalog orders (q23);
  *  - 100 "loyal" customers present in all three channels every year (q4,
  *    q11, q74);
  *  - a slice of returns re-dated into q83's three week windows;
  *  - web-sales/returns rows pinned to q85's demographic/price/profit
  *    branches, customers pinned to q91's demographic/gmt filters;
  *  - heavy-tailed inventory quantities so monthly cov >= 1.3 exists
  *    (TPCx-BB q23).
  */
object TpcdsGen {

  // ---------------------------------------------------------------- dialects

  sealed trait Dia {
    def name: String
    def seq(n: Long): String
    def nullStr: String
    def str(e: String): String
    def elem(vals: Seq[String], i: String): String
    def xor(a: String, b: String): String
    def dateAdd(days: String): String
    def days(dte: String): String
    def dow(dte: String): String
    def dayName(dte: String): String
    def dom(dte: String): String
    /** Arithmetic right shift of a non-negative bigint. */
    def shr(e: String, n: Int): String
  }

  object SparkDia extends Dia {
    val name = "spark"
    def seq(n: Long) = s"range(0, $n)"
    val nullStr = "cast(NULL as string)"
    def str(e: String) = s"cast($e as string)"
    def elem(vals: Seq[String], i: String) =
      s"element_at(array(${vals.map(q).mkString(",")}), cast($i as int) + 1)"
    def xor(a: String, b: String) = s"($a ^ $b)"
    def dateAdd(days: String) = s"date_add(date '1998-01-01', cast($days as int))"
    def days(dte: String) = s"datediff($dte, date '1998-01-01')"
    def dow(dte: String) = s"(dayofweek($dte) - 1)"
    def dayName(dte: String) = s"date_format($dte, 'EEEE')"
    def dom(dte: String) = s"day($dte)"
    def shr(e: String, n: Int) = s"shiftright(cast($e as bigint), $n)"
  }

  object DuckDia extends Dia {
    val name = "duckdb"
    def seq(n: Long) = s"range(0, $n) t(id)"
    val nullStr = "cast(NULL as varchar)"
    def str(e: String) = s"cast($e as varchar)"
    def elem(vals: Seq[String], i: String) =
      s"list_extract([${vals.map(q).mkString(",")}], cast($i as int) + 1)"
    def xor(a: String, b: String) = s"xor($a, $b)"
    def dateAdd(days: String) = s"(date '1998-01-01' + cast($days as int))"
    def days(dte: String) = s"datediff('day', date '1998-01-01', $dte)"
    def dow(dte: String) = s"dayofweek($dte)" // Sunday = 0
    def dayName(dte: String) = s"dayname($dte)"
    def dom(dte: String) = s"dayofmonth($dte)"
    def shr(e: String, n: Int) = s"(cast($e as bigint) >> $n)"
  }

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Per-(table, column) pseudo-random stream over a row-index expression. */
  private final case class G(d: Dia, idx: String, tab: String) {
    def u(key: String): String = {
      val salt = (((tab + "." + key).hashCode.toLong & 0x7fffffffL) *
        2654435761L) % 4294967296L
      val mixed = d.xor(s"((($idx) * 2654435761) % 4294967296)", salt.toString)
      s"((($mixed) * 48271) % 2147483647)"
    }
    def ui(key: String, n: Long, off: Long = 0): String =
      s"((${u(key)} % $n) + $off)"
    def pick(key: String, vals: Seq[String]): String =
      d.elem(vals, s"(${u(key)} % ${vals.length})")
    def dec2(cents: String): String = s"cast(($cents) * 0.01 as decimal(7,2))"
  }

  private def idiv(a: String, b: String): String =
    s"cast(floor(($a) / ($b)) as bigint)"

  // ------------------------------------------------------------------- sizes

  /** Bench-only FACT-table scale multiplier (GRAFT_TPCDS_SCALE, default 1).
    *
    * The correctness gate always runs at 1. Scaling multiplies only the
    * fact/returns tables (dsdgen's own construction: bigger scale factors
    * mean more sales rows against near-constant dimensions at the low end),
    * so every planted slice keeps working: fixed prefixes (echo rows) stay,
    * fractional plantings (whales every 18th row, hot cells ~1/300) scale
    * with the table. The sr/cr/wr→fact remaps (j·97+11 mod N) stay
    * invertible because 97 is prime and must not divide the scaled N —
    * the guard below rejects a Scale that breaks it. The same interpolated
    * sizes reach both dialects, so the DuckDB oracle builds the identical
    * scaled tables. */
  val Scale: Long = {
    val s = sys.env.getOrElse("GRAFT_TPCDS_SCALE", "1").toLong
    require(s >= 1 && s % 97 != 0, s"GRAFT_TPCDS_SCALE=$s (must be >=1, not divisible by 97)")
    s
  }

  val SoldDays = 2405L // 1998-01-01 .. 2004-07-31 (Jul 2004 feeds TPCx-BB q7)
  val NDateDim = 2922L // 1998-01-01 .. 2005-12-31 (returns/ship spill past sales)
  val NTimeDim = 86400L
  val NItem = 2000L
  val NCust = 10000L
  val NCa = 5000L
  val NCd = 1920800L // full dsdgen cross-product of demographic attributes
  val NHd = 7200L
  val NIb = 20L
  val NStore = 30L
  val NCc = 8L
  val NWeb = 30L
  val NWp = 100L
  val NCp = 12000L
  val NWh = 6L
  val NPromo = 300L
  val NSm = 20L
  val NReason = 55L
  val NSs = 180000L * Scale
  val NSr = 18000L * Scale
  val NCs = 120000L * Scale
  val NCr = 12000L * Scale
  val NWs = 80000L * Scale
  val NWr = 8000L * Scale
  val InvWeeks = 261L
  val NInv = NItem * NWh * InvWeeks

  // ----------------------------------------------------------------- domains
  // Seeded from the literals the reference's 99 queries filter on.

  private val syllables = Seq("ought", "able", "pri", "ese", "anti", "cally",
    "ation", "eing", "n st", "bar")
  private val counties = Seq("Vermilion County", "Park County",
    "Dorchester County", "Republic County", "Hayes County", "Walker County",
    "Williamson County", "Ziebach County", "Salem County", "Terrell County",
    "Arthur County", "Oglethorpe County", "Pennington County", "Perry County",
    "Halifax County", "Mobile County", "Levy County", "Huron County",
    "Daviess County", "Barrow County")
  private val states = Seq("AK", "AL", "AR", "CA", "CO", "FL", "GA", "IA",
    "ID", "IL", "IN", "KS", "KY", "ME", "MN", "MO", "NC", "NE", "NY", "OH",
    "OK", "OR", "SD", "TN", "TX", "WA", "WI", "VA", "MS", "ND")
  private val storeStates = Seq("TN", "SD", "AL", "GA", "KY", "MN", "OH", "TX")
  private val cities = Seq("Hamilton", "Fairview", "Five Points", "Midway",
    "Oak Grove", "Pleasant Hill", "Riverside", "Centerville", "Liberty",
    "Salem", "Union", "Wilson", "Glendale", "Marion", "Greenfield",
    "Springdale", "Mount Olive", "Kingston", "Woodville", "Ashland",
    "Antioch", "Concord", "Clifton", "Florence", "Friendship", "Greenville",
    "Jamestown", "Lakeview", "Newport", "Oakdale")
  private val educations = Seq("Primary", "Secondary", "College",
    "2 yr Degree", "4 yr Degree", "Advanced Degree", "Unknown")
  private val maritals = Seq("M", "S", "D", "W", "U")
  private val creditRatings = Seq("Low Risk", "High Risk", "Good", "Unknown")
  private val buyPotentials = Seq("0-500", "501-1000", "1001-5000",
    "5001-10000", ">10000", "Unknown")
  private val categories = Seq("Books", "Children", "Electronics", "Home",
    "Jewelry", "Men", "Music", "Shoes", "Sports", "Women")
  private val classes = Seq("accessories", "athletic", "classical", "decor",
    "fragrances", "jewelry boxes", "pants", "personal", "portable",
    "reference", "rock", "school-uniforms", "self-help", "shirts",
    "dresses", "estate", "country", "pop", "mens watch", "fiction")
  private val colors = Seq("almond", "antique", "bisque", "blue", "chiffon",
    "chocolate", "deep", "dim", "dodger", "khaki", "lawn", "lemon", "light",
    "lime", "metallic", "mint", "navy", "olive", "rosy", "royal", "salmon",
    "smoke", "tan", "white", "red", "green", "ivory", "linen", "peach",
    "plum", "powder", "puff")
  private val sizes = Seq("N/A", "economy", "extra large", "large", "medium",
    "small")
  private val units = Seq("Box", "Bunch", "Carton", "Case", "Dozen", "Dram",
    "Gram", "Lb", "N/A", "Ounce", "Oz", "Pallet", "Pound", "Tbl", "Tsp",
    "Unknown")
  private val brands = Seq("amalgimporto #1", "edu packscholar #1",
    "exportiimporto #1", "exportiunivamalg #9", "importoamalg #1",
    "scholaramalgamalg #14", "scholaramalgamalg #7", "scholaramalgamalg #9",
    "amalgamalg #2", "importoimporto #2", "edu packimporto #2",
    "amalgexporti #1", "scholarbrand #3", "exportischolar #2",
    "corpunivamalg #6", "univmaxi #9", "amalgedu pack #1", "importobrand #4",
    "edu packedu pack #1", "brandcorp #7", "corpcorp #1", "maxicorp #5",
    "univbrand #8", "importoscholar #1")
  private val firstNames = Seq("James", "Mary", "John", "Patricia", "Robert",
    "Jennifer", "Michael", "Linda", "William", "Elizabeth", "David",
    "Barbara", "Richard", "Susan", "Joseph", "Jessica", "Thomas", "Sarah",
    "Charles", "Karen", "Daniel", "Nancy", "Matthew", "Lisa", "Anthony",
    "Betty", "Mark", "Margaret", "Donald", "Sandra")
  private val lastNames = Seq("Smith", "Johnson", "Williams", "Brown",
    "Jones", "Garcia", "Miller", "Davis", "Rodriguez", "Martinez",
    "Hernandez", "Lopez", "Gonzalez", "Wilson", "Anderson", "Thomas",
    "Taylor", "Moore", "Jackson", "Martin", "Lee", "Perez", "Thompson",
    "White", "Harris", "Sanchez", "Clark", "Ramirez", "Lewis", "Robinson")
  private val countries = Seq("UNITED STATES", "CANADA", "MEXICO", "GERMANY",
    "FRANCE", "ITALY", "SPAIN", "JAPAN", "CHINA", "INDIA", "BRAZIL", "CHILE",
    "PERU", "EGYPT", "KENYA", "NIGERIA", "POLAND", "NORWAY", "SWEDEN",
    "GREECE", "TURKEY", "ISRAEL", "JORDAN", "VIETNAM", "THAILAND",
    "MALAYSIA", "AUSTRALIA", "IRELAND", "PORTUGAL", "AUSTRIA")
  private val carriers = Seq("UPS", "FEDEX", "AIRBORNE", "USPS", "DHL",
    "TBS", "ZOUROS", "MSC", "LATVIAN", "ALLIANCE", "GREAT EASTERN",
    "DIAMOND", "RUPEKSA", "ORIENTAL", "BOXBUNDLES", "GERMA", "HARMSTORF",
    "PRIVATECARRIER", "TRANSGLOBAL", "CARAVAN")
  private val shipTypes = Seq("EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR",
    "TWO DAY")
  private val streetTypes = Seq("Street", "Avenue", "Boulevard", "Court",
    "Drive", "Lane", "Parkway", "Road", "Way", "Circle")
  private val ccNames = Seq("NY Metro", "Mid Atlantic", "Pacific Northwest",
    "North Midwest", "California", "New England", "Southern", "Central")
  private val storeCounties =
    Seq("Walker County", "Williamson County", "Ziebach County")
  /** Shared store/address zip pool: 21 zips from q8's literal list plus 3
    * from q15/q45's, so zip-equality joins (q24), zip-prefix matches (q8)
    * and zip-list filters (q15/q45) are all satisfiable. */
  private val zipPool = Seq(
    "47602", "16704", "35863", "28577", "83910", "36201", "58412", "48162",
    "28055", "41419", "80332", "38607", "77817", "24891", "16226", "18410",
    "21231", "59345", "13918", "51089", "20317",
    "85669", "86197", "88274")

  // ------------------------------------------------- planted-slice closed forms
  // Shared by the fact generators so catalog/web rows can reference the same
  // entities as store rows (see the scaladoc's planted-correlation list).

  /** 50 whale customers (q23): huge, near-equal store-sales totals. */
  private def whaleCust(w: String): String = s"(((($w) * 181 + 7) % $NCust) + 1)"
  /** 100 loyal customers (q4/q11/q74): active in all channels every year. */
  private def loyalCust(l: String): String = s"(((($l) * 97 + 13) % $NCust) + 1)"
  /** 50 hot (item, date) cells in 1999-2002 (q23's count(*)>4 per day). */
  private def hotItem(h: String): String = s"(((($h) * 37 + 3) % $NItem) + 1)"
  private def hotDate(h: String): String = s"(400 + ((($h) * 43) % 1700))"
  /** cd_demo_sk with (marital, education) = pinned pair: ids are laid out as
    * the dsdgen cross-product, so marital = floor(id/2)%5 and education =
    * floor(id/10)%7 — id ≡ 58 (mod 70) is ('U', 'Advanced Degree') for q85,
    * id ≡ 60 (mod 70) is ('M', 'Unknown') for q91. */
  private def cdUAdv(k: String): String = s"((70 * (($k) % 27440)) + 59)"
  private def cdMUnknown(k: String): String = s"((70 * (($k) % 27440)) + 61)"
  /** hd_demo_sk with hd_buy_potential = '501-1000' (q91): id%120 in [20,40). */
  private def hd501(k1: String, k2: String): String =
    s"((120 * (($k1) % 60)) + 21 + (($k2) % 20))"
  /** ca_address_sk with ca_gmt_offset = -7 (q91): gmt is -(5 + id%4). */
  private def caGmt7(k: String): String = s"((4 * (($k) % 1250)) + 3)"
  /** ca_address_sk with ca_state = 'WI' (q85): state pinned when id%40 = 7. */
  private def caWi(k: String): String = s"((40 * (($k) % 125)) + 8)"

  // ------------------------------------------------------------------ tables

  private def render(cols: Seq[(String, String)], src: String): String =
    cols.map { case (n, e) => s"$e AS $n" }.mkString("SELECT ", ", ", s" FROM $src")

  private def dateDim(d: Dia): String = {
    val dte = d.dateAdd("id")
    val yr = s"year($dte)"
    val mo = s"month($dte)"
    val mseq = s"(($yr - 1900) * 12 + $mo - 1)"
    // week anchor: 1998-01-04 was a Sunday; day 3 = 1998-01-04
    val wseq = s"(${idiv("id + 1099", "7")} + 1)"
    val qoy = s"${idiv(s"$mo - 1", "3")} + 1"
    val cols = Seq(
      "d_date_sk" -> "id",
      "d_date_id" -> s"'D' || lpad(${d.str("id")}, 15, '0')",
      "d_date" -> dte,
      "d_month_seq" -> mseq,
      "d_week_seq" -> wseq,
      "d_quarter_seq" -> s"(($yr - 1900) * 4 + $qoy - 1)",
      "d_year" -> yr,
      "d_dow" -> d.dow(dte),
      "d_moy" -> mo,
      "d_dom" -> d.dom(dte),
      "d_qoy" -> s"($qoy)",
      "d_fy_year" -> yr,
      "d_fy_quarter_seq" -> s"(($yr - 1900) * 4 + $qoy - 1)",
      "d_fy_week_seq" -> wseq,
      "d_day_name" -> d.dayName(dte),
      "d_quarter_name" -> s"${d.str(yr)} || 'Q' || ${d.str(s"($qoy)")}",
      "d_holiday" -> s"CASE WHEN ($mo = 12 AND ${d.dom(dte)} = 25) OR ($mo = 1 AND ${d.dom(dte)} = 1) OR ($mo = 7 AND ${d.dom(dte)} = 4) THEN 'Y' ELSE 'N' END",
      "d_weekend" -> s"CASE WHEN ${d.dow(dte)} IN (0, 6) THEN 'Y' ELSE 'N' END",
      "d_following_holiday" -> s"CASE WHEN ($mo = 12 AND ${d.dom(dte)} = 26) OR ($mo = 1 AND ${d.dom(dte)} = 2) OR ($mo = 7 AND ${d.dom(dte)} = 5) THEN 'Y' ELSE 'N' END",
      "d_first_dom" -> s"(id - ${d.dom(dte)} + 1)",
      "d_last_dom" -> d.days(s"last_day($dte)"),
      "d_same_day_ly" -> "(id - 365)",
      "d_same_day_lq" -> "(id - 91)",
      "d_current_day" -> "'N'",
      "d_current_week" -> "'N'",
      "d_current_month" -> "'N'",
      "d_current_quarter" -> "'N'",
      "d_current_year" -> "'N'")
    render(cols, d.seq(NDateDim))
  }

  private def timeDim(d: Dia): String = {
    val hr = idiv("id", "3600")
    val cols = Seq(
      "t_time_sk" -> "id",
      "t_time_id" -> s"'T' || lpad(${d.str("id")}, 15, '0')",
      "t_time" -> "id",
      "t_hour" -> hr,
      "t_minute" -> idiv("id % 3600", "60"),
      "t_second" -> "(id % 60)",
      "t_am_pm" -> s"CASE WHEN $hr < 12 THEN 'AM' ELSE 'PM' END",
      "t_shift" -> s"CASE WHEN $hr < 8 THEN 'third' WHEN $hr < 16 THEN 'first' ELSE 'second' END",
      "t_sub_shift" -> s"CASE WHEN $hr < 6 THEN 'night' WHEN $hr < 12 THEN 'morning' WHEN $hr < 18 THEN 'afternoon' ELSE 'evening' END",
      "t_meal_time" -> s"CASE WHEN $hr BETWEEN 6 AND 8 THEN 'breakfast' WHEN $hr BETWEEN 11 AND 13 THEN 'lunch' WHEN $hr BETWEEN 17 AND 19 THEN 'dinner' ELSE NULL END")
    render(cols, d.seq(NTimeDim))
  }

  private def item(d: Dia): String = {
    val g = G(d, "id", "item")
    val bidx = s"(${g.u("brand")} % ${brands.length})"
    // Magic slices (13% of items) pin attribute combos that specific queries
    // intersect on: mg 0-3 → q37's manufact ids at q37's price window;
    // mg 4 → q41's manufact range with one of its attribute branches;
    // mg 5-6 → q54's Men/shirts; mg 7-10 → q64's blue items at 30..39;
    // mg 11/12 → extra chocolate/lawn items (q24a/q24b).
    // ids ≡ 55 (mod 100) are ALWAYS Men/shirts so catalog orders can target
    // them by id (q54's planted July-2000 purchases, see csRaw).
    val mg = s"(CASE WHEN id % 100 = 55 THEN 5 ELSE (${g.u("magic")} % 100) END)"
    val mfid = s"(CASE $mg WHEN 0 THEN 832 WHEN 1 THEN 757 WHEN 2 THEN 736 " +
      s"WHEN 3 THEN 999 WHEN 4 THEN (739 + (${g.u("m41")} % 41)) " +
      s"ELSE ${g.ui("manufact", 1000, 1)} END)"
    val priceC = s"(CASE WHEN $mg <= 3 THEN (5800 + (${g.u("p37")} % 3000)) " +
      s"WHEN $mg BETWEEN 7 AND 10 THEN (3000 + (${g.u("p64")} % 900)) " +
      s"ELSE ${g.ui("curprice", 29900, 100)} END)"
    val cidx = s"(CASE WHEN $mg = 4 THEN 9 WHEN $mg IN (5, 6) THEN 5 " +
      s"ELSE (${g.u("cat")} % ${categories.length}) END)"
    val clidx = s"(CASE WHEN $mg IN (5, 6) THEN 13 " +
      s"ELSE (${g.u("class")} % ${classes.length}) END)"
    val color = s"(CASE WHEN $mg = 4 THEN 'mint' " +
      s"WHEN $mg BETWEEN 7 AND 10 THEN 'blue' WHEN $mg = 11 THEN 'chocolate' " +
      s"WHEN $mg = 12 THEN 'lawn' ELSE ${g.pick("color", colors)} END)"
    val units = s"(CASE WHEN $mg = 4 THEN 'Dozen' " +
      s"ELSE ${g.pick("units", TpcdsGen.units)} END)"
    val size = s"(CASE WHEN $mg = 4 THEN 'large' " +
      s"ELSE ${g.pick("size", sizes)} END)"
    val cols = Seq(
      "i_item_sk" -> "(id + 1)",
      "i_item_id" -> s"'ITEM' || lpad(${d.str("id + 1")}, 12, '0')",
      "i_rec_start_date" -> "date '1997-01-01'",
      "i_rec_end_date" -> "cast(NULL as date)",
      "i_item_desc" -> s"'the promise of ' || ${g.pick("desc1", colors)} || ' ' || ${g.pick("desc2", classes)} || ' ' || ${d.str(g.ui("desc3", 1000))}",
      "i_current_price" -> g.dec2(priceC),
      "i_wholesale_cost" -> g.dec2(g.ui("wholesale", 9900, 100)),
      "i_brand_id" -> s"(($bidx + 1) * 1001)",
      "i_brand" -> d.elem(brands, bidx),
      "i_class_id" -> s"($clidx + 1)",
      "i_class" -> d.elem(classes, clidx),
      "i_category_id" -> s"($cidx + 1)",
      "i_category" -> d.elem(categories, cidx),
      "i_manufact_id" -> mfid,
      "i_manufact" -> s"'mfg#' || ${d.str(mfid)}",
      "i_size" -> size,
      "i_formulation" -> s"'formula' || lpad(${d.str(g.ui("formulation", 100000))}, 9, '0')",
      "i_color" -> color,
      "i_units" -> units,
      "i_container" -> "'Unknown'",
      "i_manager_id" -> g.ui("manager", 100, 1),
      "i_product_name" -> s"${g.pick("pn1", syllables)} || ${g.pick("pn2", syllables)} || ${g.pick("pn3", syllables)} || ${d.str("id + 1")}")
    render(cols, d.seq(NItem))
  }

  private def customer(d: Dia): String = {
    val g = G(d, "id", "customer")
    val first = g.pick("fname", firstNames)
    val last = g.pick("lname", lastNames)
    // q91 slice (1/12 of customers): current demo pinned to ('M','Unknown'),
    // household to '501-1000' buy potential, address to gmt_offset -7.
    val m91 = s"(${g.u("magic91")} % 12 = 0)"
    val cols = Seq(
      "c_customer_sk" -> "(id + 1)",
      "c_customer_id" -> s"'CUST' || lpad(${d.str("id + 1")}, 12, '0')",
      "c_current_cdemo_sk" -> (s"(CASE WHEN $m91 THEN ${cdMUnknown(g.u("cd91"))} " +
        s"ELSE ${g.ui("cdemo", NCd, 1)} END)"),
      "c_current_hdemo_sk" -> (s"(CASE WHEN $m91 THEN ${hd501(g.u("hd91a"), g.u("hd91b"))} " +
        s"ELSE ${g.ui("hdemo", NHd, 1)} END)"),
      "c_current_addr_sk" -> (s"(CASE WHEN $m91 THEN ${caGmt7(g.u("ad91"))} " +
        s"ELSE ${g.ui("addr", NCa, 1)} END)"),
      "c_first_shipto_date_sk" -> g.ui("shipto", SoldDays - 40),
      "c_first_sales_date_sk" -> g.ui("firstsale", SoldDays - 40),
      "c_salutation" -> g.pick("salutation", Seq("Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir")),
      "c_first_name" -> first,
      "c_last_name" -> last,
      "c_preferred_cust_flag" -> g.pick("preferred", Seq("Y", "N")),
      "c_birth_day" -> g.ui("bday", 28, 1),
      "c_birth_month" -> g.ui("bmonth", 12, 1),
      "c_birth_year" -> g.ui("byear", 69, 1924),
      "c_birth_country" -> g.pick("bcountry", countries),
      "c_login" -> d.nullStr,
      "c_email_address" -> s"$first || '.' || $last || '@example.' || ${g.pick("tld", Seq("com", "org", "edu"))}",
      "c_last_review_date_sk" -> g.ui("review", SoldDays))
    render(cols, d.seq(NCust))
  }

  private def customerAddress(d: Dia): String = {
    val g = G(d, "id", "customer_address")
    // geo: 1/5 of addresses share a (county, state) domain with stores so
    // address-store geography joins (q54) are satisfiable; id%40=7 pins 'WI'
    // for q85's planted returns; gmt derives from id so q91 can pin -7.
    val geo = s"(${g.u("geo")} % 5 = 0)"
    val cols = Seq(
      "ca_address_sk" -> "(id + 1)",
      "ca_address_id" -> s"'ADDR' || lpad(${d.str("id + 1")}, 12, '0')",
      "ca_street_number" -> d.str(g.ui("streetno", 999, 1)),
      "ca_street_name" -> s"${g.pick("sn1", syllables)} || ' ' || ${g.pick("sn2", syllables)}",
      "ca_street_type" -> g.pick("stype", streetTypes),
      "ca_suite_number" -> s"'Suite ' || ${d.str(g.ui("suite", 100))}",
      "ca_city" -> g.pick("city", cities),
      "ca_county" -> (s"(CASE WHEN $geo THEN ${g.pick("cnty3", storeCounties)} " +
        s"ELSE ${g.pick("county", counties)} END)"),
      "ca_state" -> (s"(CASE WHEN id % 40 = 7 THEN 'WI' " +
        s"WHEN $geo THEN ${g.pick("st8", storeStates)} " +
        s"ELSE ${g.pick("state", states)} END)"),
      // urban concentration: 1/8 of addresses share the market-9 stores' zip
      // (zipPool(15), see store()'s market-keyed zip) so zip-equality joins
      // against a single market's stores (q24) keep enough rows.
      "ca_zip" -> (s"(CASE WHEN ${g.u("zipskew")} % 8 = 0 THEN '${zipPool(15)}' " +
        s"ELSE ${g.pick("zip", zipPool)} END)"),
      "ca_country" -> "'United States'",
      "ca_gmt_offset" -> "cast((0 - (5 + (id % 4))) as decimal(5,2))",
      "ca_location_type" -> g.pick("loctype", Seq("apartment", "condo", "single family")))
    render(cols, d.seq(NCa))
  }

  /** Full dsdgen-style cross-product of demographic attributes (1,920,800 rows). */
  private def customerDemographics(d: Dia): String = {
    val cols = Seq(
      "cd_demo_sk" -> "(id + 1)",
      "cd_gender" -> s"CASE WHEN id % 2 = 0 THEN 'M' ELSE 'F' END",
      "cd_marital_status" -> d.elem(maritals, s"(${idiv("id", "2")} % 5)"),
      "cd_education_status" -> d.elem(educations, s"(${idiv("id", "10")} % 7)"),
      "cd_purchase_estimate" -> s"((${idiv("id", "70")} % 20 + 1) * 500)",
      "cd_credit_rating" -> d.elem(creditRatings, s"(${idiv("id", "1400")} % 4)"),
      "cd_dep_count" -> s"(${idiv("id", "5600")} % 7)",
      "cd_dep_employed_count" -> s"(${idiv("id", "39200")} % 7)",
      "cd_dep_college_count" -> s"(${idiv("id", "274400")} % 7)")
    render(cols, d.seq(NCd))
  }

  private def householdDemographics(d: Dia): String = {
    val cols = Seq(
      "hd_demo_sk" -> "(id + 1)",
      "hd_income_band_sk" -> "(id % 20 + 1)",
      "hd_buy_potential" -> d.elem(buyPotentials, s"(${idiv("id", "20")} % 6)"),
      "hd_dep_count" -> s"(${idiv("id", "120")} % 10)",
      "hd_vehicle_count" -> s"(${idiv("id", "1200")} % 6 - 1)")
    render(cols, d.seq(NHd))
  }

  private def incomeBand(d: Dia): String = {
    val cols = Seq(
      "ib_income_band_sk" -> "(id + 1)",
      "ib_lower_bound" -> "CASE WHEN id = 0 THEN 0 ELSE id * 10000 + 1 END",
      "ib_upper_bound" -> "((id + 1) * 10000)")
    render(cols, d.seq(NIb))
  }

  private def store(d: Dia): String = {
    val g = G(d, "id", "store")
    val cols = Seq(
      "s_store_sk" -> "(id + 1)",
      "s_store_id" -> s"'STORE' || lpad(${d.str("id + 1")}, 11, '0')",
      "s_rec_start_date" -> "date '1997-01-01'",
      "s_rec_end_date" -> "cast(NULL as date)",
      "s_closed_date_sk" -> "cast(NULL as int)",
      "s_store_name" -> d.elem(syllables, "(id % 10)"),
      "s_number_employees" -> g.ui("employees", 100, 200),
      "s_floor_space" -> g.ui("floor", 9000000, 1000000),
      "s_hours" -> g.pick("hours", Seq("8AM-4PM", "8AM-8PM", "8AM-12AM")),
      "s_manager" -> s"${g.pick("mgr1", firstNames)} || ' ' || ${g.pick("mgr2", lastNames)}",
      "s_market_id" -> g.ui("market", 10, 1),
      "s_geography_class" -> "'Unknown'",
      "s_market_desc" -> s"'market desc ' || ${d.str(g.ui("mktdesc", 100))}",
      "s_market_manager" -> s"${g.pick("mm1", firstNames)} || ' ' || ${g.pick("mm2", lastNames)}",
      "s_division_id" -> "1",
      "s_division_name" -> "'Unknown'",
      "s_company_id" -> "1",
      "s_company_name" -> "'Unknown'",
      "s_street_number" -> d.str(g.ui("streetno", 999, 1)),
      "s_street_name" -> s"${g.pick("sn1", syllables)} || ' ' || ${g.pick("sn2", syllables)}",
      "s_street_type" -> g.pick("stype", streetTypes),
      "s_suite_number" -> s"'Suite ' || ${d.str(g.ui("suite", 100))}",
      "s_city" -> g.pick("city", Seq("Fairview", "Five Points", "Midway", "Oak Grove", "Pleasant Hill", "Riverside")),
      "s_county" -> g.pick("county", storeCounties),
      "s_state" -> g.pick("state", storeStates),
      // stores of the same market share a zip (market-keyed pool pick), so
      // a zip-equality join against one market's stores (q24) is satisfiable
      "s_zip" -> d.elem(zipPool, s"((${g.ui("market", 10, 1)} * 7) % 24)"),
      "s_country" -> "'United States'",
      "s_gmt_offset" -> s"cast((0 - ${g.ui("gmt", 2, 5)}) as decimal(5,2))",
      "s_tax_precentage" -> s"cast((${g.ui("tax", 12)}) * 0.01 as decimal(5,2))")
    render(cols, d.seq(NStore))
  }

  private def callCenter(d: Dia): String = {
    val g = G(d, "id", "call_center")
    val cols = Seq(
      "cc_call_center_sk" -> "(id + 1)",
      "cc_call_center_id" -> s"'CC' || lpad(${d.str("id + 1")}, 14, '0')",
      "cc_rec_start_date" -> "date '1997-01-01'",
      "cc_rec_end_date" -> "cast(NULL as date)",
      "cc_closed_date_sk" -> "cast(NULL as int)",
      "cc_open_date_sk" -> g.ui("open", 300),
      "cc_name" -> d.elem(ccNames, s"(id % ${ccNames.length})"),
      "cc_class" -> g.pick("class", Seq("small", "medium", "large")),
      "cc_employees" -> g.ui("employees", 600, 100),
      "cc_sq_ft" -> g.ui("sqft", 900000, 100000),
      "cc_hours" -> g.pick("hours", Seq("8AM-4PM", "8AM-8PM", "8AM-12AM")),
      "cc_manager" -> s"${g.pick("mgr1", firstNames)} || ' ' || ${g.pick("mgr2", lastNames)}",
      "cc_mkt_id" -> g.ui("mktid", 6, 1),
      "cc_mkt_class" -> s"'mkt class ' || ${d.str(g.ui("mktclass", 50))}",
      "cc_mkt_desc" -> s"'mkt desc ' || ${d.str(g.ui("mktdesc", 100))}",
      "cc_market_manager" -> s"${g.pick("mm1", firstNames)} || ' ' || ${g.pick("mm2", lastNames)}",
      "cc_division" -> g.ui("division", 6, 1),
      "cc_division_name" -> g.pick("divname", syllables),
      "cc_company" -> g.ui("company", 6, 1),
      "cc_company_name" -> g.pick("coname", syllables),
      "cc_street_number" -> d.str(g.ui("streetno", 999, 1)),
      "cc_street_name" -> s"${g.pick("sn1", syllables)} || ' ' || ${g.pick("sn2", syllables)}",
      "cc_street_type" -> g.pick("stype", streetTypes),
      "cc_suite_number" -> s"'Suite ' || ${d.str(g.ui("suite", 100))}",
      "cc_city" -> g.pick("city", Seq("Fairview", "Five Points", "Midway", "Oak Grove", "Pleasant Hill", "Riverside")),
      "cc_county" -> g.pick("county", Seq("Walker County", "Williamson County", "Ziebach County")),
      "cc_state" -> g.pick("state", storeStates),
      "cc_zip" -> s"lpad(${d.str(g.ui("zip", 100000))}, 5, '0')",
      "cc_country" -> "'United States'",
      "cc_gmt_offset" -> s"cast((0 - ${g.ui("gmt", 2, 5)}) as decimal(5,2))",
      "cc_tax_percentage" -> s"cast((${g.ui("tax", 12)}) * 0.01 as decimal(5,2))")
    render(cols, d.seq(NCc))
  }

  private def webSite(d: Dia): String = {
    val g = G(d, "id", "web_site")
    val cols = Seq(
      "web_site_sk" -> "(id + 1)",
      "web_site_id" -> s"'WEB' || lpad(${d.str("id + 1")}, 13, '0')",
      "web_rec_start_date" -> "date '1997-01-01'",
      "web_rec_end_date" -> "cast(NULL as date)",
      "web_name" -> s"'site_' || ${d.str("id % 15")}",
      "web_open_date_sk" -> g.ui("open", 300),
      "web_close_date_sk" -> "cast(NULL as int)",
      "web_class" -> "'Unknown'",
      "web_manager" -> s"${g.pick("mgr1", firstNames)} || ' ' || ${g.pick("mgr2", lastNames)}",
      "web_mkt_id" -> g.ui("mktid", 6, 1),
      "web_mkt_class" -> s"'mkt class ' || ${d.str(g.ui("mktclass", 50))}",
      "web_mkt_desc" -> s"'mkt desc ' || ${d.str(g.ui("mktdesc", 100))}",
      "web_market_manager" -> s"${g.pick("mm1", firstNames)} || ' ' || ${g.pick("mm2", lastNames)}",
      "web_company_id" -> g.ui("companyid", 6, 1),
      "web_company_name" -> d.elem(syllables, "(id % 6)"),
      "web_street_number" -> d.str(g.ui("streetno", 999, 1)),
      "web_street_name" -> s"${g.pick("sn1", syllables)} || ' ' || ${g.pick("sn2", syllables)}",
      "web_street_type" -> g.pick("stype", streetTypes),
      "web_suite_number" -> s"'Suite ' || ${d.str(g.ui("suite", 100))}",
      "web_city" -> g.pick("city", cities),
      "web_county" -> g.pick("county", counties),
      "web_state" -> g.pick("state", states),
      "web_zip" -> s"lpad(${d.str(g.ui("zip", 100000))}, 5, '0')",
      "web_country" -> "'United States'",
      "web_gmt_offset" -> s"cast((0 - ${g.ui("gmt", 4, 5)}) as decimal(5,2))",
      "web_tax_percentage" -> s"cast((${g.ui("tax", 12)}) * 0.01 as decimal(5,2))")
    render(cols, d.seq(NWeb))
  }

  private def webPage(d: Dia): String = {
    val g = G(d, "id", "web_page")
    val cols = Seq(
      "wp_web_page_sk" -> "(id + 1)",
      "wp_web_page_id" -> s"'WP' || lpad(${d.str("id + 1")}, 14, '0')",
      "wp_rec_start_date" -> "date '1997-01-01'",
      "wp_rec_end_date" -> "cast(NULL as date)",
      "wp_creation_date_sk" -> g.ui("creation", 300),
      "wp_access_date_sk" -> g.ui("access", SoldDays),
      "wp_autogen_flag" -> g.pick("autogen", Seq("Y", "N")),
      "wp_customer_sk" -> g.ui("customer", NCust, 1),
      "wp_url" -> "'http://www.example.com/'",
      "wp_type" -> g.pick("type", Seq("ad", "dynamic", "feedback", "general", "order", "protected", "welcome")),
      "wp_char_count" -> g.ui("chars", 2000, 4000),
      "wp_link_count" -> g.ui("links", 25, 2),
      "wp_image_count" -> g.ui("images", 7, 1),
      "wp_max_ad_count" -> g.ui("ads", 5))
    render(cols, d.seq(NWp))
  }

  private def catalogPage(d: Dia): String = {
    val g = G(d, "id", "catalog_page")
    val cols = Seq(
      "cp_catalog_page_sk" -> "(id + 1)",
      "cp_catalog_page_id" -> s"'CP' || lpad(${d.str("id + 1")}, 14, '0')",
      "cp_start_date_sk" -> g.ui("start", SoldDays - 100),
      "cp_end_date_sk" -> s"(${g.ui("start", SoldDays - 100)} + 90)",
      "cp_department" -> "'DEPARTMENT'",
      "cp_catalog_number" -> s"(${idiv("id", "108")} + 1)",
      "cp_catalog_page_number" -> "(id % 108 + 1)",
      "cp_description" -> s"'catalog page ' || ${d.str("id + 1")}",
      "cp_type" -> g.pick("type", Seq("monthly", "quarterly", "bi-annual")))
    render(cols, d.seq(NCp))
  }

  private def warehouse(d: Dia): String = {
    val g = G(d, "id", "warehouse")
    val cols = Seq(
      "w_warehouse_sk" -> "(id + 1)",
      "w_warehouse_id" -> s"'WH' || lpad(${d.str("id + 1")}, 14, '0')",
      "w_warehouse_name" -> s"'Warehouse ' || ${d.str("id + 1")}",
      "w_warehouse_sq_ft" -> g.ui("sqft", 900000, 50000),
      "w_street_number" -> d.str(g.ui("streetno", 999, 1)),
      "w_street_name" -> s"${g.pick("sn1", syllables)} || ' ' || ${g.pick("sn2", syllables)}",
      "w_street_type" -> g.pick("stype", streetTypes),
      "w_suite_number" -> s"'Suite ' || ${d.str(g.ui("suite", 100))}",
      "w_city" -> g.pick("city", cities),
      "w_county" -> g.pick("county", counties),
      "w_state" -> g.pick("state", states),
      "w_zip" -> s"lpad(${d.str(g.ui("zip", 100000))}, 5, '0')",
      "w_country" -> "'United States'",
      "w_gmt_offset" -> s"cast((0 - ${g.ui("gmt", 4, 5)}) as decimal(5,2))")
    render(cols, d.seq(NWh))
  }

  private def promotion(d: Dia): String = {
    val g = G(d, "id", "promotion")
    val start = g.ui("start", SoldDays - 60)
    val cols = Seq(
      "p_promo_sk" -> "(id + 1)",
      "p_promo_id" -> s"'PROMO' || lpad(${d.str("id + 1")}, 11, '0')",
      "p_start_date_sk" -> start,
      "p_end_date_sk" -> s"($start + ${g.ui("len", 50, 10)})",
      "p_item_sk" -> g.ui("item", NItem, 1),
      "p_cost" -> s"cast(${g.ui("cost", 100000, 1000)} as decimal(15,2))",
      "p_response_target" -> "1",
      "p_promo_name" -> s"${g.pick("pn1", syllables)} || ${g.pick("pn2", syllables)}",
      "p_channel_dmail" -> g.pick("dmail", Seq("Y", "N")),
      "p_channel_email" -> g.pick("email", Seq("Y", "N")),
      "p_channel_catalog" -> g.pick("catalog", Seq("Y", "N")),
      "p_channel_tv" -> g.pick("tv", Seq("Y", "N")),
      "p_channel_radio" -> g.pick("radio", Seq("Y", "N")),
      "p_channel_press" -> g.pick("press", Seq("Y", "N")),
      "p_channel_event" -> g.pick("event", Seq("Y", "N")),
      "p_channel_demo" -> g.pick("demo", Seq("Y", "N")),
      "p_channel_details" -> s"'promo details ' || ${d.str("id + 1")}",
      "p_purpose" -> "'Unknown'",
      "p_discount_active" -> "'N'")
    render(cols, d.seq(NPromo))
  }

  private def shipMode(d: Dia): String = {
    val g = G(d, "id", "ship_mode")
    val cols = Seq(
      "sm_ship_mode_sk" -> "(id + 1)",
      "sm_ship_mode_id" -> s"'SM' || lpad(${d.str("id + 1")}, 14, '0')",
      "sm_type" -> d.elem(shipTypes, "(id % 5)"),
      "sm_code" -> d.elem(Seq("AIR", "SURFACE", "SEA"), s"(${idiv("id", "5")} % 3)"),
      "sm_carrier" -> d.elem(carriers, s"(id % ${carriers.length})"),
      "sm_contract" -> s"'contract' || lpad(${d.str(g.ui("contract", 100000))}, 10, '0')")
    render(cols, d.seq(NSm))
  }

  private def reason(d: Dia): String = {
    val cols = Seq(
      "r_reason_sk" -> "(id + 1)",
      "r_reason_id" -> s"'R' || lpad(${d.str("id + 1")}, 15, '0')",
      "r_reason_desc" -> s"'reason ' || ${d.str("id + 1")}")
    render(cols, d.seq(NReason))
  }

  // ------------------------------------------------------ fact table columns
  // Sales columns are functions of a row-index expression so returns tables
  // can re-evaluate them at a remapped index (exact sale<->return linkage).

  private val ItemsPerCsOrder = 10L
  private val ItemsPerWsOrder = 8L

  /** Echo slice size: the first NEcho catalog AND web rows mirror the
    * store-sales row echoSrc(id)'s (item, customer, date, qty, price). */
  private val NEcho = 3000L
  private def echoSrc(idx: String): String = s"(((($idx) * 61) + 17) % $NSs)"

  /** Common sales measures in cents, shared by all three channels. qty/spC
    * (and optionally wc/coupon) are caller-supplied so planted slices can
    * pin them; every derived column stays consistent with the pinned draw. */
  private final case class Measures(g: G, qty: String, spC: String,
      wcOver: Option[String] = None, coupOver: Option[String] = None) {
    val wcC: String = wcOver.getOrElse(s"(${g.u("wc")} % 10000)")
    val lpC: String = s"($spC + (${g.u("lp")} % 5000) + 100)"
    val coupC: String = coupOver.getOrElse(
      s"(CASE WHEN ${g.u("hascoup")} % 10 = 0 THEN ${g.u("coup")} % 2000000 ELSE 0 END)")
    val extSalesC = s"(($qty) * ($spC))"
    val extWholesaleC = s"(($qty) * ($wcC))"
    val extListC = s"(($qty) * ($lpC))"
    val extDiscountC = s"(($qty) * (($lpC) - ($spC)))"
    val netPaidC = s"(greatest($extSalesC - $coupC, 0))"
    val taxC = idiv(netPaidC, "20")
    val netPaidIncTaxC = s"($netPaidC + $taxC)"
    val shipC = s"(($qty) * (${g.u("ship")} % 1000))"
    val netProfitC = s"($netPaidC - $extWholesaleC)"
  }

  /** Variable ticket id: each 25-row block splits into two tickets of sizes
    * t and 25-t with t in 1..24, so per-ticket item counts span 1..24 and
    * ticket-size windows (q34 15..20, q73 1..5) select rows. */
  private def tickOf(d: Dia, idx: String): String = {
    val block = idiv(idx, "25")
    val tsize = s"(1 + (${G(d, block, "store_sales_b").u("tsize")} % 24))"
    s"((2 * ($block)) + (CASE WHEN (($idx) % 25) < $tsize THEN 0 ELSE 1 END))"
  }

  /** The planted-slice-aware store-sales core columns, reusable at a remapped
    * index by returns and by the catalog/web echo slices. */
  private final case class SsRaw(
      tick: String, item: String, cust: String, date: String,
      qty: String, spC: String)

  private def ssRaw(d: Dia, idx: String): SsRaw = {
    val g = G(d, idx, "store_sales")
    val tick = tickOf(d, idx)
    val gt = G(d, tick, "store_sales_t")
    // whale rows: every 18th row pins (customer=whale, qty=100, sp=199.99),
    // giving each of the 50 whales an identical ~$4M store total — q23's
    // "within 95% of the best customer" selects exactly the whales.
    val whale = s"((($idx) % 18) = 0)"
    val whaleId = s"(${idiv(idx, "18")} % 50)"
    // hot cells: ~1/300 rows re-target a planted (item, date) cell so q23's
    // frequent_ss_items (count(*) > 4 per item+date) is non-empty.
    val hot = s"(${g.u("hot")} % 300 = 0)"
    val h = s"(${g.u("hoth")} % 50)"
    val item = s"(CASE WHEN $hot THEN ${hotItem(h)} ELSE ${g.ui("item", NItem, 1)} END)"
    val date = s"(CASE WHEN $hot THEN ${hotDate(h)} ELSE ${gt.ui("solddate", SoldDays)} END)"
    val cust = s"(CASE WHEN $whale THEN ${whaleCust(whaleId)} " +
      s"WHEN ${gt.u("loyal")} % 20 = 0 THEN ${loyalCust(s"(${gt.u("loyal2")} % 100)")} " +
      s"WHEN ${gt.u("custnull")} % 25 = 0 THEN cast(NULL as bigint) " +
      s"ELSE ${gt.ui("customer", NCust, 1)} END)"
    val qty = s"(CASE WHEN $whale THEN 100 ELSE ${g.ui("qty", 100, 1)} END)"
    val spC = s"(CASE WHEN $whale THEN 19999 ELSE (${g.u("sp")} % 20000) END)"
    SsRaw(tick, item, cust, date, qty, spC)
  }

  private def ssCols(d: Dia, idx: String): Seq[(String, String)] = {
    val g = G(d, idx, "store_sales")
    val raw = ssRaw(d, idx)
    val gt = G(d, raw.tick, "store_sales_t")
    val m = Measures(g, raw.qty, raw.spC)
    Seq(
      "ss_sold_date_sk" -> raw.date,
      "ss_sold_time_sk" -> g.ui("soldtime", NTimeDim),
      "ss_item_sk" -> raw.item,
      "ss_customer_sk" -> raw.cust,
      "ss_cdemo_sk" -> (s"(CASE WHEN ${g.u("cdnull")} % 50 = 0 THEN cast(NULL as bigint) " +
        s"ELSE ${gt.ui("cdemo", NCd, 1)} END)"),
      "ss_hdemo_sk" -> gt.ui("hdemo", NHd, 1),
      "ss_addr_sk" -> gt.ui("addr", NCa, 1),
      "ss_store_sk" -> gt.ui("store", NStore, 1),
      "ss_promo_sk" -> g.ui("promo", NPromo, 1),
      "ss_ticket_number" -> s"(${raw.tick} + 1)",
      "ss_quantity" -> raw.qty,
      "ss_wholesale_cost" -> g.dec2(m.wcC),
      "ss_list_price" -> g.dec2(m.lpC),
      "ss_sales_price" -> g.dec2(raw.spC),
      "ss_ext_discount_amt" -> g.dec2(m.extDiscountC),
      "ss_ext_sales_price" -> g.dec2(m.extSalesC),
      "ss_ext_wholesale_cost" -> g.dec2(m.extWholesaleC),
      "ss_ext_list_price" -> g.dec2(m.extListC),
      "ss_ext_tax" -> g.dec2(m.taxC),
      "ss_coupon_amt" -> g.dec2(m.coupC),
      "ss_net_paid" -> g.dec2(m.netPaidC),
      "ss_net_paid_inc_tax" -> g.dec2(m.netPaidIncTaxC),
      "ss_net_profit" -> g.dec2(m.netProfitC))
  }

  private def storeSales(d: Dia): String = render(ssCols(d, "id"), d.seq(NSs))

  /** Returned-date override: ~1/25 of returns land in one of q83's three
    * week windows (weeks of 2000-05-29 / 2000-10-01 / 2000-11-04). */
  private def retDate(g: G, sold: String): String = {
    val win = s"(CASE (${g.u("wk83a")} % 3) WHEN 0 THEN 875 WHEN 1 THEN 1001 " +
      s"ELSE 1036 END + (${g.u("wk83b")} % 7))"
    s"(CASE WHEN ${g.u("wk83")} % 25 = 0 THEN $win " +
      s"ELSE ($sold + ${g.ui("delay", 89, 1)}) END)"
  }

  private def storeReturns(d: Dia): String = {
    val f = s"((id * 97 + 11) % $NSs)"
    val ss = ssCols(d, f).toMap
    val src = ssRaw(d, f)
    val g = G(d, "id", "store_returns")
    val retQty = s"((${g.u("retqty")} % (${src.qty})) + 1)"
    val spC = src.spC
    val retAmtC = s"(($retQty) * ($spC))"
    val retTaxC = idiv(retAmtC, "20")
    val cols = Seq(
      "sr_returned_date_sk" -> retDate(g, src.date),
      "sr_return_time_sk" -> g.ui("rettime", NTimeDim),
      "sr_item_sk" -> ss("ss_item_sk"),
      "sr_customer_sk" -> ss("ss_customer_sk"),
      "sr_cdemo_sk" -> ss("ss_cdemo_sk"),
      "sr_hdemo_sk" -> ss("ss_hdemo_sk"),
      "sr_addr_sk" -> ss("ss_addr_sk"),
      "sr_store_sk" -> ss("ss_store_sk"),
      "sr_reason_sk" -> g.ui("reason", NReason, 1),
      "sr_ticket_number" -> ss("ss_ticket_number"),
      "sr_return_quantity" -> retQty,
      "sr_return_amt" -> g.dec2(retAmtC),
      "sr_return_tax" -> g.dec2(retTaxC),
      "sr_return_amt_inc_tax" -> g.dec2(s"($retAmtC + $retTaxC)"),
      "sr_fee" -> g.dec2(g.ui("fee", 10000)),
      "sr_return_ship_cost" -> g.dec2(g.ui("shipcost", 5000)),
      "sr_refunded_cash" -> g.dec2(idiv(retAmtC, "2")),
      "sr_reversed_charge" -> g.dec2(idiv(retAmtC, "4")),
      "sr_store_credit" -> g.dec2(idiv(retAmtC, "8")),
      "sr_net_loss" -> g.dec2(g.ui("netloss", 1500000)))
    render(cols, d.seq(NSr))
  }

  /** Catalog core columns with their planted slices: echo (mirror a store
    * row — q25/q29), magic23 orders (whales buying hot items in July 1999 —
    * q23), loyal orders (q4/q11/q74). */
  private final case class CsRaw(item: String, cust: String, sold: String,
      qty: String, spC: String)

  private def csRaw(d: Dia, idx: String): CsRaw = {
    val g = G(d, idx, "catalog_sales")
    val ord = idiv(idx, ItemsPerCsOrder.toString)
    val go = G(d, ord, "catalog_sales_o")
    val echo = s"(($idx) < $NEcho)"
    val src = ssRaw(d, echoSrc(idx))
    val magic23 = s"(${go.u("magic23")} % 60 = 0)"
    // q54 slice: loyal customers buy Men/shirts items (ids ≡ 55 mod 100,
    // pinned in item()) in July 2000 — loyal customers have enough store
    // tickets that q54's follow-up 3-month revenue window is non-empty.
    val magic54 = s"(${go.u("magic54")} % 80 = 0)"
    val loyal = s"(${go.u("loyal")} % 20 = 0)"
    val item = s"(CASE WHEN $echo THEN ${src.item} " +
      s"WHEN $magic23 THEN ${hotItem(s"(${g.u("hot23")} % 50)")} " +
      s"WHEN $magic54 THEN ((100 * (${g.u("it54")} % 20)) + 56) " +
      s"ELSE ${g.ui("item", NItem, 1)} END)"
    // day 546 = 1999-07-01: July 1999, inside q23's frequent-items years;
    // day 912 = 2000-07-01: q54's anchor month.
    val sold = s"(CASE WHEN $echo THEN ${src.date} " +
      s"WHEN $magic23 THEN (546 + (${go.u("july")} % 31)) " +
      s"WHEN $magic54 THEN (912 + (${go.u("july54")} % 31)) " +
      s"ELSE ${go.ui("solddate", SoldDays)} END)"
    val cust = s"(CASE WHEN $echo THEN ${src.cust} " +
      s"WHEN $magic23 THEN ${whaleCust(s"(${go.u("whale23")} % 50)")} " +
      s"WHEN $magic54 THEN ${loyalCust(s"(${go.u("loyal54")} % 100)")} " +
      s"WHEN $loyal THEN ${loyalCust(s"(${go.u("loyal2")} % 100)")} " +
      s"ELSE ${go.ui("billcust", NCust, 1)} END)"
    val qty = s"(CASE WHEN $echo THEN ${src.qty} ELSE ${g.ui("qty", 100, 1)} END)"
    val spC = s"(CASE WHEN $echo THEN ${src.spC} ELSE (${g.u("sp")} % 60000) END)"
    CsRaw(item, cust, sold, qty, spC)
  }

  private def csCols(d: Dia, idx: String): Seq[(String, String)] = {
    val g = G(d, idx, "catalog_sales")
    val ord = idiv(idx, ItemsPerCsOrder.toString)
    val go = G(d, ord, "catalog_sales_o")
    val raw = csRaw(d, idx)
    val m = Measures(g, raw.qty, raw.spC)
    val sold = raw.sold
    Seq(
      "cs_sold_date_sk" -> sold,
      "cs_sold_time_sk" -> g.ui("soldtime", NTimeDim),
      "cs_ship_date_sk" -> s"($sold + ${g.ui("shipdelay", 120, 2)})",
      "cs_bill_customer_sk" -> raw.cust,
      "cs_bill_cdemo_sk" -> go.ui("billcdemo", NCd, 1),
      "cs_bill_hdemo_sk" -> (s"(CASE WHEN ${g.u("hdnull")} % 50 = 0 " +
        s"THEN cast(NULL as bigint) ELSE ${go.ui("billhdemo", NHd, 1)} END)"),
      "cs_bill_addr_sk" -> go.ui("billaddr", NCa, 1),
      "cs_ship_customer_sk" -> go.ui("shipcust", NCust, 1),
      "cs_ship_cdemo_sk" -> go.ui("shipcdemo", NCd, 1),
      "cs_ship_hdemo_sk" -> go.ui("shiphdemo", NHd, 1),
      "cs_ship_addr_sk" -> go.ui("shipaddr", NCa, 1),
      "cs_call_center_sk" -> go.ui("callcenter", NCc, 1),
      "cs_catalog_page_sk" -> g.ui("catalogpage", NCp, 1),
      "cs_ship_mode_sk" -> g.ui("shipmode", NSm, 1),
      "cs_warehouse_sk" -> g.ui("warehouse", NWh, 1),
      "cs_item_sk" -> raw.item,
      "cs_promo_sk" -> g.ui("promo", NPromo, 1),
      "cs_order_number" -> s"($ord + 1)",
      "cs_quantity" -> raw.qty,
      "cs_wholesale_cost" -> g.dec2(m.wcC),
      "cs_list_price" -> g.dec2(m.lpC),
      "cs_sales_price" -> g.dec2(raw.spC),
      "cs_ext_discount_amt" -> g.dec2(m.extDiscountC),
      "cs_ext_sales_price" -> g.dec2(m.extSalesC),
      "cs_ext_wholesale_cost" -> g.dec2(m.extWholesaleC),
      "cs_ext_list_price" -> g.dec2(m.extListC),
      "cs_ext_tax" -> g.dec2(m.taxC),
      "cs_coupon_amt" -> g.dec2(m.coupC),
      "cs_ext_ship_cost" -> g.dec2(m.shipC),
      "cs_net_paid" -> g.dec2(m.netPaidC),
      "cs_net_paid_inc_tax" -> g.dec2(m.netPaidIncTaxC),
      "cs_net_paid_inc_ship" -> g.dec2(s"(${m.netPaidC} + ${m.shipC})"),
      "cs_net_paid_inc_ship_tax" -> g.dec2(s"(${m.netPaidC} + ${m.shipC} + ${m.taxC})"),
      "cs_net_profit" -> g.dec2(m.netProfitC))
  }

  private def catalogSales(d: Dia): String = render(csCols(d, "id"), d.seq(NCs))

  private def catalogReturns(d: Dia): String = {
    val f = s"((id * 101 + 7) % $NCs)"
    val cs = csCols(d, f).toMap
    val src = csRaw(d, f)
    val g = G(d, "id", "catalog_returns")
    val retQty = s"((${g.u("retqty")} % (${src.qty})) + 1)"
    val spC = src.spC
    val retAmtC = s"(($retQty) * ($spC))"
    val retTaxC = idiv(retAmtC, "20")
    val cols = Seq(
      "cr_returned_date_sk" -> retDate(g, src.sold),
      "cr_returned_time_sk" -> g.ui("rettime", NTimeDim),
      "cr_item_sk" -> cs("cs_item_sk"),
      "cr_refunded_customer_sk" -> cs("cs_bill_customer_sk"),
      "cr_refunded_cdemo_sk" -> cs("cs_bill_cdemo_sk"),
      "cr_refunded_hdemo_sk" -> cs("cs_bill_hdemo_sk"),
      "cr_refunded_addr_sk" -> cs("cs_bill_addr_sk"),
      "cr_returning_customer_sk" -> cs("cs_ship_customer_sk"),
      "cr_returning_cdemo_sk" -> cs("cs_ship_cdemo_sk"),
      "cr_returning_hdemo_sk" -> cs("cs_ship_hdemo_sk"),
      "cr_returning_addr_sk" -> cs("cs_ship_addr_sk"),
      "cr_call_center_sk" -> cs("cs_call_center_sk"),
      "cr_catalog_page_sk" -> cs("cs_catalog_page_sk"),
      "cr_ship_mode_sk" -> cs("cs_ship_mode_sk"),
      "cr_warehouse_sk" -> cs("cs_warehouse_sk"),
      "cr_reason_sk" -> g.ui("reason", NReason, 1),
      "cr_order_number" -> cs("cs_order_number"),
      "cr_return_quantity" -> retQty,
      "cr_return_amount" -> g.dec2(retAmtC),
      "cr_return_tax" -> g.dec2(retTaxC),
      "cr_return_amt_inc_tax" -> g.dec2(s"($retAmtC + $retTaxC)"),
      "cr_fee" -> g.dec2(g.ui("fee", 10000)),
      "cr_return_ship_cost" -> g.dec2(g.ui("shipcost", 5000)),
      "cr_refunded_cash" -> g.dec2(idiv(retAmtC, "2")),
      "cr_reversed_charge" -> g.dec2(idiv(retAmtC, "4")),
      "cr_store_credit" -> g.dec2(idiv(retAmtC, "8")),
      "cr_net_loss" -> g.dec2(g.ui("netloss", 1500000)))
    render(cols, d.seq(NCr))
  }

  /** Web core columns with their planted slices: echo (q58/TPCx-BB q21),
    * loyal orders (q4), and the q85 slice — 1/40 of rows pin qty=1,
    * sales_price in [100,150) and wholesale so net_profit lands in [50,90),
    * matching q85's (price-branch-1 AND profit-branch-3) intersection. */
  private final case class WsRaw(item: String, cust: String, sold: String,
      qty: String, spC: String, magic85: String)

  private def wsRaw(d: Dia, idx: String): WsRaw = {
    val g = G(d, idx, "web_sales")
    val ord = idiv(idx, ItemsPerWsOrder.toString)
    val go = G(d, ord, "web_sales_o")
    val echo = s"(($idx) < $NEcho)"
    val src = ssRaw(d, echoSrc(idx))
    val magic85 = s"(${g.u("magic85")} % 40 = 0)"
    val loyal = s"(${go.u("loyal")} % 20 = 0)"
    val item = s"(CASE WHEN $echo THEN ${src.item} ELSE ${g.ui("item", NItem, 1)} END)"
    val sold = s"(CASE WHEN $echo THEN ${src.date} ELSE ${go.ui("solddate", SoldDays)} END)"
    val cust = s"(CASE WHEN $echo THEN ${src.cust} " +
      s"WHEN $loyal THEN ${loyalCust(s"(${go.u("loyal2")} % 100)")} " +
      s"ELSE ${go.ui("billcust", NCust, 1)} END)"
    val qty = s"(CASE WHEN $echo THEN ${src.qty} WHEN $magic85 THEN 1 " +
      s"ELSE ${g.ui("qty", 100, 1)} END)"
    val spC = s"(CASE WHEN $echo THEN ${src.spC} " +
      s"WHEN $magic85 THEN (10000 + (${g.u("sp85")} % 5000)) " +
      s"ELSE (${g.u("sp")} % 20000) END)"
    WsRaw(item, cust, sold, qty, spC, magic85)
  }

  private def wsCols(d: Dia, idx: String): Seq[(String, String)] = {
    val g = G(d, idx, "web_sales")
    val ord = idiv(idx, ItemsPerWsOrder.toString)
    val go = G(d, ord, "web_sales_o")
    val raw = wsRaw(d, idx)
    val wcC = s"(CASE WHEN ${raw.magic85} THEN (${raw.spC} - (5000 + (${g.u("wc85")} % 4000))) " +
      s"ELSE (${g.u("wc")} % 10000) END)"
    val coupC = s"(CASE WHEN ${raw.magic85} THEN 0 " +
      s"WHEN ${g.u("hascoup")} % 10 = 0 THEN ${g.u("coup")} % 2000000 ELSE 0 END)"
    val m = Measures(g, raw.qty, raw.spC, wcOver = Some(wcC), coupOver = Some(coupC))
    val sold = raw.sold
    Seq(
      "ws_sold_date_sk" -> sold,
      "ws_sold_time_sk" -> g.ui("soldtime", NTimeDim),
      "ws_ship_date_sk" -> s"($sold + ${g.ui("shipdelay", 120, 2)})",
      "ws_item_sk" -> raw.item,
      "ws_bill_customer_sk" -> raw.cust,
      "ws_bill_cdemo_sk" -> go.ui("billcdemo", NCd, 1),
      "ws_bill_hdemo_sk" -> go.ui("billhdemo", NHd, 1),
      "ws_bill_addr_sk" -> go.ui("billaddr", NCa, 1),
      "ws_ship_customer_sk" -> go.ui("shipcust", NCust, 1),
      "ws_ship_cdemo_sk" -> go.ui("shipcdemo", NCd, 1),
      "ws_ship_hdemo_sk" -> go.ui("shiphdemo", NHd, 1),
      "ws_ship_addr_sk" -> go.ui("shipaddr", NCa, 1),
      "ws_web_page_sk" -> g.ui("webpage", NWp, 1),
      "ws_web_site_sk" -> go.ui("website", NWeb, 1),
      "ws_ship_mode_sk" -> g.ui("shipmode", NSm, 1),
      "ws_warehouse_sk" -> (s"(CASE WHEN ${g.u("whnull")} % 50 = 0 " +
        s"THEN cast(NULL as bigint) ELSE ${g.ui("warehouse", NWh, 1)} END)"),
      "ws_promo_sk" -> g.ui("promo", NPromo, 1),
      "ws_order_number" -> s"($ord + 1)",
      "ws_quantity" -> raw.qty,
      "ws_wholesale_cost" -> g.dec2(m.wcC),
      "ws_list_price" -> g.dec2(m.lpC),
      "ws_sales_price" -> g.dec2(raw.spC),
      "ws_ext_discount_amt" -> g.dec2(m.extDiscountC),
      "ws_ext_sales_price" -> g.dec2(m.extSalesC),
      "ws_ext_wholesale_cost" -> g.dec2(m.extWholesaleC),
      "ws_ext_list_price" -> g.dec2(m.extListC),
      "ws_ext_tax" -> g.dec2(m.taxC),
      "ws_coupon_amt" -> g.dec2(m.coupC),
      "ws_ext_ship_cost" -> g.dec2(m.shipC),
      "ws_net_paid" -> g.dec2(m.netPaidC),
      "ws_net_paid_inc_tax" -> g.dec2(m.netPaidIncTaxC),
      "ws_net_paid_inc_ship" -> g.dec2(s"(${m.netPaidC} + ${m.shipC})"),
      "ws_net_paid_inc_ship_tax" -> g.dec2(s"(${m.netPaidC} + ${m.shipC} + ${m.taxC})"),
      "ws_net_profit" -> g.dec2(m.netProfitC))
  }

  private def webSales(d: Dia): String = render(wsCols(d, "id"), d.seq(NWs))

  private def webReturns(d: Dia): String = {
    val f = s"((id * 89 + 3) % $NWs)"
    val ws = wsCols(d, f).toMap
    val src = wsRaw(d, f)
    val g = G(d, "id", "web_returns")
    val retQty = s"((${g.u("retqty")} % (${src.qty})) + 1)"
    val spC = src.spC
    val retAmtC = s"(($retQty) * ($spC))"
    val retTaxC = idiv(retAmtC, "20")
    // q85 pins: returns of the magic85 web rows refund to a ('U','Advanced
    // Degree') demographic pair (same cd for refunded and returning — the
    // common ship-to = bill-to case) at a Wisconsin address, completing the
    // demographic/price/profit/state branch intersection.
    val m85 = src.magic85
    val cd85 = cdUAdv(g.u("cd85"))
    val cols = Seq(
      "wr_returned_date_sk" -> retDate(g, src.sold),
      "wr_returned_time_sk" -> g.ui("rettime", NTimeDim),
      "wr_item_sk" -> ws("ws_item_sk"),
      "wr_refunded_customer_sk" -> ws("ws_bill_customer_sk"),
      "wr_refunded_cdemo_sk" -> s"(CASE WHEN $m85 THEN $cd85 ELSE ${ws("ws_bill_cdemo_sk")} END)",
      "wr_refunded_hdemo_sk" -> ws("ws_bill_hdemo_sk"),
      "wr_refunded_addr_sk" -> (s"(CASE WHEN $m85 THEN ${caWi(g.u("ad85"))} " +
        s"ELSE ${ws("ws_bill_addr_sk")} END)"),
      "wr_returning_customer_sk" -> ws("ws_ship_customer_sk"),
      "wr_returning_cdemo_sk" -> s"(CASE WHEN $m85 THEN $cd85 ELSE ${ws("ws_ship_cdemo_sk")} END)",
      "wr_returning_hdemo_sk" -> ws("ws_ship_hdemo_sk"),
      "wr_returning_addr_sk" -> ws("ws_ship_addr_sk"),
      "wr_web_page_sk" -> ws("ws_web_page_sk"),
      "wr_reason_sk" -> g.ui("reason", NReason, 1),
      "wr_order_number" -> ws("ws_order_number"),
      "wr_return_quantity" -> retQty,
      "wr_return_amt" -> g.dec2(retAmtC),
      "wr_return_tax" -> g.dec2(retTaxC),
      "wr_return_amt_inc_tax" -> g.dec2(s"($retAmtC + $retTaxC)"),
      "wr_fee" -> g.dec2(g.ui("fee", 10000)),
      "wr_return_ship_cost" -> g.dec2(g.ui("shipcost", 5000)),
      "wr_refunded_cash" -> g.dec2(idiv(retAmtC, "2")),
      "wr_reversed_charge" -> g.dec2(idiv(retAmtC, "4")),
      "wr_account_credit" -> g.dec2(idiv(retAmtC, "8")),
      "wr_net_loss" -> g.dec2(g.ui("netloss", 1500000)))
    render(cols, d.seq(NWr))
  }

  private def inventory(d: Dia): String = {
    val g = G(d, "id", "inventory")
    // Heavy-tailed on-hand quantity: a mostly-small base (0..399, keeping
    // q37's 100..500 window selective) with 1/8 large-negative and 1/8
    // large-positive spikes — monthly cells mixing both spike signs reach
    // the coefficient-of-variation >= 1.3 that TPCx-BB q23 scans for, which
    // a uniform draw can never produce (cov of uniform ≈ 0.58).
    val spike = s"(${g.u("spike")} % 8)"
    val qoh = s"(CASE WHEN $spike = 0 THEN (0 - (500 + (${g.u("neg")} % 500))) " +
      s"WHEN $spike = 1 THEN (2000 + (${g.u("pos")} % 1500)) " +
      s"ELSE (${g.u("qoh")} % 400) END)"
    val cols = Seq(
      "inv_date_sk" -> s"(${idiv("id", (NItem * NWh).toString)} * 7)",
      "inv_item_sk" -> s"(id % $NItem + 1)",
      "inv_warehouse_sk" -> s"(${idiv("id", NItem.toString)} % $NWh + 1)",
      "inv_quantity_on_hand" -> qoh)
    render(cols, d.seq(NInv))
  }

  /** All 24 tables in DDL-registration order (initialize.sql). */
  val tables: Seq[(String, Dia => String)] = Seq(
    "customer_address" -> customerAddress _,
    "customer_demographics" -> customerDemographics _,
    "date_dim" -> dateDim _,
    "warehouse" -> warehouse _,
    "ship_mode" -> shipMode _,
    "time_dim" -> timeDim _,
    "reason" -> reason _,
    "income_band" -> incomeBand _,
    "item" -> item _,
    "store" -> store _,
    "call_center" -> callCenter _,
    "customer" -> customer _,
    "web_site" -> webSite _,
    "store_returns" -> storeReturns _,
    "household_demographics" -> householdDemographics _,
    "web_page" -> webPage _,
    "promotion" -> promotion _,
    "catalog_page" -> catalogPage _,
    "inventory" -> inventory _,
    "catalog_returns" -> catalogReturns _,
    "web_returns" -> webReturns _,
    "web_sales" -> webSales _,
    "catalog_sales" -> catalogSales _,
    "store_sales" -> storeSales _)
}
