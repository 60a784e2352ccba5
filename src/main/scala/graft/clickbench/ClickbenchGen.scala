package graft.clickbench

import graft.tpcds.TpcdsGen.{Dia, SparkDia, DuckDia}

/** Deterministic, closed-form ClickBench `hits` table (the full 105-column
  * web-analytics schema from the reference's resources/sql/clickbench/
  * create.sql), rendered identically in Spark SQL and DuckDB SQL — same
  * closed-form dual-dialect scheme as TpcdsGen/JobGen/SsbGen. The real
  * dataset is a 14 GB download (ClickHouse's public hits sample);
  * distributions here are seeded so every workload predicate selects a
  * non-trivial subset: CounterID 62 on ~1/3 of rows, URL/Title/Referer
  * composed from domains including google variants (LIKE '%google%' vs NOT
  * LIKE '%.google.%' distinguish), SearchPhrase '' on ~60%, the workload's
  * magic UserID/URLHash/RefererHash constants planted on a few rows, and
  * EventTime strictly unique (micros carry the row id) so ORDER BY
  * EventTime LIMIT k is total.
  *
  * EventDate == date(EventTime) by construction — queries conjoin date
  * ranges with minute-level grouping and both must see the same day. */
object ClickbenchGen {

  /** Bench-only scale multiplier (GRAFT_CB_SCALE, default 1; the
    * correctness gate always runs at 1). ClickBench is one fact table, so
    * scaling is just more hits rows; fractional plantings (magic URLHash
    * ~1/13, CounterID 62 on ~1/3) scale with it, and the same interpolated
    * size reaches the DuckDB oracle. */
  val Scale: Long = {
    val s = sys.env.getOrElse("GRAFT_CB_SCALE", "1").toLong
    require(s >= 1, s"GRAFT_CB_SCALE=$s")
    s
  }

  val NHits = 1000000L * Scale

  private val domains = Seq("google.com", "mail.google.com", "example.com",
    "news.site.ru", "shop.example.org", "video.portal.net", "blog.example.com",
    "maps.example.io", "wiki.site.org", "forum.portal.ru")
  private val paths = Seq("index", "search", "item", "cart", "profile",
    "watch", "read", "list", "top", "help")
  private val titles = Seq("Google Search", "Welcome Page", "Google Maps",
    "News Feed", "Shop Catalog", "Video Player", "Blog Post", "Wiki Article",
    "Forum Thread", "Help Center")
  private val phrases = Seq("cheap flights", "weather today", "google mail",
    "best laptop", "movie times", "pizza near me", "translate text",
    "currency rates", "football scores", "music charts")
  private val phoneModels = Seq("iPhone 5", "iPhone 4s", "Galaxy S4",
    "Nexus 4", "Lumia 920", "Xperia Z")
  private val charsets = Seq("utf-8", "windows-1251", "iso-8859-1")
  private val langs = Seq("en", "ru", "de", "fr")
  private val countries = Seq("US", "RU", "DE", "FR", "GB")

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

  /** timestamp from micros since epoch — dialect-portable and exact. */
  private def tsOf(d: Dia, micros: String): String = d match {
    case SparkDia => s"timestamp_micros($micros)"
    case _ => s"make_timestamp($micros)"
  }

  def hits(d: Dia): String = {
    val g = G(d, "hits")
    // 2013-07-01 is epoch day 15887; 31 days of data
    val day = s"(${g.u("day")} % 31)"
    val sec = s"(${g.u("sec")} % 86400)"
    val evMicros = s"(((15887 + $day) * 86400 + $sec) * 1000000 + id)"
    val evTime = tsOf(d, evMicros)
    val evDate = d.dateAdd(s"($day + 5660)") // 1998-01-01 + 5660 = 2013-07-01
    val url = s"CASE WHEN ${g.u("u0")} % 10 = 0 THEN '' ELSE " +
      s"('http://' || ${g.pick("dom", domains)} || '/' || ${g.pick("pth", paths)} " +
      s"|| '/' || ${d.str(g.ui("pid", 1000))}) END"
    // Referer host is skewed: half the draws concentrate on two domains so
    // q29's HAVING COUNT(*) > 100000 (per regexp-extracted host) is satisfied
    // by ~2 groups at 1M rows (~240k each); a uniform 10-way split tops out
    // at ~80k per host and made q29 empty.
    val rdom = s"CASE WHEN ${g.u("rskew")} % 4 < 2 THEN " +
      s"${d.elem(Seq("example.com", "news.site.ru"), s"(${g.u("rskew")} % 2)")} " +
      s"ELSE ${g.pick("rdom", domains)} END"
    val referer = s"CASE WHEN ${g.u("r0")} % 5 = 0 THEN '' ELSE " +
      s"('https://www.' || $rdom || '/' || ${g.pick("rpth", paths)} " +
      s"|| '/' || ${d.str(g.ui("rid", 1000))}) END"
    val phrase = s"CASE WHEN ${g.u("p0")} % 5 < 3 THEN '' ELSE " +
      s"${g.pick("ph", phrases)} END"
    val userId = s"CASE WHEN id = 424242 THEN 435090932899640449 ELSE " +
      s"${g.ui("uid", 200000L, 1)} END"
    // Magic URLHash on ~1/13 of rows: q42 pages past OFFSET 10000 groups of
    // (width, height) under URLHash = const ∧ CounterID = 62 ∧ flag filters —
    // that needs >10k distinct surviving pairs, i.e. ≳20k matching rows
    // (1M/13 /3 × 0.81 ≈ 21k). The previous 1/97 left ~2.8k and q42 empty.
    val urlHash = s"CASE WHEN ${g.u("uh0")} % 13 = 0 THEN 2868770270353813622 " +
      s"ELSE ${g.u("uh")} END"
    val refHash = s"CASE WHEN ${g.u("rh0")} % 89 = 0 THEN 3594120000172545465 " +
      s"ELSE ${g.u("rh")} END"
    val cols = Seq(
      "WatchID" -> s"(id * 2654435761 + ${g.u("w")})",
      "JavaEnable" -> s"(${g.u("je")} % 2)",
      "Title" -> (s"CASE WHEN ${g.u("t0")} % 10 = 0 THEN '' ELSE " +
        s"(${g.pick("ti", titles)} || ' ' || ${d.str(g.ui("tid", 500))}) END"),
      "GoodEvent" -> "1",
      "EventTime" -> evTime,
      "EventDate" -> evDate,
      "CounterID" -> s"CASE WHEN ${g.u("c0")} % 3 = 0 THEN 62 ELSE ${g.ui("cid", 200, 1)} END",
      "ClientIP" -> g.ui("ip", 100000L),
      "RegionID" -> g.ui("reg", 200),
      "UserID" -> userId,
      "CounterClass" -> s"(${g.u("cc")} % 3)",
      "OS" -> g.ui("os", 80),
      "UserAgent" -> g.ui("ua", 80),
      "URL" -> url,
      "Referer" -> referer,
      "IsRefresh" -> s"CASE WHEN ${g.u("ir")} % 10 = 0 THEN 1 ELSE 0 END",
      "RefererCategoryID" -> g.ui("rc", 100),
      "RefererRegionID" -> g.ui("rr", 200),
      "URLCategoryID" -> g.ui("uc", 100),
      "URLRegionID" -> g.ui("ur", 200),
      "ResolutionWidth" -> g.ui("rw", 2000, 100),
      "ResolutionHeight" -> g.ui("rhh", 1200, 100),
      "ResolutionDepth" -> s"(8 + (${g.u("rd")} % 4) * 8)",
      "FlashMajor" -> g.ui("fma", 12),
      "FlashMinor" -> g.ui("fmi", 10),
      "FlashMinor2" -> s"(${d.str(g.ui("fm2", 500))})",
      "NetMajor" -> g.ui("nma", 5),
      "NetMinor" -> g.ui("nmi", 10),
      "UserAgentMajor" -> g.ui("uam", 40),
      "UserAgentMinor" -> s"(${d.str(g.ui("uan", 100))})",
      "CookieEnable" -> s"(${g.u("ce")} % 2)",
      "JavascriptEnable" -> "1",
      "IsMobile" -> s"CASE WHEN ${g.u("im")} % 4 = 0 THEN 1 ELSE 0 END",
      "MobilePhone" -> g.ui("mp", 10),
      "MobilePhoneModel" -> (s"CASE WHEN ${g.u("mm0")} % 4 = 0 THEN " +
        s"${g.pick("mm", phoneModels)} ELSE '' END"),
      "Params" -> "''",
      "IPNetworkID" -> g.ui("ipn", 10000L),
      "TraficSourceID" -> s"((${g.u("ts")} % 12) - 1)",
      "SearchEngineID" -> s"(${g.u("se")} % 4)",
      "SearchPhrase" -> phrase,
      "AdvEngineID" -> s"CASE WHEN ${g.u("ae")} % 5 = 0 THEN 1 + (${g.u("ae2")} % 5) ELSE 0 END",
      "IsArtifical" -> s"(${g.u("ia")} % 2)",
      "WindowClientWidth" -> g.ui("wcw", 2000, 100),
      "WindowClientHeight" -> g.ui("wch", 1200, 100),
      "ClientTimeZone" -> s"((${g.u("tz")} % 25) - 12)",
      "ClientEventTime" -> tsOf(d, s"($evMicros + 500000)"),
      "SilverlightVersion1" -> s"(${g.u("s1")} % 6)",
      "SilverlightVersion2" -> s"(${g.u("s2")} % 2)",
      "SilverlightVersion3" -> g.ui("s3", 1000),
      "SilverlightVersion4" -> g.ui("s4", 100),
      "PageCharset" -> g.pick("pc", charsets),
      "CodeVersion" -> g.ui("cv", 1000),
      "IsLink" -> s"CASE WHEN ${g.u("il")} % 5 = 0 THEN 1 ELSE 0 END",
      "IsDownload" -> s"CASE WHEN ${g.u("idl")} % 20 = 0 THEN 1 ELSE 0 END",
      "IsNotBounce" -> s"(${g.u("inb")} % 2)",
      "FUniqID" -> g.u("fu"),
      "OriginalURL" -> "''",
      "HID" -> g.ui("hid", 100000L),
      "IsOldCounter" -> s"(${g.u("ioc")} % 2)",
      "IsEvent" -> s"(${g.u("ie")} % 2)",
      "IsParameter" -> s"(${g.u("ipa")} % 2)",
      "DontCountHits" -> s"CASE WHEN ${g.u("dch")} % 10 = 0 THEN 1 ELSE 0 END",
      "WithHash" -> s"(${g.u("wh")} % 2)",
      "HitColor" -> g.pick("hc", Seq("w", "g", "y")),
      "LocalEventTime" -> tsOf(d, s"($evMicros + 3600000000)"),
      "Age" -> g.ui("age", 70),
      "Sex" -> s"(${g.u("sex")} % 3)",
      "Income" -> s"(${g.u("inc")} % 6)",
      "Interests" -> g.ui("int", 10000L),
      "Robotness" -> s"(${g.u("rob")} % 3)",
      "RemoteIP" -> g.ui("rip", 100000L),
      "WindowName" -> s"((${g.u("wn")} % 100) - 1)",
      "OpenerName" -> s"((${g.u("on")} % 100) - 1)",
      "HistoryLength" -> s"((${g.u("hl")} % 30) - 1)",
      "BrowserLanguage" -> g.pick("bl", langs),
      "BrowserCountry" -> g.pick("bc", countries),
      "SocialNetwork" -> "''",
      "SocialAction" -> "''",
      "HTTPError" -> s"CASE WHEN ${g.u("he")} % 50 = 0 THEN 404 ELSE 0 END",
      "SendTiming" -> g.ui("st", 1000),
      "DNSTiming" -> g.ui("dt", 500),
      "ConnectTiming" -> g.ui("ct", 500),
      "ResponseStartTiming" -> g.ui("rst", 2000),
      "ResponseEndTiming" -> g.ui("ret", 4000),
      "FetchTiming" -> g.ui("ft", 4000),
      "SocialSourceNetworkID" -> s"(${g.u("ssn")} % 10)",
      "SocialSourcePage" -> "''",
      "ParamPrice" -> g.ui("pp", 100000L),
      "ParamOrderID" -> "''",
      "ParamCurrency" -> "'USD'",
      "ParamCurrencyID" -> g.ui("pci", 10),
      "OpenstatServiceName" -> "''",
      "OpenstatCampaignID" -> "''",
      "OpenstatAdID" -> "''",
      "OpenstatSourceID" -> "''",
      "UTMSource" -> "''",
      "UTMMedium" -> "''",
      "UTMCampaign" -> "''",
      "UTMContent" -> "''",
      "UTMTerm" -> "''",
      "FromTag" -> "''",
      "HasGCLID" -> s"(${g.u("hg")} % 2)",
      "RefererHash" -> refHash,
      "URLHash" -> urlHash,
      "CLID" -> g.ui("clid", 1000))
    cols.map { case (n, e) => s"$e AS $n" }
      .mkString("SELECT ", ", ", s" FROM ${d.seq(NHits)}")
  }
}
