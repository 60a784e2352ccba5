package graft.job

import graft.tpcds.TpcdsGen.{Dia, SparkDia, DuckDia}

/** Deterministic, closed-form IMDB dataset for the Join Order Benchmark.
  *
  * The reference runs JOB's 113 queries (resources/sql/job, scored by
  * test/sqlite-datasets/job.test) over the real IMDB snapshot its generator
  * downloads (tools/generate/job.sh — a 1.2 GB network fetch, unavailable
  * here). As with [[graft.tpcds.TpcdsGen]], every table of the 21-table
  * schema (resources/sql/job/initialize.sql) is instead a pure closed-form
  * expression over a row index, rendered identically in Spark SQL and DuckDB
  * SQL, so both engines materialize bit-identical tables and the DuckDB
  * hash-compare is a true oracle for all 113 query texts.
  *
  * The golden job.test answers depend on the real IMDB rows and are NOT
  * reproducible from synthetic data; what this suite checks is that the
  * engine computes the same answer DuckDB does on the same inputs for every
  * JOB query shape (5-17 way joins, LIKE-heavy filters, NULL-sensitive
  * predicates).
  *
  * Domains are seeded from the literals the 113 queries filter on
  * (country codes, info kinds, note fragments, name/title fragments, rating
  * strings), so the selective predicates — `LIKE '%(voice)%'`,
  * `country_code = '[ru]'`, `info > '8.0'` — match non-trivial subsets
  * instead of degenerating to empty results.
  */
object JobGen {

  // ------------------------------------------------------------------- sizes

  /** Bench-only scale multiplier for the movie-linked tables
    * (GRAFT_JOB_SCALE, default 1; correctness gate always runs at 1).
    * Scaling grows `title` and its satellites — the IMDB shape at larger
    * snapshots: more movies against near-constant entity dimensions
    * (people/companies/keywords), i.e. more movies per company/person.
    * The same interpolated sizes reach both dialects, so the DuckDB
    * oracle builds the identical scaled tables. */
  val Scale: Long = {
    val s = sys.env.getOrElse("GRAFT_JOB_SCALE", "1").toLong
    require(s >= 1, s"GRAFT_JOB_SCALE=$s")
    s
  }

  val NKind = 7L
  val NCompType = 4L
  val NRole = 12L
  val NLink = 18L
  val NCompCast = 4L
  val NInfoType = 113L
  val NKeyword = 5000L
  val NCompanyName = 10000L
  val NCharName = 30000L
  val NName = 60000L
  val NAkaName = 30000L
  val NTitle = 50000L * Scale
  val NAkaTitle = 8000L * Scale
  val NCastInfo = 200000L * Scale
  val NMc = 80000L * Scale
  val NMi = 150000L * Scale
  val NMiIdx = 60000L * Scale
  val NMk = 100000L * Scale
  val NMl = 30000L * Scale
  val NPi = 40000L
  val NCc = 25000L * Scale

  // ---------------------------------------------------------------- domains
  // Seeded from the predicate literals of resources/sql/job/*.sql.

  private val kinds = Seq("movie", "tv series", "tv movie", "video movie",
    "tv mini series", "video game", "episode")
  private val compTypes = Seq("production companies", "distributors",
    "special effects companies", "miscellaneous companies")
  private val roles = Seq("actor", "actress", "producer", "writer",
    "cinematographer", "composer", "costume designer", "director", "editor",
    "miscellaneous crew", "production designer", "guest")
  private val links = Seq("follows", "followed by", "remake of", "remade as",
    "references", "referenced in", "spoofs", "spoofed in", "features",
    "featured in", "spin off from", "spin off", "version of", "similar to",
    "edited into", "edited from", "alternate language version of", "sequel")
  private val compCastTypes = Seq("cast", "crew", "complete",
    "complete+verified")
  private val infoTypeSeeds = Seq("top 250 rank", "bottom 10 rank", "rating",
    "votes", "genres", "release dates", "countries", "languages", "budget",
    "mini biography", "trivia", "height")
  private[job] val infoTypes: Seq[String] =
    infoTypeSeeds ++ (infoTypeSeeds.length until NInfoType.toInt)
      .map(i => s"info type $i")
  private val keywordSeeds = Seq("sequel", "character-name-in-title",
    "murder", "violence", "blood", "gore", "fight", "superhero",
    "marvel-comics", "based-on-comic", "murder-in-title", "female-nudity",
    "death", "tv-special", "second-part", "martial-arts",
    "hand-to-hand-combat", "revenge", "hero", "based-on-novel",
    "computer-animation", "computer-animated-movie", "10,000-mile-club",
    "claw", "laser", "web", "features", "nerd", "loner", "alienation",
    "dignity", "hospital", "marvel-cinematic-universe", "fight-scene",
    "dark-hero", "vampire", "magnet", "cyborg", "bomb", "flashback")
  private val companyBases = Seq("Warner Bros. Entertainment",
    "Lionsgate Films", "Twentieth Century Fox Film Corporation",
    "20th Century Fox Home Entertainment", "DreamWorks Animation", "YouTube",
    "Metro-Goldwyn-Mayer Pictures", "Churchill Films", "Universal Pictures",
    "Paramount Film Service", "Canal+ Film", "Polish Film Institute",
    "Sveriges Television", "Nordisk Film", "Marvel Studios",
    "Castle Rock Entertainment", "New Line Cinema", "Legendary Pictures",
    "Studio Babelsberg Film", "Toho Film")
  private val countryCodes = Seq("[us]", "[us]", "[us]", "[de]", "[pl]",
    "[ru]", "[nl]", "[jp]", "[sm]", "[fr]", "[gb]", "[it]", "[se]", "[dk]",
    "[no]", "[fi]", "[ca]", "[au]", "[in]", "[cn]")
  private val charBases = Seq("Tony Stark", "Iron Man", "Sherlock Holmes",
    "Angel", "Queen", "Batman", "Himself", "Superman", "James Bond",
    "Dracula", "Spider-Man", "Jason Voorhees", "Freddy Krueger",
    "The Champion", "A Loser", "Captain America", "Tony Montana",
    "Old Woman", "Doctor Watson", "Evil Queen")
  private val lastNames = Seq("Smith", "Johnson", "Downey Jr.", "Stark",
    "Bert", "Timberlake", "Yusuf", "Yoder", "Anger", "Angelo", "Garcia",
    "Mueller", "Johansson", "Nakamura", "Kowalski", "Ivanov", "Larsson",
    "Hansen", "Zimmermann", "Zhang", "Xu", "Berg", "Lindgren", "Virtanen",
    "Papadopoulos", "Rossi", "Dubois", "Novak", "Silva", "Kim")
  private val firstNames = Seq("Robert", "James", "Mary", "Anna", "Angela",
    "Bert", "Tim", "Jason", "Yu", "Yolanda", "An", "Ang", "Maria", "Hans",
    "Sven", "Nils", "Ingrid", "Astrid", "Kenji", "Yuki", "Piotr", "Olga",
    "Dmitri", "Elena", "Lars", "Erik", "Greta", "Marco", "Sofia", "Li")
  private val pcodes = Seq("A536", "B2153", "C4152", "D436", "E1452", "F452",
    "G5123", "H245", "K123", "M635", "P362", "S530", "T516", "Z525")
  private val titleBases = Seq("Shrek 2", "Saw", "One Piece",
    "Kung Fu Panda", "Dragon Ball Z", "Birdemic", "Champion", "Money Train",
    "Freddy vs Jason", "Iron Man", "Sherlock Holmes", "12 Rounds",
    "Batman Beyond", "Loser", "Vampire Diaries", "An American Crime",
    "A Movie of Dreams", "Der Mord", "Murder at Midnight", "The Money Man",
    "Xtro", "Zodiac", "Dark Knight", "Evil Eyes", "Spider-man Fan Film",
    "Bandidas", "Quantum of Solace", "Young Woman in Berlin",
    "House of Usher", "The Champion Returns")
  private val ciNotes = Seq("(voice)", "(voice: English version)",
    "(voice: Japanese version)", "(voice) (uncredited)", "(writer)",
    "(head writer)", "(written by)", "(story)", "(story editor)",
    "(producer)", "(executive producer)", "(uncredited)",
    "(archive footage)", "(as himself)")
  private val mcNotes = Seq("(as Metro-Goldwyn-Mayer Pictures)",
    "(co-production)", "(presents)", "(2006) (USA) (theatrical)",
    "(2007) (worldwide)", "(1994) (VHS)", "(2008) (USA) (TV)",
    "(2005) (France) (theatrical)", "(2006) (Japan) (DVD)", "(worldwide)",
    "(Japan)", "(USA) (Blu-ray)", "(2010) (worldwide) (theatrical)",
    "(1994) (USA) (VHS)", "(2008) (USA) (VHS)",
    "(199") // truncated real-world junk note; exercises non-matching rows
  private val genres = Seq("Drama", "Horror", "Thriller", "Sci-Fi", "Crime",
    "Action", "War", "Western", "Family", "Comedy", "Adventure",
    "Documentary", "Romance", "Mystery")
  private val miCountries = Seq("Germany", "Sweden", "Norway", "Denmark",
    "USA", "America", "American", "Bulgaria", "Japan", "France", "Italy",
    "UK", "Poland", "Finland", "Canada", "Australia")
  private val languages = Seq("German", "Swedish", "Norwegian", "Denish",
    "Danish", "English", "Japanese", "French", "Italian", "Polish",
    "Spanish", "Dutch")
  private val rdRegions = Seq("USA", "Japan", "Germany", "UK", "France",
    "Sweden")
  private val months = Seq("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")
  private val miNotes = Seq("(internet)", "(worldwide)", "(original version)",
    "(DVD)", "anime")
  private val piNotes = Seq("Volker Boehm", "anonymous", "IMDb editors")

  // ----------------------------------------------------------------- helpers

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Per-(table, column) pseudo-random stream over the row index `id`.
    *
    * Stronger mixing than TpcdsGen's single multiply-xor round: JOB's query
    * graphs chain 5-17 FK equalities through value-derived row ids, and
    * purely affine per-column streams leak correlations across those
    * compositions (observed: movies reachable via a filtered cast_info ⋈
    * movie_companies pair systematically avoided production_year > 2003,
    * zeroing a whole query family). Two xorshift rounds between the
    * multiplies (splitmix-style) break the linearity; integer ops only, so
    * Spark and DuckDB still compute bit-identical streams. */
  private final case class G(d: Dia, tab: String) {
    def u(key: String): String = {
      val salt = (((tab + "." + key).hashCode.toLong & 0x7fffffffL) *
        2654435761L) % 4294967296L
      val a = d.xor("((id * 2654435761) % 4294967296)", salt.toString)
      val b = s"(($a) * 48271 % 2147483647)"
      val c = d.xor(s"($b)", d.shr(s"($b)", 15))
      val e = s"(($c) * 69621 % 2147483647)"
      val f = d.xor(s"($e)", d.shr(s"($e)", 13))
      s"(($f) * 16807 % 2147483647)"
    }
    def ui(key: String, n: Long, off: Long = 0): String =
      s"((${u(key)} % $n) + $off)"
    def pick(key: String, vals: Seq[String]): String =
      d.elem(vals, s"(${u(key)} % ${vals.length})")
    /** NULL with probability num/den, else `e` (string-typed). */
    def nullable(key: String, num: Int, den: Int, e: String): String =
      s"CASE WHEN ${u(key)} % $den < $num THEN ${d.nullStr} ELSE $e END"
    def nullableInt(key: String, num: Int, den: Int, e: String): String =
      s"CASE WHEN ${u(key)} % $den < $num THEN cast(NULL as int) ELSE $e END"
  }

  private def render(cols: Seq[(String, String)], src: String): String =
    cols.map { case (n, e) => s"$e AS $n" }.mkString("SELECT ", ", ", s" FROM $src")

  /** Production year skewed toward the present, like the real IMDB snapshot
    * (the workload filters `> 2000/2005/2010` constantly; a uniform
    * 1930-2014 draw would zero those families): 2014 - floor((u%85)²/85)
    * puts ~33% of titles past 2005 and ~22% past 2010. */
  private def skewYear(u: String): String =
    s"(2015 - cast(floor((($u % 86) * ($u % 86)) / 86.0) as bigint))"

  /** pk ids are 1-based: the queries join on `x.id = y.x_id`. */
  private val pk = "(id + 1)"

  // ------------------------------------------------------------------ tables

  private def kindType(d: Dia): String =
    render(Seq("id" -> pk, "kind" -> d.elem(kinds, "id")), d.seq(NKind))

  private def companyType(d: Dia): String =
    render(Seq("id" -> pk, "kind" -> d.elem(compTypes, "id")), d.seq(NCompType))

  private def roleType(d: Dia): String =
    render(Seq("id" -> pk, "role" -> d.elem(roles, "id")), d.seq(NRole))

  private def linkType(d: Dia): String =
    render(Seq("id" -> pk, "link" -> d.elem(links, "id")), d.seq(NLink))

  private def compCastType(d: Dia): String =
    render(Seq("id" -> pk, "kind" -> d.elem(compCastTypes, "id")),
      d.seq(NCompCast))

  private def infoType(d: Dia): String =
    render(Seq("id" -> pk, "info" -> d.elem(infoTypes, "id")), d.seq(NInfoType))

  private def keyword(d: Dia): String = {
    val g = G(d, "keyword")
    val kw = s"CASE WHEN id < ${keywordSeeds.length} THEN ${d.elem(keywordSeeds, "id")} " +
      s"ELSE 'kw-' || ${d.str("id")} END"
    render(Seq(
      "id" -> pk,
      "keyword" -> kw,
      "phonetic_code" -> g.nullable("pc", 1, 10, g.pick("pcv", pcodes))),
      d.seq(NKeyword))
  }

  private def companyName(d: Dia): String = {
    val g = G(d, "company_name")
    val base = g.pick("base", companyBases)
    render(Seq(
      "id" -> pk,
      "name" -> s"($base || ' ' || ${d.str(g.ui("sfx", 50))})",
      "country_code" -> g.nullable("ccn", 1, 20, g.pick("cc", countryCodes)),
      "imdb_id" -> g.nullableInt("ii", 9, 10, g.ui("iiv", 999999).toString),
      "name_pcode_nf" -> g.pick("pn", pcodes),
      "name_pcode_sf" -> g.pick("ps", pcodes),
      "md5sum" -> s"('m' || ${d.str("id")})"), d.seq(NCompanyName))
  }

  private def charName(d: Dia): String = {
    val g = G(d, "char_name")
    val base = g.pick("base", charBases)
    // 1-in-8 rows carry the bare base name so equality predicates
    // (chn.name = 'Queen') match; the rest get a numeric disambiguator
    val nm = s"CASE WHEN ${g.u("exact")} % 8 = 0 THEN $base " +
      s"ELSE ($base || ' ' || ${d.str(g.ui("sfx", 97))}) END"
    render(Seq(
      "id" -> pk,
      "name" -> nm,
      "imdb_index" -> g.nullable("ix", 9, 10, s"'I'"),
      "imdb_id" -> g.nullableInt("ii", 1, 1, "0"),
      "name_pcode_nf" -> g.pick("pn", pcodes),
      "surname_pcode" -> g.nullable("sp", 1, 5, g.pick("spv", pcodes)),
      "md5sum" -> s"('m' || ${d.str("id")})"), d.seq(NCharName))
  }

  private def nameT(d: Dia): String = {
    val g = G(d, "name")
    val nm = s"(${g.pick("ln", lastNames)} || ', ' || ${g.pick("fn", firstNames)})"
    render(Seq(
      "id" -> pk,
      "name" -> nm,
      "imdb_index" -> g.nullable("ix", 9, 10, s"'I'"),
      "imdb_id" -> g.nullableInt("ii", 1, 1, "0"),
      "gender" -> g.nullable("g0", 1, 10, g.pick("g", Seq("m", "f"))),
      "name_pcode_cf" -> g.pick("pc", pcodes),
      "name_pcode_nf" -> g.pick("pn", pcodes),
      "surname_pcode" -> g.nullable("sp", 1, 5, g.pick("spv", pcodes)),
      "md5sum" -> s"('m' || ${d.str("id")})"), d.seq(NName))
  }

  private def akaName(d: Dia): String = {
    val g = G(d, "aka_name")
    val nm = s"(${g.pick("ln", lastNames)} || ', ' || ${g.pick("fn", firstNames)})"
    render(Seq(
      "id" -> pk,
      "person_id" -> g.ui("pid", NName, 1),
      "name" -> nm,
      "imdb_index" -> g.nullable("ix", 9, 10, s"'I'"),
      "name_pcode_cf" -> g.pick("pc", pcodes),
      "name_pcode_nf" -> g.pick("pn", pcodes),
      "surname_pcode" -> g.nullable("sp", 1, 5, g.pick("spv", pcodes)),
      "md5sum" -> s"('m' || ${d.str("id")})"), d.seq(NAkaName))
  }

  private def title(d: Dia): String = {
    val g = G(d, "title")
    val base = g.pick("base", titleBases)
    val tt = s"CASE WHEN ${g.u("exact")} % 6 = 0 THEN $base " +
      s"ELSE ($base || ' ' || ${d.str(g.ui("sfx", 40))}) END"
    val kid = s"(1 + (${g.u("kid")} % $NKind))"
    val isEp = s"$kid = 7" // kinds(6) = 'episode'
    render(Seq(
      "id" -> pk,
      "title" -> tt,
      "imdb_index" -> g.nullable("ix", 9, 10, s"'I'"),
      "kind_id" -> kid,
      "production_year" ->
        g.nullableInt("py0", 1, 20, skewYear(g.u("py"))),
      "imdb_id" -> g.nullableInt("ii", 1, 1, "0"),
      "phonetic_code" -> g.pick("pc", pcodes),
      "episode_of_id" ->
        s"CASE WHEN $isEp THEN cast(${g.ui("eo", NTitle, 1)} as int) ELSE cast(NULL as int) END",
      "season_nr" ->
        s"CASE WHEN $isEp THEN cast((1 + ${g.u("sn")} % 30) as int) ELSE cast(NULL as int) END",
      "episode_nr" ->
        s"CASE WHEN $isEp THEN cast((1 + ${g.u("en")} % 300) as int) ELSE cast(NULL as int) END",
      "series_years" -> g.nullable("sy", 4, 5, s"'1998-2004'"),
      "md5sum" -> s"('m' || ${d.str("id")})"), d.seq(NTitle))
  }

  private def akaTitle(d: Dia): String = {
    val g = G(d, "aka_title")
    val base = g.pick("base", titleBases)
    render(Seq(
      "id" -> pk,
      "movie_id" -> g.ui("mid", NTitle, 1),
      "title" -> s"($base || ' (aka ' || ${d.str(g.ui("sfx", 40))} || ')')",
      "imdb_index" -> g.nullable("ix", 9, 10, s"'I'"),
      "kind_id" -> s"(1 + (${g.u("kid")} % $NKind))",
      "production_year" ->
        g.nullableInt("py0", 1, 20, skewYear(g.u("py"))),
      "phonetic_code" -> g.pick("pc", pcodes),
      "episode_of_id" -> g.nullableInt("eo", 1, 1, "0"),
      "season_nr" -> g.nullableInt("sn", 1, 1, "0"),
      "episode_nr" -> g.nullableInt("en", 1, 1, "0"),
      "note" -> g.nullable("nt", 1, 2, s"'(aka title)'"),
      "md5sum" -> s"('m' || ${d.str("id")})"), d.seq(NAkaTitle))
  }

  private def castInfo(d: Dia): String = {
    val g = G(d, "cast_info")
    render(Seq(
      "id" -> pk,
      "person_id" -> g.ui("pid", NName, 1),
      "movie_id" -> g.ui("mid", NTitle, 1),
      "person_role_id" -> g.nullableInt("pr0", 1, 5,
        s"cast(${g.ui("pr", NCharName, 1)} as int)"),
      "note" -> g.nullable("nt0", 2, 5, g.pick("nt", ciNotes)),
      "nr_order" -> g.nullableInt("no0", 1, 3, s"cast(${g.ui("no", 50)} as int)"),
      "role_id" -> g.ui("rid", NRole, 1)), d.seq(NCastInfo))
  }

  private def movieCompanies(d: Dia): String = {
    val g = G(d, "movie_companies")
    render(Seq(
      "id" -> pk,
      "movie_id" -> g.ui("mid", NTitle, 1),
      "company_id" -> g.ui("cid", NCompanyName, 1),
      "company_type_id" -> g.ui("ct", NCompType, 1),
      "note" -> g.nullable("nt0", 3, 10, g.pick("nt", mcNotes))),
      d.seq(NMc))
  }

  private def movieInfo(d: Dia): String = {
    val g = G(d, "movie_info")
    // info_type ids (1-based over infoTypes): genres=5, release dates=6,
    // countries=7, languages=8, budget=9; tail rows draw from the full set
    val ity = d.elem(Seq("5", "5", "5", "6", "6", "6", "7", "7", "8", "8",
      "9", "13"), s"(${g.u("it")} % 12)")
    val itId = s"cast($ity as int)"
    val rdate = s"(${g.pick("rr", rdRegions)} || ': ' || " +
      s"${d.str(s"(1 + ${g.u("rd")} % 28)")} || ' ' || ${g.pick("rm", months)} " +
      s"|| ' ' || ${d.str(s"(1995 + ${g.u("ry")} % 20)")})"
    val info = s"CASE $itId WHEN 5 THEN ${g.pick("ge", genres)} " +
      s"WHEN 6 THEN $rdate " +
      s"WHEN 7 THEN ${g.pick("co", miCountries)} " +
      s"WHEN 8 THEN ${g.pick("la", languages)} " +
      s"WHEN 9 THEN ('$$' || ${d.str(s"(1 + ${g.u("bu")} % 500)")} || ',000,000') " +
      s"ELSE ('misc ' || ${d.str(g.u("mi"))}) END"
    render(Seq(
      "id" -> pk,
      "movie_id" -> g.ui("mid", NTitle, 1),
      "info_type_id" -> itId,
      "info" -> info,
      "note" -> g.nullable("nt0", 7, 10, g.pick("nt", miNotes))),
      d.seq(NMi))
  }

  private def movieInfoIdx(d: Dia): String = {
    val g = G(d, "movie_info_idx")
    // rating=3, votes=4, top 250 rank=1, bottom 10 rank=2
    val ity = d.elem(Seq("3", "3", "3", "3", "3", "4", "4", "4", "1", "2"),
      s"(${g.u("it")} % 10)")
    val itId = s"cast($ity as int)"
    val rating = s"(${d.str(s"(2 + ${g.u("r1")} % 8)")} || '.' || ${d.str(s"(${g.u("r2")} % 10)")})"
    val info = s"CASE $itId WHEN 3 THEN $rating " +
      s"WHEN 4 THEN ${d.str(s"(100 + ${g.u("v")} % 1000000)")} " +
      s"ELSE ${d.str(s"(1 + ${g.u("rk")} % 250)")} END"
    render(Seq(
      "id" -> pk,
      "movie_id" -> g.ui("mid", NTitle, 1),
      "info_type_id" -> itId,
      "info" -> info,
      "note" -> g.nullable("nt", 9, 10, s"'(idx note)'")), d.seq(NMiIdx))
  }

  private def movieKeyword(d: Dia): String = {
    val g = G(d, "movie_keyword")
    // half of the rows hit the seeded head so workload keywords join
    val kid = s"CASE WHEN ${g.u("h")} % 2 = 0 " +
      s"THEN (1 + ${g.u("k1")} % ${keywordSeeds.length}) " +
      s"ELSE (1 + ${g.u("k2")} % $NKeyword) END"
    render(Seq(
      "id" -> pk,
      "movie_id" -> g.ui("mid", NTitle, 1),
      "keyword_id" -> kid), d.seq(NMk))
  }

  private def movieLink(d: Dia): String = {
    val g = G(d, "movie_link")
    render(Seq(
      "id" -> pk,
      "movie_id" -> g.ui("mid", NTitle, 1),
      "linked_movie_id" -> g.ui("lmid", NTitle, 1),
      "link_type_id" -> g.ui("lt", NLink, 1)), d.seq(NMl))
  }

  private def personInfo(d: Dia): String = {
    val g = G(d, "person_info")
    // mini biography=10, trivia=11, height=12
    val ity = d.elem(Seq("10", "10", "11", "12"), s"(${g.u("it")} % 4)")
    render(Seq(
      "id" -> pk,
      "person_id" -> g.ui("pid", NName, 1),
      "info_type_id" -> s"cast($ity as int)",
      "info" -> s"('bio ' || ${d.str(g.u("inf"))})",
      "note" -> g.nullable("nt0", 1, 4, g.pick("nt", piNotes))),
      d.seq(NPi))
  }

  private def completeCast(d: Dia): String = {
    val g = G(d, "complete_cast")
    render(Seq(
      "id" -> pk,
      "movie_id" -> g.nullableInt("m0", 1, 20, s"cast(${g.ui("mid", NTitle, 1)} as int)"),
      "subject_id" -> g.ui("sid", 2, 1), // cast / crew
      "status_id" -> g.ui("st", 2, 3)), // complete / complete+verified
      d.seq(NCc))
  }

  /** All 21 tables in reference initialize.sql order. */
  val tables: Seq[(String, Dia => String)] = Seq(
    "aka_name" -> akaName _,
    "aka_title" -> akaTitle _,
    "cast_info" -> castInfo _,
    "char_name" -> charName _,
    "comp_cast_type" -> compCastType _,
    "company_name" -> companyName _,
    "company_type" -> companyType _,
    "complete_cast" -> completeCast _,
    "info_type" -> infoType _,
    "keyword" -> keyword _,
    "kind_type" -> kindType _,
    "link_type" -> linkType _,
    "movie_companies" -> movieCompanies _,
    "movie_info" -> movieInfo _,
    "movie_info_idx" -> movieInfoIdx _,
    "movie_keyword" -> movieKeyword _,
    "movie_link" -> movieLink _,
    "name" -> nameT _,
    "person_info" -> personInfo _,
    "role_type" -> roleType _,
    "title" -> title _)
}
