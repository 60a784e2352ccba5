package graft.util

/** DuckDB-side SQL builders for oracles of engine-computed values that a
  * plain builtin can't reproduce.
  *
  * [[rollingFp]] replays the custom `rolling_hash` Catalyst expression
  * (graft.functions.ExprUtil.rollingHash — h = (h·131 + byte) mod 2^61−1 over
  * UTF-8 bytes) in pure SQL: bytes come from `hex(encode(...))`, the modular
  * powers of 131 from a tiny recursive CTE (one row per byte position), and
  * the polynomial is summed in HUGEINT (each term < 2^69, so even 10^9-byte
  * documents stay far below the 2^127 overflow line). This upgrades the
  * rolling-hash queries from rows-only checks to full hash-compared oracles.
  */
object OracleSql {
  private val Mod = "2305843009213693951" // 2^61 - 1

  /** SELECT doc_id, fp over `documents`, where fp is the 61-bit polynomial
    * rolling hash of `textExpr` (a SQL expression over documents' columns).
    * Embeddable as a subquery: `FROM (<rollingFp(...)>) t`.
    * NULL text → NULL fp (matching the Catalyst expression's null-intolerant
    * eval); empty text → 0 on both sides. */
  def rollingFp(textExpr: String): String =
    s"""WITH RECURSIVE pw(k, p) AS (
       |  SELECT 0, CAST(1 AS HUGEINT)
       |  UNION ALL
       |  SELECT k + 1, (p * 131) % $Mod FROM pw
       |  WHERE k < (SELECT max(octet_length(encode($textExpr))) FROM documents)
       |),
       |hx AS (
       |  SELECT doc_id, lower(hex(encode($textExpr))) AS h,
       |         octet_length(encode($textExpr)) AS len
       |  FROM documents
       |),
       |b AS (
       |  SELECT doc_id, i,
       |         CAST(16 * (strpos('0123456789abcdef', substr(h, 2*i-1, 1)) - 1)
       |            + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1) AS HUGEINT) AS byte,
       |         len
       |  FROM hx, unnest(generate_series(1, len)) AS g(i)
       |),
       |s AS (
       |  SELECT b.doc_id, sum(b.byte * pw.p) AS acc
       |  FROM b JOIN pw ON pw.k = b.len - b.i
       |  GROUP BY b.doc_id
       |)
       |SELECT d.doc_id,
       |       CASE WHEN $textExpr IS NULL THEN NULL
       |            ELSE CAST(coalesce(s.acc % $Mod, 0) AS BIGINT) END AS fp
       |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id""".stripMargin
}
