package graft.tools

/** Dev utility: print the driver-contract surface counts (queries, oracles,
  * rows-only set) so docs quote exact numbers instead of hand counts. */
object CountContract {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"QUERIES=${q.size}")
    println(s"ORACLES=${o.size}")
    println(s"ROWS_ONLY=${(q -- o).toSeq.sorted.mkString(",")}")
    println(s"ORPHAN_ORACLES=${(o -- q).toSeq.sorted.mkString(",")}")
  }
}
