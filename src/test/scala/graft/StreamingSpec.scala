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

  test("stateful streaming session counts equal batch sessionization") {
    val stream = streaming.Streaming.sessionCounts(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = SparkEntry.queries("ev_sessions")(spark, sf)
      .groupBy("user_id").agg(max("session_id").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stream == batch)
  }
}
