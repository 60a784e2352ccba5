package graft.tools

import graft.SparkEntry
import scala.collection.mutable.ArrayBuffer

/** Per-stage timeline for ONE bench query execution: when each job/stage
  * submitted and completed, the gaps between them (driver-side dead time:
  * AQE re-planning, broadcast collects, task-binary serialization), and
  * per-stage task metrics (deserialize / run / GC / result ser). This is
  * the microscope for the small-SF per-query floor — FloorProbe showed
  * ~0.3-0.45 s of exec wall with ~0.02 s of parallel compute; this probe
  * locates the other 95%.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.StageProbe <name>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warmups=N (default 2): sf100 shingle queries spill 30-50 GB per run
    // and this host only has ~53 GB headroom — probe those with warmups=1
    // (the GC between runs below releases the previous run's shuffle files,
    // same reason as Bench/QTime)
    val (opts, rest) = args.partition(_.startsWith("warmups="))
    val warmups = opts.headOption.map(_.stripPrefix("warmups=").toInt).getOrElse(2)
    val name = rest.headOption.getOrElse("tpch_q1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    // Suite queries (tpcds_/job_/cb_/tpcxbb_) run under the SuiteBench
    // regime (no dataDir, generator-scale split sizing) so the probed
    // stages are the ones the suite bench actually executes.
    val isSuite = Seq("tpcds_q", "job_q", "cb_q", "tpcxbb_q").exists(name.startsWith)
    val spark =
      if (isSuite) graft.Engine.create(master = s"local[$cpus]",
        shufflePartitions = cpus, appName = "graft-stageprobe",
        extraConf = Map(
          "spark.sql.files.maxPartitionBytes" -> (64L * 1024 * 1024).toString,
          "spark.sql.files.openCostInBytes" -> (4L * 1024 * 1024).toString))
      else graft.Engine.create(master = s"local[$cpus]",
        shufflePartitions = cpus, appName = "graft-stageprobe", dataDir = Some(sfDir))

    import org.apache.spark.scheduler._
    case class StageRec(id: Int, name: String, submitted: Long, completed: Long,
      tasks: Int, deserMs: Long, runMs: Long, gcMs: Long, resSerMs: Long)
    val events = ArrayBuffer[(Long, String)]()            // (nanos-free ms clock, label)
    val stageSub = scala.collection.mutable.Map[Int, Long]()
    val stageTasks = scala.collection.mutable.Map[Int, (Int, Long, Long, Long, Long)]()
    // per-task (launch-offset-ms, run-ms) per stage, to expose skew/stagger
    val taskDetail = scala.collection.mutable.Map[Int, ArrayBuffer[(Long, Long)]]()
    val recs = ArrayBuffer[StageRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        events.synchronized { events += ((j.time, s"job${j.jobId} start")) }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        events.synchronized { events += ((j.time, s"job${j.jobId} end")) }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stageSub.synchronized { stageSub(s.stageInfo.stageId) = s.stageInfo.submissionTime.getOrElse(0L) }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = stageTasks.synchronized {
        val m = t.taskMetrics
        val cur = stageTasks.getOrElse(t.stageId, (0, 0L, 0L, 0L, 0L))
        if (m != null) stageTasks(t.stageId) = (cur._1 + 1,
          cur._2 + m.executorDeserializeTime, cur._3 + m.executorRunTime,
          cur._4 + m.jvmGCTime, cur._5 + m.resultSerializationTime)
        if (m != null) taskDetail.getOrElseUpdate(t.stageId, ArrayBuffer()) +=
          ((t.taskInfo.launchTime, m.executorRunTime))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val (n, d, r, g, rs) = stageTasks.synchronized {
          stageTasks.getOrElse(si.stageId, (0, 0L, 0L, 0L, 0L)) }
        recs.synchronized {
          recs += StageRec(si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
            n, d, r, g, rs)
        }
      }
    })

    def buildDf() = name match {
      case n if n.startsWith("tpcds_q") => graft.tpcds.Tpcds.run(spark, n.stripPrefix("tpcds_q"))
      case n if n.startsWith("tpcxbb_q") => graft.tpcds.Tpcxbb.run(spark, n.stripPrefix("tpcxbb_q"))
      case n if n.startsWith("job_q") => graft.job.Job.run(spark, n.stripPrefix("job_q"))
      case n if n.startsWith("cb_q") => graft.clickbench.Clickbench.run(spark, n.stripPrefix("cb_q"))
      case n => SparkEntry.queries(n)(spark, sfDir)
    }
    def runOnce(): (Long, Long) = {
      val df = buildDf()
      val qe = df.queryExecution
      qe.executedPlan
      val t0 = System.currentTimeMillis()
      qe.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val t1 = System.currentTimeMillis()
      (t0, t1)
    }
    (0 until warmups).foreach { _ => runOnce(); System.gc(); Thread.sleep(1000) }
    Thread.sleep(500)
    recs.clear(); events.clear(); stageTasks.clear()
    val (t0, t1) = runOnce()
    Thread.sleep(800) // drain listener bus

    println(f"TOTAL exec wall: ${(t1 - t0) / 1e3}%.3f s  ($name)")
    println("| stage | submitted(+ms) | completed(+ms) | wall ms | tasks | deser | run | gc | resSer |")
    println("|---|---|---|---|---|---|---|---|---|")
    val sorted = recs.sortBy(_.submitted)
    sorted.foreach { r =>
      println(s"| ${r.id} ${r.name.take(40)} | ${r.submitted - t0} | ${r.completed - t0} | " +
        s"${r.completed - r.submitted} | ${r.tasks} | ${r.deserMs} | ${r.runMs} | ${r.gcMs} | ${r.resSerMs} |")
    }
    // driver-side dead time: periods within [t0,t1] not covered by any stage
    val iv = sorted.map(r => (r.submitted, r.completed)).sortBy(_._1)
    var covered = 0L; var cursor = t0
    iv.foreach { case (s, e) =>
      val s2 = math.max(s, cursor); val e2 = math.max(e, cursor)
      if (e2 > s2) { covered += e2 - s2; cursor = e2 }
    }
    println(f"stage-covered: ${covered} ms; driver dead time (no stage running): ${(t1 - t0) - covered} ms")
    sorted.filter(_.tasks > 4).foreach { r =>
      taskDetail.synchronized { taskDetail.get(r.id) }.foreach { td =>
        val launches = td.map(_._1 - r.submitted).sorted
        val runs = td.map(_._2).sorted
        println(s"  stage ${r.id} launch-offsets ms: ${launches.mkString(" ")}")
        println(s"  stage ${r.id} task-run ms:      ${runs.mkString(" ")}")
      }
    }
    events.sortBy(_._1).foreach { case (ts, l) => println(s"  [job] +${ts - t0}ms $l") }
    spark.stop()
  }
}
