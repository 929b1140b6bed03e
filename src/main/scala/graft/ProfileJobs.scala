package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: run one registered query and print every
  * Spark JOB with its wall time, stage count, task count, and summed
  * task time — separates per-job fixed overhead (scheduling, stage
  * barriers) from actual task compute when deciding whether a slow
  * query needs fewer jobs or cheaper tasks.
  * `SPARK_GRAFT_QUERY=...`, `SPARK_GRAFT_SF_DIR=...`, optional
  * `SPARK_GRAFT_REPS` (per-rep job lists print separately). */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = sys.env.getOrElse("SPARK_GRAFT_QUERY",
      sys.error("set SPARK_GRAFT_QUERY"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .config(graft.plans.RewriteCountDistinctBitmap.ConfKey, "true")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "false"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "200"))
      .config("spark.local.dir", LocalScratch.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    case class Job(start: Long, var end: Long = 0L, var stages: Int = 0,
      var tasks: Int = 0, var taskMs: Long = 0L, var site: String = "",
      var deserMs: Long = 0L, var gcMs: Long = 0L, var runMs: Long = 0L,
      var resSerMs: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    // per-stage/task attribution via the stage->job mapping
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener2 = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.time)
        j.site = Option(e.properties)
          .map(p => Option(p.getProperty("spark.sql.execution.id"))
            .getOrElse("")).getOrElse("")
        jobs.put(e.jobId, j)
        e.stageIds.foreach(s => stageJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val jid = stageJob.getOrDefault(e.stageInfo.stageId, -1)
        val j = jobs.get(jid)
        if (j != null) j.stages += 1
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageJob.getOrDefault(e.stageId, -1)
        val j = jobs.get(jid)
        if (j != null && e.taskInfo != null) {
          j.tasks += 1; j.taskMs += e.taskInfo.duration
          val m = e.taskMetrics
          if (m != null) {
            j.deserMs += m.executorDeserializeTime
            j.gcMs += m.jvmGCTime
            j.runMs += m.executorRunTime
            j.resSerMs += m.resultSerializationTime
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener2)

    // SQL execution wall (covers driver planning + all of its jobs)
    case class Exec(desc: String, start: Long, var end: Long = 0L)
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, Exec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.put(s.executionId, Exec(s.description.take(90), s.time))
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            val ex = execs.get(s.executionId); if (ex != null) ex.end = s.time
          case _ =>
        }
    })

    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    for (r <- 1 to reps) {
      jobs.clear(); stageJob.clear(); execs.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the listener bus COMPLETELY before reading (a fixed sleep
      // under-drains on a loaded box and skews the printed job stats).
      // listenerBus is private[spark] in Scala but public in bytecode —
      // reflection keeps this dev harness off Spark internals at compile
      // time
      locally {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      }
      val js = {
        val b = scala.collection.mutable.ArrayBuffer.empty[(Int, Job)]
        jobs.forEach((k, v) => b += ((k, v)))
        b.sortBy(_._1)
      }
      val totalJobMs = js.map { case (_, j) =>
        if (j.end > 0) j.end - j.start else 0L }.sum
      println(f"JOBS rep=$r query=$name rows=$n wall=$wall%.2fs " +
        f"jobs=${js.size} jobWall=${totalJobMs / 1000.0}%.2fs " +
        f"gap=${wall - totalJobMs / 1000.0}%.2fs")
      js.foreach { case (id, j) =>
        val ms = if (j.end > 0) j.end - j.start else -1L
        println(f"JOB  id=$id%4d wall=${ms}%6dms stages=${j.stages}%3d " +
          f"tasks=${j.tasks}%5d taskTime=${j.taskMs}%7dms " +
          f"deser=${j.deserMs}%6dms gc=${j.gcMs}%5dms run=${j.runMs}%7dms " +
          f"resSer=${j.resSerMs}%4dms  exec=${j.site}")
      }
      val exList = {
        val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Exec)]
        execs.forEach((k, v) => b += ((k, v)))
        b.sortBy(_._1)
      }
      val exTotal = exList.map { case (_, e) =>
        if (e.end > 0) e.end - e.start else 0L }.sum
      println(f"EXECS rep=$r n=${exList.size} execWall=${exTotal / 1000.0}%.2fs")
      exList.foreach { case (id, e) =>
        val ms = if (e.end > 0) e.end - e.start else -1L
        println(f"EXEC id=$id%4d wall=${ms}%6dms  ${e.desc}")
      }
    }
    spark.stop()
  }
}
