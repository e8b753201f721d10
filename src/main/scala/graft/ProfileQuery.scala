package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round instrument (r17): run named queries with a
  * SparkListener that accounts wall time into jobs/stages/tasks, so the
  * bench's per-query seconds can be split into CLUSTER COMPUTE (sum of
  * task time / cores) vs DRIVER/SCHEDULER time (gaps between jobs, plan
  * optimization, collect-side work). A query whose task-time sum is a
  * tiny fraction of wall×cores is job-count/driver-bound — the r17
  * optimization target class — not data-bound.
  *
  * Usage: tools/run.sh graft.ProfileQuery qNNN_name [qNNN_name ...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS. Never touches bench_detail.json.
  */
object ProfileQuery {

  final class Acct extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var firstJobStart = 0L
    @volatile var lastJobEnd = 0L
    val jobLog = new scala.collection.mutable.ArrayBuffer[(Int, Long, String)]
    private val jobStart = new scala.collection.mutable.HashMap[Int, (Long, String)]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      jobs += 1
      if (firstJobStart == 0L) firstJobStart = e.time
      jobStart(e.jobId) = (e.time,
        Option(e.properties).flatMap(p =>
          Option(p.getProperty("callSite.short"))).getOrElse(""))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      lastJobEnd = e.time
      jobStart.remove(e.jobId).foreach { case (t0, cs) =>
        jobLog += ((e.jobId, e.time - t0, cs))
      }
    }
    val stageName = new scala.collection.mutable.HashMap[Int, String]
    val stageIdTimeMs = new scala.collection.mutable.HashMap[Int, Long]
    val stageTimeMs = new scala.collection.mutable.HashMap[String, Long]
    val stageCount = new scala.collection.mutable.HashMap[String, Int]
    val stageDetail = new scala.collection.mutable.HashMap[Int, String]
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
      synchronized {
        val n = e.stageInfo.name.takeWhile(_ != '\n')
        stageName(e.stageInfo.stageId) = n
        // first graft/user frame in the submission stack, if any
        val frames = e.stageInfo.details.split("\n")
        val interesting = frames.filter(f =>
          f.contains("graft.") && !f.contains("ProfileQuery"))
        stageDetail(e.stageInfo.stageId) =
          (if (interesting.nonEmpty) interesting.take(2)
           else frames.drop(1).take(3)).mkString(" | ")
      }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        stages += 1
        val n = e.stageInfo.name.takeWhile(_ != '\n')
        stageName(e.stageInfo.stageId) = n
        stageCount(n) = stageCount.getOrElse(n, 0) + 1
      }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = e.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcTimeMs += m.jvmGCTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        val n = stageName.getOrElse(e.stageId,
          s"stage-${e.stageId}")
        stageTimeMs(n) = stageTimeMs.getOrElse(n, 0L) + m.executorRunTime
        stageIdTimeMs(e.stageId) =
          stageIdTimeMs.getOrElse(e.stageId, 0L) + m.executorRunTime
      }
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; gcTimeMs = 0
      shuffleReadB = 0; shuffleWriteB = 0; firstJobStart = 0; lastJobEnd = 0
      jobLog.clear(); jobStart.clear()
      stageTimeMs.clear(); stageCount.clear()
      stageIdTimeMs.clear(); stageDetail.clear()
    }
  }

  /** Poor-man's sampling profiler: every `periodMs` tally the top
    * "interesting" frame (graft / catalyst-expression / MLlib / parquet
    * / shuffle) of every executor task thread. Attribution the stage
    * callsite cannot give — AQE materializes all intermediate stages
    * from the broadcast thread pool, so their stage names collapse to
    * `withThreadLocalCaptured`. */
  final class Sampler(periodMs: Long = 20L) {
    private val counts =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
    @volatile private var running = true
    private val t = new Thread(() => {
      while (running) {
        val all = Thread.getAllStackTraces
        all.forEach { (th, frames) =>
          if (th.getName.startsWith("Executor task launch worker")) {
            val f = frames.find { fr =>
              val c = fr.getClassName
              (c.startsWith("graft.") && !c.contains("ProfileQuery")) ||
                c.startsWith("org.apache.spark.sql.catalyst.expressions") ||
                c.startsWith("org.apache.spark.mllib") ||
                c.startsWith("org.apache.spark.ml.") ||
                c.contains("parquet") ||
                c.contains("GeneratedClass") ||
                c.contains("codegen")
            }.orElse(frames.headOption)
            f.foreach { fr =>
              val key = s"${fr.getClassName}.${fr.getMethodName}"
              counts.merge(key, 1L, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(periodMs)
      }
    })
    t.setDaemon(true)
    t.setName("graft-profile-sampler")
    def start(): Unit = t.start()
    def dump(top: Int): Unit = {
      running = false
      import scala.jdk.CollectionConverters._
      val rows = counts.asScala.toSeq.sortBy(-_._2).take(top)
      val tot = counts.asScala.values.map(_.toLong).sum.toDouble
      rows.foreach { case (k, v) =>
        println(f"[profile]   frame ${100.0 * v / tot}%5.1f%% (${v}) $k")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery qNNN [qNNN ...]")
    val sampleFrames = sys.env.contains("SPARK_GRAFT_PROFILE_FRAMES")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // match Bench's r17 session tuning (defaults overridable for A/B:
      // SPARK_GRAFT_CODEGEN_CACHE=100 SPARK_GRAFT_BYPASS_MERGE=200
      // reproduces the pre-r17 session)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acct = new Acct
    spark.sparkContext.addSparkListener(acct)
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query $name")
      val fn = SparkEntry.queries(name)
      // two runs: run 1 pays codegen/JIT, run 2 is the bench's reported min
      (1 to 2).foreach { run =>
        acct.reset()
        val sampler =
          if (sampleFrames && run == 2) Some(new Sampler()) else None
        sampler.foreach(_.start())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wallMs = (System.nanoTime() - t0) / 1e6
        // release anything the query pinned, as the bench does
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        Thread.sleep(200) // let listener events drain
        val busyPct = 100.0 * acct.taskTimeMs / (wallMs * cpus.toInt)
        val jobSpanMs =
          if (acct.lastJobEnd > acct.firstJobStart)
            acct.lastJobEnd - acct.firstJobStart
          else 0L
        println(f"[profile] $name run$run wall=${wallMs / 1000}%.2fs " +
          f"jobs=${acct.jobs} stages=${acct.stages} tasks=${acct.tasks} " +
          f"taskTime=${acct.taskTimeMs / 1000.0}%.1fs busy=$busyPct%.1f%% " +
          f"gc=${acct.gcTimeMs / 1000.0}%.1fs " +
          f"shufR=${acct.shuffleReadB / 1e6}%.1fMB " +
          f"shufW=${acct.shuffleWriteB / 1e6}%.1fMB " +
          f"jobSpan=${jobSpanMs / 1000.0}%.2fs")
        sampler.foreach(_.dump(25))
        if (run == 2) {
          val slow = acct.jobLog.sortBy(-_._2).take(12)
          slow.foreach { case (id, ms, cs) =>
            println(f"[profile]   job#$id%-4d ${ms / 1000.0}%6.2fs  $cs")
          }
          val totJob = acct.jobLog.map(_._2).sum
          println(f"[profile]   jobsTotal=${totJob / 1000.0}%.2fs " +
            f"betweenJobs=${(wallMs - totJob) / 1000.0}%.2fs " +
            f"nJobs=${acct.jobLog.size}")
          acct.stageTimeMs.toSeq.sortBy(-_._2).take(15)
            .foreach { case (n, ms) =>
              println(f"[profile]   stage ${ms / 1000.0}%7.2fs x${acct.stageCount.getOrElse(n, 0)}%-4d $n")
            }
          acct.stageIdTimeMs.toSeq.sortBy(-_._2).take(15)
            .foreach { case (sid, ms) =>
              println(f"[profile]   sid#$sid%-5d ${ms / 1000.0}%6.2fs " +
                acct.stageDetail.getOrElse(sid, ""))
            }
        }
      }
    }
    spark.stop()
  }
}
