package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-JOB and per-STAGE wall-time attribution for one query.
  * Runs the named query thrice (first warms JVM/codegen; later runs are
  * the steady state the bench's best-of-3 reports), then prints every
  * job of the LAST run with its duration, stage count, task count and
  * the first line of its call site — the "where do the seconds go"
  * answer that aggregate timings can't give (optimization guide §1.1:
  * decide shuffle vs compute vs scheduling before touching anything).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    final case class JobRec(id: Int, var desc: String = "", var start: Long = 0L,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (collecting) {
        val r = JobRec(js.jobId)
        r.desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        r.start = js.time
        r.stages = js.stageInfos.size
        r.tasks = js.stageInfos.map(_.numTasks).sum
        jobs.put(js.jobId, r)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (collecting) {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    args.drop(1).foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val last = i == 3
        if (last) { jobs.clear(); collecting = true }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        if (last) {
          collecting = false
          // listener bus is async; give it a beat to drain
          Thread.sleep(300)
          println(f"== $n run$i total ${t}%.3f s ==")
          import scala.jdk.CollectionConverters._
          val rs = jobs.values.asScala.toSeq.sortBy(_.id)
          val sumJobs = rs.map(r => (r.end - r.start) / 1e3).sum
          rs.foreach { r =>
            println(f"  job ${r.id}%3d ${(r.end - r.start) / 1e3}%7.3f s  " +
              f"stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.desc}")
          }
          println(f"  sum(job wall) = $sumJobs%.3f s; gaps (driver/plan) = ${t - sumJobs}%.3f s")
        } else {
          println(f"  warm run$i: ${t}%.3f s")
        }
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
