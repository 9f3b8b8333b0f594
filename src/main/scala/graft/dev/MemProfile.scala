package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only memory profiler (VERDICT r8 #5): run every registered query
  * under a constrained heap and report, per query,
  *
  *  - `peak_exec_mb`: the largest per-stage sum of task
  *    `peakExecutionMemory` (the unified-memory pages held by
  *    aggregates/joins/sorts at their high-water mark; summed across a
  *    stage's tasks it upper-bounds what the stage pinned at once on this
  *    single-JVM "cluster"),
  *  - `heap_after_mb`: JVM heap in use after the query, cache clear, and
  *    a forced GC — residual footprint a query leaks into the session.
  *
  * Usage: `SPARK_DRIVER_MEM=2g sbt "runMain graft.dev.MemProfile
  * /root/testdata/sf0.1 [topN]"`. Exit code 1 if any query fails —
  * an OOM under the small heap is exactly what this probe exists to
  * catch before the 100 TB cluster does.
  */
object MemProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val topN = if (args.length > 1) args(1).toInt else 15
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.sql.ui.retainedExecutions", "10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stagePeak = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val p = sc.stageInfo.taskMetrics.peakExecutionMemory
        var cur = stagePeak.get()
        while (p > cur && !stagePeak.compareAndSet(cur, p)) cur = stagePeak.get()
      }
    })

    val rt = Runtime.getRuntime
    val heapMax = rt.maxMemory() / (1024 * 1024)
    println(s"[memprofile] heap max = ${heapMax} MiB, sf = $sfDir")

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val rows = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      stagePeak.set(0L)
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}" }
      spark.sharedState.cacheManager.clearCache()
      // listener events post async and the bus has no public drain; the
      // last stage-completed event lands within milliseconds of the
      // job-end that count() awaited — a short sleep suffices for a
      // dev-side profiler
      Thread.sleep(100)
      System.gc()
      val heapAfter = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      (name, stagePeak.get() / (1024 * 1024), heapAfter)
    }
    println(f"${"query"}%-28s ${"peak_exec_mb"}%12s ${"heap_after_mb"}%14s")
    rows.sortBy(-_._2).take(topN).foreach { case (n, p, h) =>
      println(f"$n%-28s $p%12d $h%14d")
    }
    val maxHeap = rows.map(_._3).max
    println(s"[memprofile] queries=${rows.size} failures=${errors.size} " +
      s"max_heap_after_mb=$maxHeap")
    errors.foreach { case (k, v) => println(s"[memprofile] FAILED $k: $v") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
