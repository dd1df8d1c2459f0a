package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Measurement aid (optimization rounds): run named declared queries once
  * (after an untimed warm-up) and attribute wall time to Spark jobs by call
  * site, so a proof-dominated query's cost can be split into its library
  * stages (pqTrain vs writeBundle vs serve vs earned checks) without the UI.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Probe x195_deployed_batch_serve"
  * Prints [probe] lines: total wall, per-call-site job-time sums, and the
  * driver-side gap (wall minus job time = planning/commit/driver work).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.ArrayBuffer.empty[(Int, String, Long)]
    val starts = mutable.Map.empty[Int, (String, Long)]
    // SQL executions (AQE runs their stages as future-submitted sub-jobs
    // whose stage names are useless) — attribute wall time per execution
    // via the start/end events, whose description IS the action call site
    val execs = mutable.ArrayBuffer.empty[(String, Long)]
    val execStarts = mutable.Map.empty[Long, (String, Long)]
    var nJobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        nJobs += 1
        val inSql = Option(js.properties)
          .exists(p => p.getProperty("spark.sql.execution.id") != null)
        if (!inSql) {
          val cs = js.stageInfos.sortBy(_.stageId).lastOption.map(_.name)
            .getOrElse("?")
          starts(js.jobId) = (cs, js.time)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        starts.get(je.jobId).foreach { case (cs, t0) =>
          jobs += ((je.jobId, cs, je.time - t0))
        }
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        synchronized {
          e match {
            case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
              execStarts(s.executionId) = (s.description, s.time)
            case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
              execStarts.remove(s.executionId).foreach { case (d, t0) =>
                execs += ((d, s.time - t0))
              }
            case _ =>
          }
        }
    })
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm-up
      spark.catalog.clearCache()
      for (rep <- 1 to reps) {
        jobs.synchronized { jobs.clear(); starts.clear(); execs.clear()
          execStarts.clear(); nJobs = 0 }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // executions + non-SQL jobs run sequentially in these query
        // plans, so their wall sums partition the total; the residual is
        // driver-side work outside any execution (manifest I/O, commits)
        val (snapJ, snapE, nj) = jobs.synchronized { (jobs.toList, execs.toList, nJobs) }
        val agg = (snapJ.map(j => (j._2, j._3)) ++ snapE)
          .groupBy(_._1)
          .map { case (cs, v) => (cs, v.size, v.map(_._2).sum) }
          .toSeq.sortBy(-_._3)
        val accounted = (snapJ.map(_._3).sum + snapE.map(_._2).sum) / 1000.0
        println(f"[probe] $name rep=$rep total=$total%.2f s sparkjobs=$nj execs=${snapE.size} accounted=$accounted%.2f s gap=${total - accounted}%.2f s")
        for ((cs, n, ms) <- agg.take(40))
          println(f"[probe]   ${ms / 1000.0}%8.2f s  n=$n%-4d $cs")
      }
    }
    spark.stop()
  }
}
