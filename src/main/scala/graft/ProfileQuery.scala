package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import scala.collection.mutable

/** Per-job wall-clock breakdown of individual SparkEntry queries — the
  * round-6 optimization microscope (guide §1: decide whether time goes to
  * shuffle, compute, or per-job fixed overhead before touching anything).
  * NOT part of the frozen bench contract: numbers here are for plan
  * iteration only; the comparable record stays `graft.Bench`.
  *
  * Usage: sbt "runMain graft.ProfileQuery <sfDir> <query1,query2,...>"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)

    case class JobRec(id: Int, desc: String, start: Long, var end: Long = -1L,
        var nStages: Int = 0, var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(js.jobId) = JobRec(js.jobId, desc, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val sid = sc.stageInfo.stageId
        // attribute to the most recent open job (good enough for a serial driver)
        jobs.values.lastOption.foreach { j => j.nStages += 1; j.nTasks += sc.stageInfo.numTasks }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val (_, warmSec) = Bench.time(SparkEntry.warmSharedCaches(spark, sfDir))
    println(f"[profile] warmSharedCaches: $warmSec%.2f s")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names.isEmpty || names.contains(name)) {
        // run 1 = warm-up (JIT), run 2 = profiled
        val (_, t1) = Bench.time(fn(spark, sfDir).count())
        jobs.synchronized(jobs.clear())
        spark.sparkContext.setJobDescription(s"profile:$name")
        val (_, t2) = Bench.time(fn(spark, sfDir).count())
        spark.sparkContext.setJobDescription(null)
        println(f"\n===== $name: run1=$t1%.3f s, run2=$t2%.3f s, jobs=${jobs.size} =====")
        val snap = jobs.synchronized(jobs.values.toSeq)
        var prevEnd = -1L
        snap.foreach { j =>
          val dur = (j.end - j.start) / 1000.0
          val gap = if (prevEnd > 0) (j.start - prevEnd) / 1000.0 else 0.0
          prevEnd = j.end
          println(f"  job ${j.id}%4d  ${dur}%7.3f s  gap=${gap}%6.3f s  stages=${j.nStages}%3d tasks=${j.nTasks}%5d")
        }
        val busy = snap.map(j => (j.end - j.start)).sum / 1000.0
        println(f"  total job time=$busy%.3f s of $t2%.3f s wall (driver gaps=${t2 - busy}%.3f s)")
      }
    }
    spark.stop()
  }
}
