package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** One-off profile lab for the sf0.01 gold micro-suite: measures job
  * count and min-of-N time per gold model under (a) the current
  * interactive profile (shuffle.partitions=1, broadcast joins on) and
  * (b) the same profile with autoBroadcastJoinThreshold=-1 — at this
  * scale every broadcast build is a SEPARATE job of pure scheduler
  * floor (~0.12 s p50 on this host, graft.SchedFloor), so fewer jobs
  * may beat "better" joins. Results inform whether the bench gate's
  * small pass should also disable broadcasts (plans change, results
  * don't). */
object GoldProfileLab {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 5
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gold-profile-lab")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    val gold = graft.operators.GoldAnalogs.all.map(_.name).toSet
    val qs = SparkEntry.queries.toSeq.sortBy(_._1).filter(q => gold(q._1))

    def run(label: String): Unit = {
      // warm
      qs.foreach { case (_, fn) =>
        fn(spark, sf).write.format("noop").mode("overwrite").save()
      }
      val res = qs.map { case (name, fn) =>
        var best = Double.MaxValue
        var nJobs = -1
        (1 to passes).foreach { _ =>
          val j0 = jobs.get()
          val t0 = System.nanoTime()
          fn(spark, sf).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          if (sys.env.get("GOLDLAB_NOSLEEP").isEmpty) Thread.sleep(200) // listener drain
          nJobs = jobs.get() - j0
          best = math.min(best, dt)
        }
        (name, best, nJobs)
      }
      res.foreach { case (n, t, j) => println(f"[$label] $n $t%.3f s jobs=$j") }
      println(f"[$label] TOTAL ${res.map(_._2).sum}%.3f s jobs=${res.map(_._3).sum}")
    }

    run("broadcast-on")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    run("broadcast-off")
    // third profile: AQE off too — at sf0.01 with one partition AQE's
    // per-query-stage materialization is one JOB per exchange of pure
    // scheduler floor; without it the plan runs as one job (+ hinted
    // broadcast builds), the classic multi-stage DAG
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("broadcast-off+aqe-off")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    run("broadcast-on+aqe-off")
    spark.conf.unset("spark.sql.adaptive.enabled")
    spark.stop()
  }
}
