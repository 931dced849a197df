package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

// TEMPORARY profiling scratch — never committed.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, String)]
    val starts = mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          jobs += ((je.jobId, System.nanoTime() - t0, d.take(90))) }
    })
    val names = sys.env.getOrElse("SCRATCH_QUERIES", "q4_training_pipeline")
      .split(",").toSeq
    Seq("lineitem", "documents", "embeddings", "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    names.foreach { q =>
      // warm run
      SparkEntry.queries(q)(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
      Thread.sleep(200); jobs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[scratch] ==== $q total ${total}%.2f s, ${jobs.length} jobs ====")
      jobs.foreach { case (id, ns, d) =>
        println(f"[scratch] job $id%3d ${ns / 1e9}%7.3f s  $d")
      }
    }
    spark.stop()
  }
}
