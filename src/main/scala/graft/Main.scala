package graft

import org.apache.spark.sql.SparkSession

import graft.config.PipelineConfig
import graft.etl.Pipeline

/** CLI entry mirroring the reference's `python main.py --config X.yml`
  * (`main.py:38-40`): load the YAML plan, run the configured stages.
  *
  * Usage: `sbt "runMain graft.Main <config.yml>"`.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: graft.Main <config.yml>")
    val cfg = PipelineConfig.fromFile(args(0))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      new Pipeline(spark, cfg).run()
      println(f"[graft] pipeline finished in ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        s" → ${cfg.outputDir}")
    } finally spark.stop()
  }
}
