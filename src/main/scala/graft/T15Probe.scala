import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.enrich.CaptionStats
object T15Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0=System.nanoTime; val n=f
      println(f"PROBE $tag: ${(System.nanoTime-t0)/1e9}%.2f s rows=$n")
    }
    val base = df.select(col("doc_id"),
      CaptionStats.tokens(lower(col("text"))).as("__toks"))
    val grams = base
      .select(col("doc_id"), col("__toks"),
        explode(array((2 to 10).map(lit): _*)).as("__n"))
      .filter(size(col("__toks")) >= col("__n"))
      .select(col("doc_id"), col("__n"), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")) - col("__n") + 1)).as("__i"))
      .select(col("doc_id"), col("__n"),
        concat_ws(" ", slice(col("__toks"), col("__i"), col("__n"))).as("__gram"))
      .select(col("doc_id"), col("__n"),
        xxhash64(col("__gram")).as("__gh"),
        length(col("__gram")).cast("long").as("__glen"))
    val counts = grams.groupBy(col("doc_id"), col("__n"), col("__gh"), col("__glen"))
      .agg(count(lit(1)).as("__c"))
    time("counts-xx-1")(counts.count())
    time("counts-xx-2")(counts.count())
    val perN = counts.groupBy(col("doc_id"), col("__n")).agg(
      max(struct(col("__c"), (col("__c") * col("__glen")).as("cov"))).as("__top"),
      sum(when(col("__c") > 1, col("__c") * col("__glen")).otherwise(0L)).cast("long").as("__dupcov"))
    time("perN-1")(perN.count())
    time("perN-2")(perN.count())
    spark.stop()
  }
}
