package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source operators (SURVEY.md §2.1).
  *
  * S1 delimited-regex text scan — the reference ingests headerless text with
  * the literal multi-char separator `|||` (reference
  * `wikicaps_etl_pipeline.py:102,110-114`). Spark's CSV reader does not take
  * a regex separator, so the idiomatic plan is `spark.read.text` (splittable,
  * pushdown-friendly) followed by a codegen'd `split` projection — one narrow
  * stage, no shuffle, scales linearly with input splits.
  *
  * S2 columnar scan — the reference persists Feather/Arrow
  * (`wikicaps_etl_pipeline.py:230`); here the columnar format is Parquet,
  * which keeps the same intent (column pruning + predicate pushdown at scan).
  *
  * S3 single-char CSV (Flickr30k `sep='|'`, `notebooks/f30k.ipynb:37`).
  *
  * S4 nested-JSON + flatten (COCO `notebooks/coco.ipynb:231-241`): read the
  * nested annotation map, `explode` one row per annotation.
  */
object Readers {

  /** S1: headerless text with an arbitrary regex separator. Column names are
    * applied positionally, mirroring the rename at
    * `wikicaps_etl_pipeline.py:115`. Rows with fewer fields than `names` get
    * nulls (the reference's python engine errors instead; we prefer
    * fault-tolerant scans per R4).
    */
  def delimitedText(spark: SparkSession, path: String, sepRegex: String,
                    names: Seq[String]): DataFrame = {
    val parts = split(col("value"), sepRegex)
    // try_element_at: Spark 4 runs ANSI mode by default, where element_at
    // throws on short rows; scans must be fault-tolerant instead (R4)
    val cols = names.zipWithIndex.map { case (n, i) =>
      try_element_at(parts, lit(i + 1)).as(n)
    }
    spark.read.text(path).select(cols: _*)
  }

  /** S1 applied to an in-memory DataFrame of lines (used by tests and the
    * round-trip oracle query). */
  def parseDelimited(lines: DataFrame, lineCol: String, sepRegex: String,
                     names: Seq[String]): DataFrame = {
    val parts = split(col(lineCol), sepRegex)
    val cols = names.zipWithIndex.map { case (n, i) =>
      try_element_at(parts, lit(i + 1)).as(n)
    }
    lines.select(cols: _*)
  }

  /** WikiCaps raw scan: `id|||file|||caption` → typed columns
    * (`wikicaps_etl_pipeline.py:110-116`). */
  def wikicaps(spark: SparkSession, path: String): DataFrame =
    delimitedText(spark, path, "\\|\\|\\|",
      Seq("wikicaps_id", "wikimedia_file", "caption"))
      .withColumn("wikicaps_id", col("wikicaps_id").cast(LongType))

  /** S2: columnar scan. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S3: header CSV with single-char separator (`notebooks/f30k.ipynb:37`). */
  def csv(spark: SparkSession, path: String, sep: String,
          header: Boolean = true): DataFrame =
    spark.read.option("sep", sep).option("header", header.toString).csv(path)

  /** Binary-file ingest — the multimodal corpus entry point: every file
    * under `path` (optionally glob-filtered) becomes one row of
    * (path, modificationTime, length, content BINARY). This is Spark's
    * `binaryFile` source: a distributed scan (files split across tasks,
    * no driver listing bottleneck beyond the initial index) that pairs
    * with `ImageOps`/`MediaOps` — decode stays per-row in executors,
    * payloads never visit the driver. Partition sizing note for 100 TB:
    * binary rows can't be split mid-file, so `maxPartitionBytes` governs
    * files-per-task, not bytes-per-task; co-locate small files first
    * (or bundle with `spark.sql.files.openCostInBytes`). */
  def binaryFiles(spark: SparkSession, path: String,
                  glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** S4: COCO-style nested JSON `{"annotations": [{image_id,id,caption}]}` →
    * one row per annotation with an `origin` literal
    * (`notebooks/coco.ipynb:231-241,340,465`). */
  def cocoCaptions(spark: SparkSession, path: String,
                   origin: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("annotations")).as("ann"))
      .select(
        col("ann.image_id").as("image_id"),
        col("ann.id").as("caption_id"),
        col("ann.caption").as("caption"))
      .withColumn("origin", lit(origin))
}
