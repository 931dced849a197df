package graft.util

import org.apache.spark.sql.DataFrame

/** Partitioning utilities shared by compute-heavy operators. */
object Partitioning {

  /** Repartition `df` up to the session's default parallelism when its
    * current partitioning is narrower — the "small file, heavy compute"
    * case: parquet cannot split below a row group, so a 5 MB file arrives
    * as ONE partition and a per-row-expensive operator (shingling, cosine,
    * md5 fingerprinting) runs serially regardless of cores.
    *
    * The repartition shuffle moves only the narrow input (cheap); inputs
    * already at or above the session parallelism — the 100 TB case with
    * thousands of splits — pass through untouched, so this never *reduces*
    * parallelism at scale. */
  def spread(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // Cheap width probe: `df.rdd.getNumPartitions` would be exact but
    // constructs the whole DataFrame→RDD conversion plan — measured
    // 2–5 s per call. Input-file count is a good proxy: small-file
    // inputs (the case this helper exists for) arrive as ≤1 split per
    // file. When the heuristic misfires (one huge splittable file) the
    // extra repartition is correctness-neutral.
    val narrow = try {
      val files = df.inputFiles
      files.nonEmpty && files.length < parallelism
    } catch { case _: Exception => false }
    if (narrow) df.repartition(parallelism) else df
  }
}
