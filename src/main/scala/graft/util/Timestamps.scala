package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Timestamp conversions shared by batch and streaming paths — ONE
  * definition so the "streamed ≡ batch" invariant can't drift. */
object Timestamps {
  /** nanos-since-epoch LONG column `ts` → µs TimestampType, true floor
    * division (negative-safe; `div` truncates toward zero, which would
    * put pre-epoch timestamps 1 µs later than DuckDB's native ns→µs). */
  def nanosLongToMicros(df: DataFrame, tsCol: String): DataFrame =
    if (df.schema(tsCol).dataType.typeName == "long")
      df.withColumn(tsCol, expr(
        s"timestamp_micros($tsCol div 1000 - " +
          s"(CASE WHEN $tsCol % 1000 < 0 THEN 1 ELSE 0 END))"))
    else df
}
