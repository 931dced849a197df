package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Timestamp conversions shared by batch and streaming paths — ONE
  * definition so the "streamed ≡ batch" invariant can't drift. */
object Timestamps {
  /** Normalize an event-time column to µs TimestampType (LTZ), whatever
    * physical form the parquet was generated with — the generator has
    * shipped both TIMESTAMP(NANOS) (read as nanos LONG under
    * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (read as TIMESTAMP_NTZ):
    *  - LONG nanos → true floor division to µs (negative-safe; `div`
    *    truncates toward zero, which would put pre-epoch timestamps 1 µs
    *    later than DuckDB's native ns→µs), then `timestamp_micros`;
    *  - TIMESTAMP_NTZ → cast to TimestampType. All our sessions pin
    *    `spark.sql.session.timeZone=UTC`, so the cast maps wall-clock
    *    identically to DuckDB's naive-µs reading of the same file;
    *  - TimestampType → already normal.
    * ONE definition shared by batch, streaming, and specs so the
    * "streamed ≡ batch" invariant and the oracle semantics can't drift.
    * (Named for what it guarantees — a normalized event-time column —
    * not for any one physical-form branch; formerly nanosLongToMicros.) */
  def normalizeEventTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType.typeName match {
      case "long" =>
        df.withColumn(tsCol, expr(
          s"timestamp_micros($tsCol div 1000 - " +
            s"(CASE WHEN $tsCol % 1000 < 0 THEN 1 ELSE 0 END))"))
      case "timestamp_ntz" =>
        df.withColumn(tsCol, df(tsCol).cast("timestamp"))
      case _ => df
    }
}
