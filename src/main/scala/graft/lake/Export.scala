package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Suffix-dispatched export sink — the `--out` behavior of the
  * reference's loader CLI (lake_io.py:391-401: csv / parquet by file
  * suffix; feather intentionally unsupported here).
  */
object Export {
  def write(df: DataFrame, out: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val lower = out.toLowerCase
    if (lower.endsWith(".csv"))
      df.write.mode(mode).option("header", "true").csv(out)
    else if (lower.endsWith(".json"))
      df.write.mode(mode).json(out)
    else if (lower.endsWith(".parquet") || !lower.contains("."))
      df.write.mode(mode).option("compression", "zstd").parquet(out)
    else throw new IllegalArgumentException(
      s"unsupported export suffix: $out (csv, json, parquet)")
  }
}
