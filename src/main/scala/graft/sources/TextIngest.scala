package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema'd ingestion of line-oriented text formats (JSONL / CSV) with
  * malformed-record quarantine — the shape raw pipeline data actually
  * arrives in before it becomes parquet.
  *
  * Both readers run PERMISSIVE with an explicit schema (never inference:
  * at 100 TB schema inference is an extra full pass, and a drifting
  * inferred schema silently changes downstream types). Rows that fail to
  * parse land in `_corrupt_record` and are split out, so one bad line in
  * a billion-line shard quarantines that LINE, not the shard — the
  * file-level analog is `ignoreCorruptFiles` (StorageSpec).
  *
  * Returns (good, quarantined): `good` carries the target schema,
  * `quarantined` carries the raw offending line for triage. Both are
  * plain scans — zero shuffle, partitioned by the source files.
  */
object TextIngest {

  private val corruptCol = "_corrupt_record"

  private def split(raw: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val cached = raw.cache() // one scan feeds both splits
    val good = cached.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = cached.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (good, bad)
  }

  /** JSONL (one JSON object per line). */
  def readJsonl(s: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val raw = s.read
      .schema(schema.add(corruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
    split(raw, schema)
  }

  /** Headerless CSV with an explicit schema. */
  def readCsv(s: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val raw = s.read
      .schema(schema.add(corruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("header", "false")
      .csv(path)
    split(raw, schema)
  }
}
