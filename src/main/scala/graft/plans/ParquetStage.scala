// Lives in org.apache.spark.sql.graftshim like PlanBridge: the staging
// writer drives Spark's own ParquetWriteSupport (an internal class) so a
// row-level operation's task writers produce byte-identical parquet to
// what the engine's own DataFrame writes produce — same INT64-micros
// timestamps, same logical types, same footer stats.
package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Executor-side `InternalRow` → parquet writer for DSv2 staging tasks
  * (the graft-z row-level operation's per-task spill — see
  * [[graft.sources.ZRowLevelBatchWrite]]). ParquetWriteSupport reads its
  * knobs from the Configuration with `conf.get(key).toBoolean`-style
  * accesses, so every key it consults must be SET explicitly — a missing
  * key is `"null".toBoolean`, not a default (the same trap as the
  * vectorized reader's converter flags, CLAUDE.md). Values pin the
  * store's write contract: Spark-4 logical types, timestamps always
  * INT64 micros, proleptic calendar (CORRECTED). */
object ParquetStage {
  def writer(file: Path, schema: StructType,
      conf0: Configuration): ParquetWriter[InternalRow] = {
    // a PRIVATE copy: the schema key must not leak into a shared conf
    val conf = new Configuration(conf0)
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    new Builder(file).withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  private final class Builder(file: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](file) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport()
  }
}
