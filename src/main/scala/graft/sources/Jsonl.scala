package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) corpus I/O — the interchange format
  * LLM-corpus tooling actually ships (one document object per line).
  *
  * Scale discipline this wrapper enforces:
  *  - an EXPLICIT schema is required: schema inference reads the data
  *    once before reading the data — a free extra pass nobody notices
  *    at a gigabyte and nobody survives at 100 TB. For dev,
  *    `inferFromSample` runs inference on a bounded sampled read and
  *    returns the schema to pin in code.
  *  - malformed lines are CAPTURED, not fatal and not silently
  *    dropped: PERMISSIVE mode + a corrupt-record column, so a crawl
  *    batch with 0.01% garbage yields data + a quarantine frame
  *    instead of a dead job (`FAILFAST` available when corruption
  *    must abort).
  * Reads parallelize per file and per line-split like any text
  * source; writes shard per partition. */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read with a pinned schema. The corrupt-record column is appended
    * automatically in permissive mode; rows whose line failed to parse
    * have every data field null and the raw line there. */
  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "PERMISSIVE"): DataFrame = {
    val full =
      if (mode.equalsIgnoreCase("PERMISSIVE") && !schema.fieldNames.contains(CorruptCol))
        schema.add(CorruptCol, StringType, nullable = true)
      else schema
    spark.read
      .schema(full)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** The clean rows and the quarantine frame. The parsed read is
    * cached: Spark refuses queries that reference ONLY the internal
    * corrupt-record column of a raw JSON scan (the quarantine side
    * does exactly that) unless they run over a materialized plan —
    * this is the engine's documented contract, and the cache also
    * keeps the split one underlying pass. Callers unpersist when done
    * (or let the ContextCleaner). */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    val df = read(spark, path, schema).cache()
    (df.filter(df(CorruptCol).isNull).drop(CorruptCol),
      df.filter(df(CorruptCol).isNotNull).select(CorruptCol))
  }

  /** Dev helper: infer the schema from a bounded sampled read and
    * return it for pinning in code. NOT for production paths — the
    * inference pass reads `samplingRatio` of every file. */
  def inferFromSample(spark: SparkSession, path: String,
                      samplingRatio: Double = 0.1): StructType = {
    require(samplingRatio > 0 && samplingRatio <= 1,
      s"samplingRatio must be in (0,1], got $samplingRatio")
    spark.read.option("samplingRatio", samplingRatio).json(path).schema
  }

  /** Write as JSONL, one object per line, sharded per partition.
    * zstd: the modern corpus-interchange default (seekable-enough
    * splits come from file sharding, not the codec). */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
