package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Whole-document training-shard packing: assign documents to
  * fixed-token-budget bins WITHOUT splitting a document (the
  * complement of `p4_pack_sequences`' concat-and-split packing —
  * instruction-tuning / long-context corpora can't cut an example in
  * half).
  *
  * Bin assignment is inherently sequential (bin of doc i depends on
  * every doc before it), so the scale contract is the one production
  * packers use: shard the corpus (every real packing run writes many
  * shard files anyway), pack each shard independently with a
  * deterministic next-fit scan, and let shards run in parallel. Bin
  * quality is per-shard next-fit (each bin ≥ half full except a
  * shard's last, so ≤ 2× optimal bins; oversized docs sit alone in
  * their own bin); cross-shard coordination buys little and costs a
  * global barrier.
  *
  * Spark shape: ONE hash-partition shuffle on the shard id (whole
  * shards land in one partition), an in-partition sort, and one
  * imperative pass — the same plan skeleton as [[PrefixSum]] step 4.
  * Nothing collects to the driver. Determinism: (shardCol, orderCols)
  * must be a total order; given that, bin ids are reproducible under
  * any cluster parallelism (spec-asserted).
  */
object Packing {

  /** Append a `bin` column (0-based within each shard): next-fit
    * packing of `tokCol` (long) into `budget`-token bins, scanning
    * each shard in `orderCols` order. A document larger than `budget`
    * occupies a bin alone. */
  def packNextFit(df: DataFrame, shardCol: String, orderCols: Seq[String],
                  tokCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val arranged = df
      .repartition(nPart, col(shardCol))
      .sortWithinPartitions((col(shardCol) +: orderCols.map(col)): _*)
    val inSchema = arranged.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("bin", LongType, nullable = false))
    val shardIdx = inSchema.fieldIndex(shardCol)
    val tokIdx = inSchema.fieldIndex(tokCol)
    arranged.mapPartitions { rows =>
      // several shards share a partition; reset state at each boundary
      var curShard: Any = null
      var started = false
      var bin = 0L
      var fill = 0L
      rows.map { r =>
        val s = r.get(shardIdx)
        if (!started || s != curShard) {
          curShard = s; started = true; bin = 0L; fill = 0L
        }
        // fail fast with a diagnosable error instead of an executor
        // NPE / silently-corrupt fill accounting
        if (r.isNullAt(tokIdx))
          throw new IllegalArgumentException(
            s"packNextFit: null token count (row ${r.toSeq.take(4)})")
        val toks = r.getLong(tokIdx)
        if (toks < 0L)
          throw new IllegalArgumentException(
            s"packNextFit: negative token count $toks (row ${r.toSeq.take(4)})")
        if (fill > 0L && fill + toks > budget) { bin += 1L; fill = 0L }
        fill += toks
        Row.fromSeq(r.toSeq :+ bin)
      }
    }(Encoders.row(outSchema))
  }
}
