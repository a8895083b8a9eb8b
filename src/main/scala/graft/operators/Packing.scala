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

  /** First-fit-decreasing packing (r11): per shard, documents in
    * (`tokCol` DESC, orderCols) order each go to the FIRST open bin
    * with room, else open a new one — the classic FFD ≤ 11/9·OPT+6/9
    * guarantee vs next-fit's 2×OPT (decreasing order is what defeats
    * next-fit's half-empty-bin tail). A document larger than `budget`
    * opens a bin alone and nothing else ever fits there.
    *
    * Same plan skeleton as [[packNextFit]] (shard-hash shuffle,
    * in-partition sort, one imperative pass, nothing on the driver);
    * extra state per task is the current shard's open-bin fill array —
    * ≤ shardTokens/budget longs — and the first-fit scan is linear in
    * open bins, so shards should be sized to keep bins in the
    * thousands (production packing runs shard to file-sized outputs
    * anyway). Determinism: (`tokCol` DESC, orderCols) must totally
    * order each shard — orderCols breaks token-count ties. */
  def packFirstFitDecreasing(df: DataFrame, shardCol: String,
                             orderCols: Seq[String], tokCol: String,
                             budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val arranged = df
      .repartition(nPart, col(shardCol))
      .sortWithinPartitions(
        col(shardCol) +: col(tokCol).desc +: orderCols.map(col): _*)
    val inSchema = arranged.schema
    val outSchema = StructType(inSchema.fields :+
      StructField("bin", LongType, nullable = false))
    val shardIdx = inSchema.fieldIndex(shardCol)
    val tokIdx = inSchema.fieldIndex(tokCol)
    arranged.mapPartitions { rows =>
      var curShard: Any = null
      var started = false
      var fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      rows.map { r =>
        val s = r.get(shardIdx)
        if (!started || s != curShard) {
          curShard = s; started = true
          fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        }
        if (r.isNullAt(tokIdx))
          throw new IllegalArgumentException(
            s"packFirstFitDecreasing: null token count (row ${r.toSeq.take(4)})")
        val toks = r.getLong(tokIdx)
        if (toks < 0L)
          throw new IllegalArgumentException(
            s"packFirstFitDecreasing: negative token count $toks (row ${r.toSeq.take(4)})")
        var i = 0
        while (i < fills.length && fills(i) + toks > budget) i += 1
        if (i == fills.length) fills += toks else fills(i) += toks
        Row.fromSeq(r.toSeq :+ i.toLong)
      }
    }(Encoders.row(outSchema))
  }
}
