package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global running sum — the scale-correct form of
  * `SUM(x) OVER (ORDER BY ...)` with no PARTITION BY. An
  * un-partitioned Spark window moves the WHOLE dataset into one task
  * (the classic 100 TB trap); this operator keeps every pass parallel
  * and executes its input exactly ONCE (eager localCheckpoint up
  * front — count, boundary sample, shuffle, partials and the final
  * pass all read the checkpointed blocks, never the source):
  *
  *  1. collect a deterministic hash-sample of the order keys and cut
  *     it into numPartitions literal range boundaries (one small job;
  *     the only driver-side data is the boundary list);
  *  2. bucket each row against the literal boundaries and
  *     hash-repartition on the bucket id — equal buckets land whole in
  *     one partition — sorting (bucket, orderCols) within partitions;
  *  3. aggregate per-bucket delta totals (numPartitions tiny rows),
  *     exclusive-prefix-scan them on the driver, broadcast;
  *  4. one imperative per-partition pass emits the running sum,
  *     re-seeding from the bucket offset whenever the bucket changes.
  *
  * Why literal boundaries instead of `repartitionByRange`: the range
  * partitioner re-SAMPLES per query execution (seeded by the fresh
  * RDD id), so two jobs over the same frame can disagree about which
  * partition a row lands in — the partial sums of pass 3 would not
  * line up with the layout of pass 4. Literal boundaries make both
  * passes bit-identical with nothing persisted.
  *
  * Determinism: callers must supply a TOTAL order (include tiebreak
  * columns); deltas are longs so accumulation is exact in any order.
  * The boundary sample is SIZE-BOUNDED independent of n (VERDICT r5
  * item 5): one exact count sizes a second-level hash thinning so the
  * driver collects ~`boundaryKeysPerPartition`·nPart keys whatever the
  * input size — at 10¹² rows the sample is still ~1k keys, not n/64.
  * `sampleMod` remains the MINIMUM thinning (small inputs behave
  * exactly as before; the count-derived modulus only kicks in when
  * n outgrows sampleMod·target). Balance, not correctness, depends on
  * the sample: sums are exact for any cut set.
  */
object PrefixSum {

  /** Boundary keys targeted per output partition — enough for ±few-%
    * bucket balance, small enough that the driver never holds more
    * than ~targetKeys rows of order columns. */
  private[graft] val boundaryKeysPerPartition = 32L

  /** Effective hash-thinning modulus: the caller's floor, raised until
    * the expected sample n/mod is ≤ boundaryKeysPerPartition·nPart.
    * Pure — specced directly at astronomic n. */
  private[graft] def effectiveSampleMod(n: Long, sampleMod: Int, nPart: Int): Long = {
    val target = boundaryKeysPerPartition * math.max(nPart, 1)
    math.max(sampleMod.toLong, if (n <= 0) 1L else (n + target - 1) / target)
  }

  /** Fail-fast input contract shared by both entry points (ADVICE
    * r11): `delta` must be an INTEGRAL column — it is cast up to long
    * here (a non-integral type would silently truncate; an untouched
    * IntegerType would pass analysis and ClassCastException mid-job) —
    * and nulls in `delta` or the order/reset columns error at
    * materialization time with a named message instead of breaking the
    * bucket-contiguity assumption downstream (null order keys compare
    * null against the literal cut points, landing rows in bucket 0
    * regardless of position). Returns the guarded long delta column. */
  private def guardedDelta(df: DataFrame, delta: String,
                           nonNullCols: Seq[String]): Column = {
    import org.apache.spark.sql.types._
    val dt = df.schema(delta).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"runningSum delta column '$delta' must be integral, got ${dt.simpleString}")
    val anyNull = (delta +: nonNullCols).map(col(_).isNull).reduce(_ || _)
    when(anyNull, raise_error(lit(
      s"PrefixSum: null in delta '$delta' or order/reset columns " +
        s"${nonNullCols.mkString("(", ",", ")")} — supply non-null totals")))
      .otherwise(col(delta).cast("long"))
  }

  /** Append running-sum column `out` of integral column `delta`,
    * ordered by `orderCols` (ascending, total order, non-null). */
  def runningSumLong(df: DataFrame, orderCols: Seq[String], delta: String,
                     out: String, sampleMod: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val key = struct(orderCols.map(col): _*)

    // 0. ONE upstream execution. Count, boundary sample, the bucketing
    // shuffle, partials, and the final pass all read these blocks; the
    // source (and any expression feeding `delta` — for p4 that's a
    // tokenizer over the whole corpus) is never scanned again. Without
    // this the operator cost three source scans per call. The guarded
    // __d column fails fast here, at materialization.
    val src = df.withColumn("__d", guardedDelta(df, delta, orderCols))
      .localCheckpoint(true)

    // 1. deterministic bounded boundary sample -> nPart-1 literal cut
    // points. Count + sample are cheap block scans; the sample filter
    // is partition-layout-independent (pure hash of the order key), so
    // the cut set — and therefore the bucket layout — is reproducible.
    val mod = effectiveSampleMod(src.count(), sampleMod, nPart)
    val sampleRows = src
      .filter(pmod(xxhash64(key), lit(mod)) === 0)
      .select(orderCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .collect()
    val cuts: Seq[Column] =
      if (sampleRows.isEmpty) Seq.empty
      else (1 until nPart).flatMap { i =>
        val idx = (i.toLong * sampleRows.length / nPart).toInt
        if (idx == 0) None
        else Some(struct(orderCols.zipWithIndex.map { case (c, j) =>
          lit(sampleRows(idx).get(j)).as(c)
        }: _*))
      }

    // 2. bucket against the literals; whole buckets hash to partitions.
    // Eager localCheckpoint: the partials job (step 3) and the final
    // pass (step 4) both consume this layout — without it the
    // shuffle + sort over the src blocks would execute twice (blocks
    // free when the plan drops out of scope; the literal boundaries
    // additionally guarantee both passes agree even if a caller
    // re-executes).
    val bucket = RangeCuts.bucketOf(key, cuts.toIndexedSeq)
    val bucketed = src.withColumn("__b", bucket)
      .repartition(nPart, col("__b"))
      .sortWithinPartitions((col("__b") +: orderCols.map(col)): _*)
      .localCheckpoint(true)

    // 3. per-bucket totals -> exclusive prefix offsets (driver-tiny)
    val partials = bucketed.groupBy(col("__b"))
      .agg(sum(col("__d")).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val maxB = if (partials.isEmpty) -1 else partials.keys.max
    val offsets = new Array[Long](maxB + 2)
    var acc = 0L
    for (b <- 0 to maxB) {
      offsets(b) = acc
      acc += partials.getOrElse(b, 0L)
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // 4. imperative within-partition pass, re-seeded per bucket
    val inSchema = bucketed.schema
    val outSchema = StructType(
      inSchema.fields.filterNot(f => f.name == "__b" || f.name == "__d") :+
        StructField(out, LongType, nullable = false))
    val deltaIdx = inSchema.fieldIndex("__d")
    val bIdx = inSchema.fieldIndex("__b")
    val keepIdx = inSchema.fields.indices
      .filterNot(i => i == bIdx || i == deltaIdx)

    bucketed.mapPartitions { rows =>
      var curB = -1
      var run = 0L
      rows.map { r =>
        val b = r.getInt(bIdx)
        if (b != curB) { run = bcOffsets.value(b); curB = b }
        run += r.getLong(deltaIdx)
        Row.fromSeq(keepIdx.map(r.get) :+ run)
      }
    }(Encoders.row(outSchema))
  }

  /** KEYED running sum: `SUM(delta) OVER (PARTITION BY resetCol ORDER
    * BY orderCols)` — the scale-correct form when a key's group can be
    * corpus-sized (a mega-stratum: "en" in a language-keyed corpus
    * mix). A keyed Spark window sorts each key's ENTIRE group in one
    * task; here the global order (resetCol, orderCols...) is bucketed
    * exactly like `runningSumLong`, and accumulation re-seeds whenever
    * the reset key changes.
    *
    * Cross-bucket seeding stays driver-tiny at ANY strata cardinality:
    * strata are contiguous in the global order, so only the ONE
    * stratum that spans each bucket boundary needs an offset. A
    * per-bucket (first, last) reset-key aggregate (nPart rows)
    * identifies those spanning strata; only THEIR per-bucket sums are
    * collected (≤ nPart·nPart worst case, ~nPart in practice) — never
    * a per-stratum collect. Non-spanning strata start at 0 inside
    * their bucket. `resetCol` values must be non-null (null is a
    * MIN/MAX-invisible key and would break boundary detection). */
  def runningSumLongKeyed(df: DataFrame, resetCol: String,
                          orderCols: Seq[String], delta: String,
                          out: String, sampleMod: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val allOrder = resetCol +: orderCols
    val key = struct(allOrder.map(col): _*)

    val src = df.withColumn("__d", guardedDelta(df, delta, allOrder))
      .localCheckpoint(true)
    val mod = effectiveSampleMod(src.count(), sampleMod, nPart)
    val sampleRows = src
      .filter(pmod(xxhash64(key), lit(mod)) === 0)
      .select(allOrder.map(col): _*)
      .orderBy(allOrder.map(col): _*)
      .collect()
    val cuts: Seq[Column] =
      if (sampleRows.isEmpty) Seq.empty
      else (1 until nPart).flatMap { i =>
        val idx = (i.toLong * sampleRows.length / nPart).toInt
        if (idx == 0) None
        else Some(struct(allOrder.zipWithIndex.map { case (c, j) =>
          lit(sampleRows(idx).get(j)).as(c)
        }: _*))
      }
    val bucket = RangeCuts.bucketOf(key, cuts.toIndexedSeq)
    val bucketed = src.withColumn("__b", bucket)
      .repartition(nPart, col("__b"))
      .sortWithinPartitions((col("__b") +: allOrder.map(col)): _*)
      .localCheckpoint(true)

    // strata spanning a bucket boundary: last key of bucket b ==
    // first key of bucket b+1 (nPart-row aggregate, driver-tiny)
    val bounds = bucketed.groupBy(col("__b"))
      .agg(min(col(resetCol)).as("f"), max(col(resetCol)).as("l"))
      .collect()
      .map(r => r.getInt(0) -> ((r.get(1), r.get(2))))
      .toMap
    val spanning: Set[Any] = bounds.keys.toSeq.sorted.sliding(2).collect {
      case Seq(a, b) if java.util.Objects.equals(bounds(a)._2, bounds(b)._1) =>
        bounds(a)._2
    }.toSet
    // exclusive per-bucket prefix of each spanning stratum's sums
    val offsets: Map[(Int, Any), Long] =
      if (spanning.isEmpty) Map.empty
      else {
        val spanSeq = spanning.toSeq
        val partials = bucketed
          .filter(col(resetCol).isInCollection(spanSeq))
          .groupBy(col("__b"), col(resetCol))
          .agg(sum(col("__d")).as("s"))
          .collect()
          .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
        partials.groupBy(_._2).flatMap { case (k, rows) =>
          var acc = 0L
          rows.sortBy(_._1).map { case (b, _, s) =>
            val o = ((b, k): (Int, Any)) -> acc
            acc += s
            o
          }
        }
      }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    val inSchema = bucketed.schema
    val outSchema = StructType(
      inSchema.fields.filterNot(f => f.name == "__b" || f.name == "__d") :+
        StructField(out, LongType, nullable = false))
    val deltaIdx = inSchema.fieldIndex("__d")
    val bIdx = inSchema.fieldIndex("__b")
    val rIdx = inSchema.fieldIndex(resetCol)
    val keepIdx = inSchema.fields.indices
      .filterNot(i => i == bIdx || i == deltaIdx)

    bucketed.mapPartitions { rows =>
      var curB = -1
      var curK: Any = null
      var started = false
      var run = 0L
      rows.map { r =>
        val b = r.getInt(bIdx)
        val k = r.get(rIdx)
        if (b != curB || !started || !java.util.Objects.equals(k, curK)) {
          run = bcOffsets.value.getOrElse((b, k), 0L)
          curB = b; curK = k; started = true
        }
        run += r.getLong(deltaIdx)
        Row.fromSeq(keepIdx.map(r.get) :+ run)
      }
    }(Encoders.row(outSchema))
  }
}
