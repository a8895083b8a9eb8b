package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the most recent
  * right row with `right.time <= left.time` for the same key.
  *
  * ADAPTIVE plan shape (r14; detection column-pruned r15): one cheap
  * detection aggregation over the two KEY columns alone —
  * `groupBy(key).count` reduced to (total, max) — decides between two
  * differentially-equivalent physical forms:
  *
  *   - NO hub (largest key ≤ `hubFactor` × rows/partition): a single
  *     per-key running-`last` window. One shuffle, no sampling pass —
  *     the fast path when keys are plentiful and balanced (measured
  *     3.5× cheaper at 1M balanced rows than the bucketed form).
  *   - HUB detected: the r12 bucketed TWO-LEVEL carry below — a
  *     keyed window would serialize the hot key — one symbol/user
  *     carrying most of both sides — into one task's sort (windows
  *     have no map-side partials). The union
  * is range-bucketed on the global (key, time, src, hash) order with
  * sampled literal cut points (the PrefixSum/CorpusMix discipline):
  *
  *  1. within each (bucket, key) group — bounded by the bucket size
  *     ~ n/numPartitions by construction — a running
  *     `last(right, ignoreNulls)` window finds the latest right row
  *     at or before each left row inside the bucket;
  *  2. a per-(bucket, key) aggregate (combinable max-struct, map-side
  *     partials) reduces each bucket to its last right row per key;
  *     keys are contiguous in the range order, so this boundary table
  *     holds ~(#keys + #buckets) rows and each key spans at most
  *     #buckets of them — the per-key carry window over it is bounded
  *     by numPartitions, never by the key's row count;
  *  3. carry-in (the last right row in any EARLIER bucket of the same
  *     key) joins back on (bucket, key) and fills the rows step 1 left
  *     null.
  *
  * Both sides shuffle once on (bucket, key); the boundary-carry join
  * touches a table ~#keys rows. At 100 TB no task ever holds more
  * than one bucket, whatever the key skew.
  *
  * Ties: a right row at exactly left.time is visible to that left row
  * (src=right sorts before src=left at equal timestamps). Among right
  * rows with the SAME (key, time), the winner is deterministic — the
  * row with the greatest column-hash — but callers who care should
  * keep (key, time) unique on the right, as any as-of engine expects.
  * Fully duplicate rows (identical in every column) share a hash and
  * therefore a bucket; boundedness assumes rows are distinct-ish, the
  * same assumption every range partitioner makes.
  */
object AsOfJoin {
  /** Column names of `left` and `right` payloads must be disjoint.
    * `hubFactor` tunes the switch: the bucketed path engages once the
    * largest key exceeds `hubFactor` × (rows / shuffle partitions) —
    * i.e. once a keyed window's biggest task would sort materially
    * more than its fair share. 0 forces the bucketed path (the
    * scale-safe default shape); both paths are differentially pinned
    * row-identical in AsOfJoinPropSpec.
    *
    * UPSTREAM EXECUTION (ADVICE r15): hub detection is a separate
    * eager action over the key columns, so both inputs' upstream
    * plans run TWICE — once column-pruned for the stats, once for the
    * join itself. Free-ish when the inputs are parquet scans (the
    * stats pass prunes to one column); for EXPENSIVE upstream plans
    * cache/checkpoint the inputs first, and for NON-DETERMINISTIC
    * ones (rand(), unstable sampling) caching is REQUIRED — otherwise
    * the detection describes different rows than the window sees
    * (wrong-branch risk only: both branches stay row-identical on
    * whatever rows execute, so correctness never depends on the
    * stats, only the physical form does). */
  def asofBackward(left: DataFrame, leftKey: String, leftTime: String,
                   right: DataFrame, rightKey: String, rightTime: String,
                   inner: Boolean = true,
                   hubFactor: Double = 2.0): DataFrame = {
    val spark = left.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    // hub detection (SkewJoin's count-threshold convention, reduced
    // to two scalars): total rows + largest key's rows in ONE
    // map-side-combinable pass over the KEY COLUMNS ALONE (r15) — the
    // stats need nothing else, so the pass rides a column-pruned scan
    // of both sides instead of forcing the full tagged union to
    // materialize first (the r14 form checkpointed the whole union
    // before detecting; at 8M balanced rows that materialization was
    // most of the operator's 2.4x overhead vs a bare keyed window).
    val statsRow = left.select(left(leftKey).as("__k"))
      .unionByName(right.select(right(rightKey).as("__k")))
      .groupBy(col("__k")).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")), max(col("__n"))).head()
    val n = if (statsRow.isNullAt(0)) 0L else statsRow.getLong(0)
    val maxKeyRows = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)

    val lStruct = struct(left.columns.map(left(_)).toIndexedSeq: _*)
    val rStruct = struct(right.columns.map(right(_)).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("s")).schema.head.dataType
    val rType = right.select(rStruct.as("s")).schema.head.dataType
    // keys keep their own type: a numeric cast here would null out
    // string keys and silently collapse them into one window partition
    val lT = left.select(left(leftKey).as("__k"),
      left(leftTime).as("__t"), lit(1).as("__src"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rT = right.select(right(rightKey).as("__k"),
      right(rightTime).as("__t"), lit(0).as("__src"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    // __h: deterministic per-row tiebreak so equal-(k, t, src) runs —
    // the hub-key hot spot — can be SPLIT across buckets
    val u0 = lT.unionByName(rT)
    val uLazy = u0.withColumn("__h",
      xxhash64(struct(u0.columns.map(col).toIndexedSeq: _*)))

    if (n == 0 || maxKeyRows.toDouble <= hubFactor * n.toDouble / nPart) {
      // fast path: balanced keys — one per-key running-last window,
      // largest task bounded by maxKeyRows ≤ hubFactor × fair share.
      // The union stays LAZY: this branch consumes it exactly once,
      // so there is nothing to share and nothing to materialize
      val w = Window.partitionBy(col("__k"))
        .orderBy(col("__t"), col("__src"), col("__h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val joined = uLazy
        .withColumn("__rlast", last(col("__r"), ignoreNulls = true).over(w))
        .filter(col("__src") === 1)
      val kept = if (inner) joined.filter(col("__rlast").isNotNull) else joined
      return kept.select(col("__l.*"), col("__rlast.*"))
    }

    // bucketed path: the boundary SAMPLE and the main pass must read
    // identical rows, so here the union IS checkpointed — one upstream
    // execution shared by both consumers
    val u = uLazy.localCheckpoint(true)

    // sampled literal range boundaries over (key, time, src, hash) —
    // the PrefixSum discipline: deterministic hash-thinned sample,
    // size-bounded on the driver, cut points as literals so every
    // consumer of __b agrees on the layout.
    val orderCols = Seq("__k", "__t", "__src", "__h")
    val okey = struct(orderCols.map(col): _*)
    val target = 32L * math.max(nPart, 1)
    val mod = math.max(64L, if (n <= 0) 1L else (n + target - 1) / target)
    val sampleRows = u
      .filter(pmod(xxhash64(okey), lit(mod)) === 0)
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
    // binary-search when-tree (RangeCuts, r12): 5 struct compares/row
    // instead of 31 — same count-of-cuts-<=-key function
    val bucket = RangeCuts.bucketOf(okey, cuts.toIndexedSeq)
    val bucketed = u.withColumn("__b", bucket)

    // 1. within-(bucket, key) running last — bounded by bucket size
    val w = Window.partitionBy(col("__b"), col("__k"))
      .orderBy(col("__t"), col("__src"), col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("__rloc", last(col("__r"), ignoreNulls = true).over(w))

    // 2. boundary table: last right row per (bucket, key) — combinable
    // max-struct with the same (t, h) tie rule as the window above
    val bk = bucketed.groupBy(col("__b"), col("__k"))
      .agg(max(when(col("__src") === 0,
        struct(col("__t"), col("__h"), col("__r")))).as("__m"))
    // carry = last right row in strictly earlier buckets of this key;
    // per-key partition ≤ #buckets rows (keys are range-contiguous)
    val cw = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bk
      .withColumn("__c", last(col("__m"), ignoreNulls = true).over(cw))
      .select(col("__b").as("__cb"), col("__k").as("__ck"),
        col("__c").getField("__r").as("__rcb"))

    // 3. fill left rows whose bucket had no earlier right row. The
    // key equality is NULL-SAFE (<=>): window partitioning groups
    // null keys together on the fast path, so the bucketed carry must
    // match them too or the two differentially-pinned branches would
    // return different rows for null-key inputs (r14 review finding)
    val joined = local.join(carry,
        col("__b") === col("__cb") && col("__k") <=> col("__ck"), "left")
      .filter(col("__src") === 1)
      .withColumn("__rlast", coalesce(col("__rloc"), col("__rcb")))
    val kept = if (inner) joined.filter(col("__rlast").isNotNull) else joined
    kept.select(col("__l.*"), col("__rlast.*"))
  }
}
