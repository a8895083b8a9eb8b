package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY §5): when a few hot keys
  * dominate, a plain hash join routes them to single tasks. Salting
  * splits each hot key into `salts` sub-keys: the fact side gets a
  * deterministic salt from a row-unique column, the dim side is
  * replicated `salts` times for that key — result set is identical to
  * the plain join (q_salted_join oracle + SkewJoinSpec differential),
  * wall-clock bounded by hotKeyCount/salts instead of hotKeyCount.
  *
  * Only HOT keys are salted (VERDICT r1 item 6): replicating the dim
  * side for every key multiplies the whole shuffle/build volume by
  * `salts` to fix a skew only a few keys have. Hot keys come from an
  * explicit list or a count-threshold detection pass; cold keys keep
  * salt 0 on both sides — dim rows for them are NOT replicated.
  *
  * (AQE's skewJoin handles sort-merge skew automatically at runtime;
  * explicit salting remains the tool for broadcast-ineligible dims and
  * for aggregations over skewed keys.)
  */
object SkewJoin {

  /** Keys of `df` with at least `threshold` rows. One map-side-combine
    * aggregation pass; the output is tiny by construction (it is the
    * hot set) — broadcast it. Eagerly checkpointed so the two salt
    * lookups don't re-run the detection scan. */
  def detectHotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key).as("__hot_key")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= threshold).select("__hot_key")
      .localCheckpoint(true)

  /** The dim side with its conditional salt: `salts` replicas for hot
    * keys, exactly one row (salt 0) for cold keys. Public so the
    * no-cold-replication property is assertable (SkewJoinSpec).
    * `hotKeys` must be a 1-column frame named `__hot_key` with
    * DISTINCT values (the shape `detectHotKeys` produces and
    * `saltedJoin` normalizes to); duplicates here would duplicate
    * join results. */
  def saltedDim(right: DataFrame, rightKey: String, salts: Int,
                hotKeys: DataFrame): DataFrame =
    right.join(broadcast(hotKeys), right(rightKey) === col("__hot_key"), "left")
      .withColumn("__salt", explode(
        when(col("__hot_key").isNotNull, sequence(lit(0L), lit(salts - 1L)))
          .otherwise(sequence(lit(0L), lit(0L)))))
      .drop("__hot_key")

  /** `uniqueCols` must be row-unique on `left` (e.g. its primary key)
    * so the salt is deterministic — keeps results reproducible and
    * oracle-comparable, unlike rand()-based salting.
    *
    * Hot keys: pass `hotKeys` — any single-column DataFrame of key
    * values (from `detectHotKeys`, or a literal list known from data
    * profiling); its one column is taken whatever its name, and the
    * values are de-duplicated here, because a duplicated hot-key row
    * would otherwise silently duplicate every matching result row
    * through the two salt lookups. Alternatively `hotKeyThreshold` > 0
    * detects hot keys from `left`. With neither, EVERY key is salted —
    * the pre-r2 behavior, kept for when the skew profile is unknown
    * and the dim is small enough to pay `salts`× replication. */
  def saltedJoin(left: DataFrame, leftKey: String, uniqueCols: Seq[String],
                 right: DataFrame, rightKey: String,
                 salts: Int = 8,
                 hotKeys: Option[DataFrame] = None,
                 hotKeyThreshold: Long = 0L): DataFrame = {
    val factSalt = pmod(xxhash64(uniqueCols.map(col): _*), lit(salts.toLong))
    val hot = hotKeys.map { hk =>
      require(hk.columns.length == 1,
        s"hotKeys must be a single-column frame of key values, got ${hk.columns.mkString(", ")}")
      // normalize + distinct: the hot set is tiny by contract, so the
      // extra aggregation is noise next to silently-wrong duplicates
      hk.select(col(hk.columns.head).as("__hot_key")).distinct()
    }.orElse(
      if (hotKeyThreshold > 0L) Some(detectHotKeys(left, leftKey, hotKeyThreshold))
      else None)
    val (l, r) = hot match {
      case Some(hk) =>
        val l2 = left.join(broadcast(hk), left(leftKey) === col("__hot_key"), "left")
          .withColumn("__salt",
            when(col("__hot_key").isNotNull, factSalt).otherwise(lit(0L)))
          .drop("__hot_key")
        (l2, saltedDim(right, rightKey, salts, hk))
      case None =>
        (left.withColumn("__salt", factSalt),
          right.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L)))))
    }
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
