package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bucket assignment against sorted literal range boundaries — the
  * shared step of the literal-cuts discipline (PrefixSum, AsOfJoin):
  * bucket(row) = #cuts ≤ key, evaluated per row with NO driver state
  * beyond the literals themselves.
  *
  * r12: a balanced `when`-tree (binary search) instead of the linear
  * `Σ when(key >= cut, 1)` chain — ⌈log₂ N⌉ struct comparisons per
  * row instead of N (5 vs 31 at the default 32 partitions; the chain
  * was the dominant per-row cost of the as-of join's bucketing pass).
  * Exactly the same function: cuts are sorted (possibly with
  * duplicates — a skewed sample repeats values), and the tree
  * resolves to the unique index i with cuts[<i] ≤ key < cuts[≥i],
  * which IS the chain's count. A null comparison (null key fields)
  * takes every `otherwise` branch and lands in bucket 0, matching
  * the chain where each null compare contributed 0
  * (RangeCutsSpec pins the equivalence on nulls and duplicate cuts).
  */
object RangeCuts {

  /** Index of `key` among ascending `cuts`: the count of cuts ≤ key,
    * in [0, cuts.length]. Empty cuts → bucket 0. */
  def bucketOf(key: Column, cuts: IndexedSeq[Column]): Column = {
    def go(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(key >= cuts(mid), go(mid + 1, hi)).otherwise(go(lo, mid))
      }
    if (cuts.isEmpty) lit(0) else go(0, cuts.length)
  }
}
