package graft

import graft.sources.TierSchedule

/** Long-horizon TieredIndex schedule evidence (VERDICT r19 item 7):
  * drives [[graft.sources.TierSchedule.simulate]] — which executes the
  * REAL [[graft.sources.TieredIndex.mergeChoice]] policy — over 200+
  * maintenance passes on metadata alone, and prints the two numbers
  * the endurance runs can't reach: per-row-cohort rewrite counts over
  * the index's whole life (the O(log n) amortized claim) and the
  * worst single-pass pause proxy (rows rewritten) relative to store
  * size. No SparkSession: the schedule is pure driver arithmetic.
  *
  * Output is committed as tools/scale_evidence_tiersim_r20.log. */
object ScaleEvidenceTierSim {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(240)
    val base = args.lift(1).map(_.toLong).getOrElse(160000L) // rows/pass
    // slice cap in rows; Spec.mergeBytesCap's row-proxy. Default =
    // the Spec sizing rule: appends x log2(horizon).
    val slice = args.lift(2).map(_.toLong).getOrElse(
      base * math.max(1, math.ceil(
        math.log(passes.toDouble) / math.log(2)).toInt))

    def report(tag: String, appends: Int => Long, sliceRows: Long): Unit = {
      val r = TierSchedule.simulate(passes, appends, sliceRows = sliceRows)
      val gens = r.finalGens.map(_.rows).sorted
      val logBound = math.ceil(math.log(
        r.totalRows.toDouble / math.max(1L,
          (0 until passes).map(appends).filter(_ > 0).min)) / math.log(2)).toInt
      val merges = r.stats.count(_.merged)
      // pause proxy normalized by the store size AT THAT PASS
      val worst = r.stats.maxBy(_.rewrittenRows)
      val storeAtWorst = worst.gens.map(_.rows).sum
      println(f"[tiersim:$tag] passes=$passes total=${r.totalRows}%,d rows, " +
        f"merge-passes=$merges, sliceCap=${sliceRows}%,d rows")
      println(f"[tiersim:$tag]   rewrites/cohort: max=${r.maxRewrites} " +
        f"mean=${r.meanRewrites}%.2f  (log2(total/minAppend)=$logBound)")
      println(f"[tiersim:$tag]   worst pass: ${worst.rewrittenRows}%,d rows " +
        f"rewritten at pass ${worst.pass} = " +
        f"${100.0 * worst.rewrittenRows / storeAtWorst}%.1f%% of the " +
        f"then-store (${storeAtWorst}%,d rows); peak gen count " +
        f"${r.maxGenCount}")
      println(f"[tiersim:$tag]   final generations (${gens.size}): " +
        gens.map(x => f"$x%,d").mkString(" "))
      // rewrite histogram: how many cohorts saw k rewrites
      val hist = r.rewrites.values.groupBy(identity).view
        .mapValues(_.size).toSeq.sortBy(_._1)
      println(s"[tiersim:$tag]   rewrite histogram: " +
        hist.map { case (k, n) => s"${k}x:$n" }.mkString(" "))
    }

    // (a) steady state: the endurance run's shape, 60x longer
    report("steady", _ => base, slice)
    // (b) bursty: alternating starve/flood cadences (a crawl's diurnal
    // shape) — stratification must survive a 16x size spread
    report("bursty", p => if (p % 2 == 0) base / 4 else base * 4, slice)
    // (c) growth: the corpus ramps 1x -> 5x over the run (a scaling
    // crawl) — early small generations must not be re-merged forever
    report("growth", p => base * (1 + 4L * p / passes), slice)
    // (d) gaps: 1-in-4 cadences deliver nothing (backpressure /
    // maintenance-only windows)
    report("gaps", p => if (p % 4 == 3) 0L else base, slice)
    // (e) the r19 policy's failure shape for the record: UNSLICED
    // most-equal at the same horizon (worst pass = a whole top-tier
    // merge — what the slice cap exists to bound)
    report("unsliced", _ => base, 0L)
  }
}
