package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic directory replacement for persisted artifacts (compacted
  * shard dirs, drift count stores, bloom sketches): a writer produces
  * a complete TWIN directory beside the target, then [[swap]] makes it
  * the target using RENAMES ONLY —
  *
  *   1. rename target  → `<target>__old`   (atomic)
  *   2. rename twin    → target            (atomic)
  *   3. delete `<target>__old`             (garbage by then)
  *
  * A crash at any point leaves at least one COMPLETE copy of the data
  * under a known name, so [[recover]] can always restore the store
  * (ADVICE r14: the previous delete-then-rename protocol had a window
  * where a crash mid-recursive-delete left a partial target that
  * recovery preferred over the complete twin — rename is atomic on
  * local/HDFS semantics, recursive delete is not). The only step that
  * can leave partial state is the delete of `__old`, and `__old` is
  * never the preferred copy when the target exists.
  *
  * [[recover]] is idempotent — run it before reading or re-writing a
  * store that uses this protocol:
  *
  *   - `__old` present, target present   → crash mid-step-3 (the swap
  *     completed; the possibly-partial `__old` is garbage) or inside
  *     [[swap]]'s defensive stale-`__old` delete before step 1 (the
  *     target is intact, the complete twin is an uncommitted rewrite)
  *     — the target is the preferred copy either way: delete `__old`
  *     AND any lingering twin in the same pass (the interrupted
  *     rewrite just re-runs).
  *   - `__old` present, target absent, twin present → crash between
  *     steps 1 and 2: the twin is complete BY PROTOCOL (the target is
  *     only renamed away after the twin write finished) — rename the
  *     twin in, delete `__old`.
  *   - `__old` present alone → outside the protocol's reachable
  *     states; `__old` holds the last complete target — restore it.
  *   - twin present, target present, no `__old` → crash mid-twin-write
  *     (the twin may be partial, the target is intact) — discard the
  *     twin; the interrupted rewrite just re-runs.
  *   - twin present alone → the pre-r15 delete+rename layout's
  *     crash-between state (twin complete) — rename it in.
  */
private[graft] object DirSwap {

  private val OldSuffix = "__old"

  /** (FileSystem, Path) of a store path — the pair every caller of
    * this protocol needs (was duplicated per call site). */
  def fsOf(spark: org.apache.spark.sql.SparkSession,
           path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def oldPath(target: Path): Path =
    new Path(target.getParent, target.getName + OldSuffix)

  /** True if `name` is a twin/backup artifact of this protocol (never
    * list such dirs as data). */
  def isScratch(name: String, twinSuffix: String): Boolean =
    name.endsWith(twinSuffix) || name.endsWith(OldSuffix)

  /** Base target name of a scratch dir name. */
  def baseOf(name: String, twinSuffix: String): String =
    name.stripSuffix(twinSuffix).stripSuffix(OldSuffix)

  /** True iff `dir` exists and holds at least one committed parquet
    * data file at its top level. A directory that exists WITHOUT data
    * files is a crash leftover (a write that died before its commit —
    * only `_temporary`/`_SUCCESS` debris inside), never a committed
    * store: every writer of this protocol commits at least one part
    * file. Callers use this to treat such dirs as absent — including
    * the case where [[recover]]'s twin-alone rule promoted a PARTIAL
    * first-write twin (the twin-alone state is only guaranteed
    * complete when a target once existed; a brand-new store's first
    * twin write can die partial with no old copy to prefer). */
  def hasData(fs: FileSystem, dir: Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Make the complete `twin` directory become `target` (see object
    * doc for the crash analysis). */
  def swap(fs: FileSystem, target: Path, twin: Path): Unit = {
    val old = oldPath(target)
    if (fs.exists(old)) fs.delete(old, true) // stale garbage, defensive
    if (fs.exists(target))
      require(fs.rename(target, old), s"rename $target -> $old failed")
    require(fs.rename(twin, target), s"rename $twin -> $target failed")
    fs.delete(old, true)
  }

  /** Restore `target` after a possible crash (idempotent; see object
    * doc for the case table). */
  def recover(fs: FileSystem, target: Path, twinSuffix: String): Unit = {
    val old = oldPath(target)
    val twin = new Path(target.getParent, target.getName + twinSuffix)
    if (fs.exists(old)) {
      if (fs.exists(target)) {
        // old+target(+twin): the swap either completed (old is
        // garbage, twin already renamed away) or crashed inside the
        // defensive stale-__old delete BEFORE step 1 with a complete
        // twin beside the intact target — either way the target is
        // the preferred copy; drop BOTH scratch dirs in this one pass
        // (ADVICE r15: leaving the twin made the clean state need a
        // second recover; the interrupted rewrite just re-runs)
        fs.delete(old, true)
        if (fs.exists(twin)) fs.delete(twin, true)
      }
      else if (fs.exists(twin)) {
        require(fs.rename(twin, target), s"rename $twin -> $target failed")
        fs.delete(old, true)
      } else
        require(fs.rename(old, target), s"rename $old -> $target failed")
    } else if (fs.exists(twin)) {
      if (fs.exists(target)) fs.delete(twin, true)
      else require(fs.rename(twin, target), s"rename $twin -> $target failed")
    }
  }
}
