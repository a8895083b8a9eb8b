package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ql.spread

/** Paragraph-level dedup (C4/CCNet's middle layer between doc-level
  * exact dedup and substring dedup), in both batch (t30) and
  * incremental-ingest form.
  *
  * "Paragraphs" are fixed `width`-word segments — the driver corpus
  * has no newlines, and fixed segments make the oracle trivially
  * replayable; a newline-delimited corpus would swap `segments`'s
  * splitter and nothing else.
  *
  * The ingest path mirrors `minhashIndex`/`winnowIndex`: a persisted
  * (owner, seg) table IS the corpus state — a daily batch cleans
  * against it and appends only its own surviving segments, so corpus
  * text is never re-read. Everything is exact string equality on the
  * segment: no hashes to collide, replay-safe by owner comparison
  * (a replayed batch's own index rows never strip its text). */
object ParaDedup {

  /** (idCol, seg_idx, seg): fixed `width`-word segments of each doc,
    * in order. Map-side only (array arithmetic + posexplode). */
  def segments(df: DataFrame, idCol: String, textCol: String,
               width: Int = 10): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val words = split(col(textCol), " ")
    val segArr = transform(
      sequence(lit(0), ceil(size(words) / width.toDouble).cast("int") - 1),
      i => array_join(slice(words, i * width + 1, lit(width)), " "))
    spread(df).select(col(idCol),
      posexplode(segArr).as(Seq("seg_idx", "seg")))
  }

  /** Clean a NEW batch against a persisted segment index (`segments`
    * output, typically read back from parquet) AND against itself:
    *
    *  - a segment owned by a DIFFERENT doc in the index is cut;
    *  - within the batch, keep-first (min id owns the text, t30's
    *    rule — a doc's own repeats survive with it);
    *  - a doc's own index rows never cut it, so replaying a batch
    *    whose segments were already appended is a no-op, not a wipe.
    *
    * Returns (idCol, textCol cleaned, n_segs, n_kept) — one row per
    * batch doc. Appending `segments` of the SURVIVORS keeps the index
    * canonical (one owner per segment text). Cost: one segment-keyed
    * shuffle against the index + one window + one doc-keyed
    * reassembly; the corpus behind the index is never touched. */
  def cleanAgainstIndex(segIndex: DataFrame, batch: DataFrame,
                        idCol: String, textCol: String,
                        width: Int = 10): DataFrame = {
    val segs = segments(batch, idCol, textCol, width)
    // one owner per segment text; min() also collapses replayed
    // appends so index duplication cannot multiply batch rows
    val owners = segIndex.groupBy("seg")
      .agg(min(col(idCol)).as("_owner"))
    val w = Window.partitionBy("seg")
    val flagged = segs.join(owners, Seq("seg"), "left")
      .withColumn("_first", min(col(idCol)).over(w))
      .withColumn("keep",
        (col("_owner").isNull || col("_owner") === col(idCol)) &&
          col("_first") === col(idCol))
    flagged.groupBy(idCol)
      .agg(count(lit(1)).as("n_segs"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("seg_idx"), col("seg"))))),
            p => p.getField("seg")),
          " ").as(textCol))
      .select(col(idCol), col(textCol), col("n_segs"), col("n_kept"))
  }
}
