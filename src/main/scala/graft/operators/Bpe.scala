package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ql.spread

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-build stage of a training-data pipeline.
  *
  * The scale insight is the paper's own: BPE trains on the WORD
  * FREQUENCY table, not the corpus. One corpus-sized word-count
  * aggregation (the word-count shuffle, map-side combining) reduces
  * 100 TB of text to a vocab-bounded (word, count) table — a few
  * million rows regardless of corpus size — and every merge iteration
  * runs on that table: explode adjacent symbol pairs, weight by word
  * count, pick the argmax pair (ONE collected row per iteration — the
  * model trickles to the driver, the data never does).
  *
  * Segmentations are array<string> symbol columns; applying a merge
  * (a, b) is a left-to-right fold that joins an adjacent (a, b) into
  * ab — exactly BPE's greedy merge order on overlaps ("aaaa" +
  * merge(a,a) → ["aa","aa"], not ["aa","a","a"]). Words are short, so
  * the per-element array rebuild is O(|word|²) on tiny arrays — and
  * it runs on the vocab table, not the corpus.
  *
  * Determinism: pair selection breaks count ties on (a asc, b asc),
  * and the per-iteration pair counts are exact integer sums — merges
  * are reproducible under any partitioning (BpeSpec pins the classic
  * textbook merge sequence and partition invariance). */
object Bpe {

  /** Left-to-right BPE merge of adjacent (a, b) → ab over a symbol
    * array. */
  private def applyMerge(arr: Column, a: String, b: String): Column =
    aggregate(arr, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), s))))
        .otherwise(concat(acc, array(s))))

  /** Adjacent symbol pairs of one segmentation, as (a, b) structs.
    * The tail slice is size-bounded: slice(arr, 2, Int.MaxValue)
    * overflows the slice bound and yields an empty array. */
  private def pairs(arr: Column): Column =
    filter(
      zip_with(arr, slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
        (x, y) => struct(x.as("a"), y.as("b"))),
      p => p.getField("b").isNotNull)

  /** The vocab-bounded training table: (syms = single-char symbol
    * array, cnt = word frequency). */
  def wordTable(corpus: DataFrame, textCol: String): DataFrame =
    spread(corpus)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))

  /** One learned merge: the pair, its weighted adjacency count at
    * selection time, and the corpus token count after applying it.
    * (`n` can exceed the applied-merge count on overlap chains —
    * "aaaa" counts (a,a) three times but merges twice — so
    * `toksAfter` is measured, not derived.) */
  final case class MergeStep(a: String, b: String, n: Long, toksAfter: Long)

  /** Train `numMerges` merges. Returns (merges in order, final word
    * table (syms, cnt)). Each iteration: one pair-count aggregation
    * over the word table + one 1-row collect; the table re-segments
    * via the fold and checkpoints every few rounds to cap lineage. */
  def train(corpus: DataFrame, textCol: String,
            numMerges: Int): (Seq[(String, String)], DataFrame) = {
    val (steps, vocab) = core(corpus, textCol, numMerges, stats = false)
    (steps.map(s => (s.a, s.b)), vocab)
  }

  /** Like [[train]] but each step carries its pair count and the
    * post-merge corpus token count (one extra vocab-bounded job per
    * iteration) — the per-step trajectory t23_bpe reports. */
  def trainDetailed(corpus: DataFrame, textCol: String,
                    numMerges: Int): (Seq[MergeStep], DataFrame) =
    core(corpus, textCol, numMerges, stats = true)

  private def core(corpus: DataFrame, textCol: String, numMerges: Int,
                   stats: Boolean): (Seq[MergeStep], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var vocab = wordTable(corpus, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[MergeStep]
    var done = false
    for (i <- 1 to numMerges if !done) {
      val best = vocab
        .select(col("cnt"), explode(pairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true // every word fully merged
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        val next = vocab.select(applyMerge(col("syms"), a, b).as("syms"), col("cnt"))
        vocab = if (stats || i % 4 == 0 || i == numMerges) next.localCheckpoint(true)
                else next
        val toks = if (stats)
          vocab.select(sum(size(col("syms")).cast("long") * col("cnt")))
            .collect().head.getLong(0)
        else -1L
        merges += MergeStep(a, b, best.head.getLong(2), toks)
      }
    }
    (merges.result(), vocab)
  }

  /** Apply trained merges to a text column: adds `bpe_tokens` (count)
    * and `bpe_seg` (space-joined segmentation). Words segment
    * independently (merges never bridge whitespace, mirroring
    * training); map-side only at any scale. */
  def encode(df: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val segWord = merges.foldLeft((w: Column) => split(w, "")) {
      case (f, (a, b)) => (w: Column) => applyMerge(f(w), a, b)
    }
    val words = filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0)
    val segs = transform(words, w => segWord(w))
    df.withColumn("bpe_tokens",
        aggregate(segs, lit(0L), (acc, s) => acc + size(s)))
      .withColumn("bpe_seg",
        array_join(flatten(segs), " "))
  }
}
