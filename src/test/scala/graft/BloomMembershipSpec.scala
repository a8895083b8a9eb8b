package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomMembership

/** Bloom cross-corpus membership: the one-sided error contract (zero
  * false negatives, bounded false positives), persisted-sketch reuse,
  * and partition invariance of the build. */
class BloomMembershipSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0L until 10000L).map(i => (i, s"doc-$i"))
    .toDF("id", "key")
  // 5k seen + 5k unseen
  private lazy val batch = ((0L until 5000L) ++ (100000L until 105000L))
    .map(i => (i, s"doc-$i")).toDF("id", "key")

  test("no false negatives; false positives bounded near fpp") {
    val bloom = BloomMembership.sketch(corpus, "key", expectedItems = 10000, fpp = 0.01)
    val flagged = BloomMembership.flagSeen(batch, bloom, "key")
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
    val seenIds = (0L until 5000L).toSet
    seenIds.foreach(i => assert(flagged(i),
      s"corpus key $i must be flagged (bloom forbids false negatives)"))
    val fp = flagged.count { case (i, f) => f && !seenIds.contains(i) }
    // 5000 unseen probes at fpp=0.01 → expect ~50; 5x headroom
    assert(fp <= 250, s"false positives $fp exceed 5x the configured fpp")
    // and definitelyNew is exactly the unflagged complement
    val fresh = BloomMembership.definitelyNew(batch, bloom, "key")
      .select("id").as[Long].collect().toSet
    assert(fresh == flagged.collect { case (i, false) => i }.toSet)
  }

  test("sizing ceilings are raised, not silently clamped") {
    // Spark's runtime-filter confs default to 4M items / 64M bits and
    // BloomFilterAggregate clamps silently — a 10M-key request must
    // still get its full optimalNumOfBits (~95.8M)
    val bloom = BloomMembership.sketch(corpus, "key",
      expectedItems = 10000000L, fpp = 0.01)
    val bytes = bloom.as[Array[Byte]].collect().head
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val want = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(10000000L, 0.01)
    assert(bf.bitSize() >= want, s"bloom clamped: ${bf.bitSize()} < $want")
  }

  test("empty corpus: nothing seen, everything definitely new") {
    val empty = corpus.filter(col("id") < 0)
    val bloom = BloomMembership.sketch(empty, "key", expectedItems = 100)
    assert(BloomMembership.flagSeen(batch, bloom, "key")
      .filter(col("maybe_seen")).count() == 0)
    assert(BloomMembership.definitelyNew(batch, bloom, "key").count() == batch.count())
  }

  test("fillRatio saturation gauge: in-capacity filter sits low, an " +
      "overfilled one trips FillWarnAt, and merging only raises it") {
    def bytesOf(df: org.apache.spark.sql.DataFrame) =
      df.as[Array[Byte]].collect().head
    // 10k keys into a 100k-sized filter: ~7% of bits set
    val roomy = bytesOf(BloomMembership.sketch(corpus, "key", 100000L))
    val roomyFill = BloomMembership.fillRatio(roomy)
    assert(roomyFill > 0.0 && roomyFill < 0.2,
      s"in-capacity filter should sit well under warn: $roomyFill")
    // 10k keys into a filter sized for 1k: saturated — the silent-
    // degradation state the gauge exists to catch (VERDICT r14 item 2)
    val overfull = bytesOf(BloomMembership.sketch(corpus, "key", 1000L))
    val overFill = BloomMembership.fillRatio(overfull)
    assert(overFill > BloomMembership.FillWarnAt,
      s"saturated filter must trip the gauge: $overFill")
    // folding more keys in can only raise the gauge (bits only OR on)
    val half = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") < 5000), "key", 100000L))
    val merged = BloomMembership.merge(half, roomy)
    assert(BloomMembership.fillRatio(merged) >= roomyFill)
  }

  test("epoch re-shard path: chained per-epoch probes flag a SUBSET " +
      "of the merged-filter probe; both keep zero false negatives") {
    def bytesOf(df: org.apache.spark.sql.DataFrame) =
      df.as[Array[Byte]].collect().head
    val epochA = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") < 5000), "key", 10000L))
    val epochB = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") >= 5000), "key", 10000L))
    val merged = BloomMembership.merge(epochA, epochB)
    val flags = BloomMembership.flagSeenAny(
        BloomMembership.flagSeen(
          BloomMembership.flagSeen(
            BloomMembership.flagSeen(batch, Some(epochA), "key", "fa"),
            Some(epochB), "key", "fb"),
          Some(merged), "key", "fm"),
        Seq(epochA, epochB), "key", "fany")
      .select("id", "fa", "fb", "fm", "fany")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
    flags.foreach { case (id, fa, fb, fm, fany) =>
      assert(fany == (fa || fb),
        s"flagSeenAny on $id must equal the manual per-epoch OR")
      if (fa || fb) assert(fm,
        s"chained flag on $id missing from the merged probe (containment)")
      if (id < 5000) assert(fa && fm, s"false negative on corpus key $id")
    }
  }

  test("broadcast-backed probe (past MaxLiteralBloomBytes) flags " +
      "row-identically to the codegen'd literal probe") {
    def bytesOf(df: org.apache.spark.sql.DataFrame) =
      df.as[Array[Byte]].collect().head
    val epochA = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") < 5000), "key", 10000L))
    val epochB = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") >= 5000), "key", 10000L))
    def flagsAt(maxLit: Long) = BloomMembership.flagSeenAny(
        batch, Seq(epochA, epochB), "key", "f", maxLiteralBytes = maxLit)
      .select("id", "f").as[(Long, Boolean)].collect().toMap
    // threshold 0 forces EVERY epoch through the broadcast closure
    val viaLit = flagsAt(Long.MaxValue)
    val viaBc = flagsAt(0L)
    assert(viaLit == viaBc,
      "broadcast probe must flag exactly the literal probe's rows")
    // the contract survives the path switch: zero false negatives
    // (batch ∩ corpus = ids 0-4999; epochB's 5000+ keys aren't probed)
    (0L until 5000L).foreach(i => assert(viaBc(i),
      s"false negative on corpus key $i via the broadcast path"))
  }

  test("broadcast probe cache: identical epoch bytes re-probed across " +
      "batches reuse ONE broadcast (content-keyed), distinct bytes add") {
    def bytesOf(df: org.apache.spark.sql.DataFrame) =
      df.as[Array[Byte]].collect().head
    // sized uniquely (12345/23456) so the bytes can't collide with
    // entries other tests in this suite already cached — content
    // keying is global by design
    val a = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") < 5000), "key", 12345L))
    val b = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") >= 5000), "key", 23456L))
    val before = BloomMembership.bcCacheSize
    // a loop RE-READS epoch bytes every batch — model that with a
    // fresh array copy each probe; content keying must still hit
    def probe(bs: Array[Byte]): Unit =
      BloomMembership.flagSeenAny(batch, Seq(bs.clone()), "key", "f",
        maxLiteralBytes = 0L).filter(col("f")).count()
    probe(a); probe(a); probe(a)
    assert(BloomMembership.bcCacheSize == before + 1,
      "re-probing identical bytes must reuse the cached broadcast")
    probe(b)
    assert(BloomMembership.bcCacheSize == before + 2,
      "distinct bytes must get their own broadcast")
  }

  test("large-sketch probe is the native codegen expression holding " +
      "the broadcast — no ScalaUDF in the plan — and probes of the " +
      "same bytes canonicalize equal across plan instances") {
    def bytesOf(df: org.apache.spark.sql.DataFrame) =
      df.as[Array[Byte]].collect().head
    val a = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") < 5000), "key", 34567L))
    def probePlan() = BloomMembership.flagSeenAny(batch, Seq(a), "key", "f",
      maxLiteralBytes = 0L)
    val analyzed = probePlan().queryExecution.analyzed
    val udfs = analyzed.collect { case n => n.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u }) }.flatten
    assert(udfs.isEmpty,
      "the >threshold probe must be the native expression (VERDICT r16 " +
        s"item 3), found ScalaUDF: $udfs")
    def natives(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case n => n.expressions.flatMap(_.collect {
        case b: graft.plans.BloomContainsBc => b }) }.flatten
    val n1 = natives(analyzed)
    assert(n1.nonEmpty, "expected a BloomContainsBc predicate in the plan")
    // the content-keyed cache hands back the SAME Broadcast instance,
    // so two independently-built probe plans canonicalize equal — the
    // plan/fragment-cache property the per-call udf() instances broke
    // (ADVICE r16)
    val n2 = natives(probePlan().queryExecution.analyzed)
    assert(n1.head.bloom eq n2.head.bloom,
      "probes of identical sketch bytes must hold the SAME broadcast")
    // modulo the per-plan attribute exprId, the expressions are equal
    // (case-class equality with identity on the shared handle)
    val h = org.apache.spark.sql.catalyst.expressions.Literal(1L)
    assert(n1.head.withNewChildren(Seq(h)) == n2.head.withNewChildren(Seq(h)),
      "probes of identical sketch bytes must compare equal modulo the " +
        "hash attribute")
  }

  test("a lazy plan holding an EVICTED broadcast entry still probes " +
      "correctly (unpersist drops executor copies, not the handle), " +
      "and a fresh probe of the same bytes re-broadcasts") {
    def bytesOf(df: org.apache.spark.sql.DataFrame) =
      df.as[Array[Byte]].collect().head
    val a = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") < 5000), "key", 45678L))
    // eager truth before any cache churn
    val want = BloomMembership.flagSeenAny(batch, Seq(a), "key", "f",
        maxLiteralBytes = 0L)
      .select("id", "f").as[(Long, Boolean)].collect().toMap
    // build (but do NOT execute) a plan that captures a's broadcast
    val held = BloomMembership.flagSeenAny(batch, Seq(a), "key", "f",
      maxLiteralBytes = 0L)
    // churn the LRU past capacity with distinct sketches so a's entry
    // is evicted and unpersisted (each sizing yields distinct bytes)
    (0 until 17).foreach { i =>
      val b = bytesOf(BloomMembership.sketch(
        corpus.filter(col("id") < 100), "key", 50001L + i))
      BloomMembership.flagSeenAny(batch.limit(1), Seq(b), "key", "f",
        maxLiteralBytes = 0L).filter(col("f")).count()
    }
    // executing the held plan AFTER eviction must re-fetch the
    // driver-side block and flag identically (the r17 stretch case)
    val got = held.select("id", "f").as[(Long, Boolean)].collect().toMap
    assert(got == want,
      "a plan executed after its broadcast was unpersisted must still " +
        "flag row-identically")
    // and a brand-new probe of the same bytes simply re-broadcasts
    val size0 = BloomMembership.bcCacheSize
    val again = BloomMembership.flagSeenAny(batch, Seq(a.clone()), "key",
        "f", maxLiteralBytes = 0L)
      .select("id", "f").as[(Long, Boolean)].collect().toMap
    assert(again == want)
    assert(BloomMembership.bcCacheSize == size0 ||
        BloomMembership.bcCacheSize == size0 + 1,
      "re-probe after eviction re-enters the cache without unbounded growth")
  }

  test("sizingOf/sameSizing: merge compatibility is decidable from " +
      "the header — equal sizing merges, different sizing must not") {
    def bytesOf(df: org.apache.spark.sql.DataFrame) =
      df.as[Array[Byte]].collect().head
    val a = bytesOf(BloomMembership.sketch(corpus, "key", 10000L))
    val b = bytesOf(BloomMembership.sketch(
      corpus.filter(col("id") < 100), "key", 10000L))
    val c = bytesOf(BloomMembership.sketch(corpus, "key", 50000L))
    assert(BloomMembership.sameSizing(a, b))
    assert(!BloomMembership.sameSizing(a, c),
      "differently-sized filters must not report mergeable")
    BloomMembership.merge(a, b) // must not throw
    intercept[Exception](BloomMembership.merge(a, c))
  }

  test("sketch is partition-invariant and parquet round-trips") {
    val a = BloomMembership.sketch(corpus, "key", 10000).as[Array[Byte]].collect().head
    val b = BloomMembership.sketch(corpus.repartition(13), "key", 10000)
      .as[Array[Byte]].collect().head
    assert(java.util.Arrays.equals(a, b),
      "bloom bits must not depend on physical partitioning")
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    BloomMembership.sketch(corpus, "key", 10000).write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    val viaDisk = BloomMembership.flagSeen(batch, persisted, "key")
      .filter(col("maybe_seen")).count()
    val inline = BloomMembership.flagSeen(batch,
        BloomMembership.sketch(corpus, "key", 10000), "key")
      .filter(col("maybe_seen")).count()
    assert(viaDisk == inline, "persisted sketch must reproduce the inline probe")
  }
}
