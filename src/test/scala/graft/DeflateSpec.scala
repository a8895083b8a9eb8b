package graft

import org.apache.spark.sql.functions._

/** graft_deflate_size: the compression-ratio quality signal. zlib
  * output bytes are JVM-build-dependent, so assertions pin the BAND
  * STRUCTURE the filter relies on (repetition ≪ prose ≪ noise), not
  * exact byte counts. */
class DeflateSpec extends SparkSpec {
  import spark.implicits._

  private def size(s: String, level: Int = 6): Long =
    Seq(s).toDF("t")
      .select(call_function("graft_deflate_size", col("t"), lit(level)).as("n"))
      .as[Long].head()

  // deterministic high-entropy text: hex of chained hashes
  private val noise = Iterator.iterate("seed")(s =>
    java.lang.Long.toHexString(s.hashCode.toLong * 2654435761L))
    .take(200).mkString(" ")
  private val prose = Seq.tabulate(40)(i =>
    s"sentence $i of the running text talks about topic ${i % 7}.")
    .mkString(" ")
  private val junk = "spam " * 200

  test("band structure: repetition below prose below noise") {
    val (rJunk, rProse, rNoise) =
      (size(junk) * 1000000 / junk.length,
        size(prose) * 1000000 / prose.length,
        size(noise) * 1000000 / noise.length)
    assert(rJunk < 100000, s"repetitive junk must compress hard, got $rJunk ppm")
    assert(rJunk < rProse && rProse < rNoise,
      s"band order violated: junk=$rJunk prose=$rProse noise=$rNoise")
    assert(rNoise > 400000, s"high-entropy text must resist compression, got $rNoise")
  }

  test("deterministic across partitionings and repeated runs") {
    val docs = (1 to 100).map(i => (i.toLong, s"doc $i " + ("ab" * (i % 37))))
      .toDF("id", "t")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), call_function("graft_deflate_size", col("t")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("edge cases: empty string is header-free, null propagates, level literal") {
    assert(size("") <= 8, "raw deflate of '' is a few bytes, no zlib framing")
    val n = Seq[Option[String]](None).toDF("t")
      .select(call_function("graft_deflate_size", col("t")))
      .collect().head
    assert(n.isNullAt(0))
    // level 1 (fast) never beats level 9 (max) on compressible input
    assert(size(junk, 9) <= size(junk, 1))
  }

  test("callable from SQL text; default level is 6") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT graft_deflate_size(text) AS a, graft_deflate_size(text, 6) AS b
        |FROM documents WHERE doc_id = 0""".stripMargin).head()
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) > 0)
  }

  test("t29 catalog query: ratios in (0, ~1.25e6], degenerate flag consistent") {
    val out = SparkEntry.queries("t29_compress_ratio")(
      spark, "/root/testdata/sf0.001")
    val rows = out.select(col("ratio_ppm"), col("degenerate"))
      .as[(Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ppm, deg) =>
      // token-dictionary coder (r18): prose sits mid-band; short or
      // high-entropy docs can exceed 1.0x (dictionary overhead), same
      // as zlib's >1.0x on incompressible input
      assert(ppm > 0 && ppm < 1250000L, s"ratio_ppm out of band: $ppm")
      assert(deg == (ppm < 200000L))
    }
  }

  test("tokenDictBytes (r18 exact-oracle coder): hand-computed sizes, " +
      "band order, empty/degenerate edges") {
    import graft.functions.TextOps
    def sz(s: String): Long =
      Seq(s).toDF("t").select(TextOps.tokenDictBytes(col("t"))).head().getLong(0)
    // "ab ab cd": dict {ab, cd} = (2+1)+(2+1) = 6; W=3, U=2,
    // bin(2)="10" -> 2 bits; stream = ceil(3*2/8) = 1; 4 + 6 + 1 = 11
    assert(sz("ab ab cd") == 11L)
    // single token: dict 5, W=1, bin(1)="1" -> 1 bit, stream 1 -> 10
    assert(sz("spam") == 10L)
    // empty / whitespace-only: header only
    assert(sz("") == 4L && sz("   ") == 4L)
    // multibyte: dictionary entries are UTF-8 BYTES, not chars —
    // "é" is 2 bytes, so dict 3, stream 1, header 4 (ADVICE r18)
    assert(sz("é") == 8L)
    // band order on the three regimes (the gate's reason to exist)
    val junk = sz(Seq.fill(200)("spam").mkString(" ")).toDouble / 999
    val prose = sz("the quick brown fox jumps over the lazy dog and " +
      "then the fox rests near the dog in the sun").toDouble / 93
    val noise = sz((0 until 60).map(i =>
      f"${i * 2654435761L}%x").mkString(" ")).toDouble /
      (0 until 60).map(i => f"${i * 2654435761L}%x").mkString(" ").length
    assert(junk < 0.1 && junk < prose && prose < noise,
      s"band order violated: junk=$junk prose=$prose noise=$noise")
  }
}
