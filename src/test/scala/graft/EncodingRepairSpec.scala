package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** t38 — mojibake (double-encoded UTF-8) repair. Test strings are
  * built from explicit code points (no invisible characters in
  * source). Cases: the classic Latin-1 2-byte digraphs, cp1252
  * 3-byte sequences, repair is the identity on clean text (including
  * standalone cp1252 punctuation and correctly-encoded accents),
  * partial/overlong/surrogate sequences pass through untouched, and
  * a full corrupt-then-repair round trip per code point class. */
class EncodingRepairSpec extends SparkSpec {
  import spark.implicits._

  private def cp(cps: Int*): String =
    cps.flatMap(Character.toChars(_)).mkString

  private def fix(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.fixMojibake(col("t")).as("f")).head().getString(0)

  /** Forward corruption (JVM-side reference): encode UTF-8, then
    * display each byte through cp1252 (undefined slots fall back to
    * their Latin-1 control char, the "sloppy" convention). */
  private def corrupt(s: String): String =
    s.getBytes("UTF-8").map { b =>
      val u = b & 0xFF
      val i = TextOps.Cp1252Bytes.indexOf(u.toChar)
      if (i >= 0) TextOps.Cp1252Chars.charAt(i) else u.toChar
    }.mkString

  test("classic digraphs repair") {
    // "thÃ© cafÃ©" -> "thé café"  (C3 A9 = é)
    assert(fix("th" + cp(0xC3, 0xA9) + " caf" + cp(0xC3, 0xA9)) ==
      "th" + cp(0xE9) + " caf" + cp(0xE9))
    // E2 80 94 = em dash; 0x94 displays as cp1252 right-double-quote
    assert(fix("a" + cp(0xE2, 0x20AC, 0x201D) + "b") == "a" + cp(0x2014) + "b")
    // E2 80 9C = left double quote ("â€œ"); the closing quote's 0x9D
    // is an UNDEFINED cp1252 slot -> raw control char in the wild
    assert(fix(cp(0xE2, 0x20AC, 0x153) + "quote" + cp(0xE2, 0x20AC, 0x9D)) ==
      cp(0x201C) + "quote" + cp(0x201D))
  }

  test("clean text is a fixed point") {
    for (s <- Seq("", "plain ascii text",
        "caf" + cp(0xE9) + " d" + cp(0xE9) + "j" + cp(0xE0),
        "price " + cp(0x20AC) + "99",
        "em " + cp(0x2014) + " dash",
        cp(0x4F60, 0x597D) + " world")) {
      assert(fix(s) == s, s"not a fixed point: '$s'")
    }
  }

  test("partial, overlong and surrogate sequences pass through") {
    // lone lead / lead + non-continuation / stray continuation
    assert(fix(cp(0xC3)) == cp(0xC3))
    assert(fix(cp(0xC3) + "x") == cp(0xC3) + "x")
    assert(fix("x" + cp(0xA9) + "y") == "x" + cp(0xA9) + "y")
    // overlong 2-byte (leads C0/C1 excluded by the 0xC2 floor)
    assert(fix(cp(0xC0, 0xAF)) == cp(0xC0, 0xAF))
    // overlong 3-byte: E0 80-9F continuation band excluded; the
    // stray C1 controls get the cp1252 "fix C1" treatment (ftfy)
    assert(fix(cp(0xE0, 0x80, 0x80)) == cp(0xE0, 0x20AC, 0x20AC))
    // surrogate range ED A0 80 excluded (0xA0 is not C1, stays)
    assert(fix(cp(0xED, 0xA0, 0x80)) == cp(0xED, 0xA0, 0x20AC))
    // 4-byte overlong (F0 80-8F band) and past-U+10FFFF (F4 90+)
    // excluded; F5+ is not a lead at all
    assert(fix(cp(0xF0, 0x80, 0x80, 0x80)) ==
      cp(0xF0, 0x20AC, 0x20AC, 0x20AC))
    assert(fix(cp(0xF4, 0xBF, 0xBF, 0xBF)) == cp(0xF4, 0xBF, 0xBF, 0xBF))
    assert(fix(cp(0xF5, 0xBF, 0xBF, 0xBF)) == cp(0xF5, 0xBF, 0xBF, 0xBF))
  }

  test("null-safe") {
    val out = Seq(Tuple1(null: String)).toDF("t")
      .select(TextOps.fixMojibake(col("t")).as("f")).head()
    assert(out.isNullAt(0))
  }

  private def repair(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.repairMojibake(col("t")).as("f")).head().getString(0)

  test("repairMojibake gate: clean lead+continuation pairs survive " +
      "(the raw rewrite's false-positive class, ADVICE r14)") {
    // clean "Ö«" (U+00D6 U+00AB): byte-identical to a valid 2-byte
    // sequence, so the RAW rewrite re-decodes it (→ U+05AB) — the
    // documented non-identity. The gated form must pass it through:
    // no high-confidence signature anywhere in the doc.
    val cases = Seq(
      "clean " + cp(0xD6, 0xAB) + " pair",          // Ö« → U+05AB raw
      "angle " + cp(0xDF, 0xBB) + cp(0xDF, 0xBF),   // ß»ß¿
      "deg " + cp(0xE9, 0xB0, 0xB1))                // é°± → U+9C31 raw
    for (s <- cases) {
      assert(fix(s) != s, s"expected the raw rewrite to corrupt '$s'")
      assert(repair(s) == s, s"gated repair must not touch clean '$s'")
    }
    // and trivially-clean docs stay untouched too
    for (s <- Seq("", "plain ascii", "caf" + cp(0xE9), cp(0x4F60, 0x597D)))
      assert(repair(s) == s)
  }

  test("repairMojibake gate: signature-bearing docs repair exactly " +
      "like the raw rewrite") {
    val samples = Seq(
      "th" + cp(0xC3, 0xA9) + " caf" + cp(0xC3, 0xA9),          // Ã©
      "a" + cp(0xE2, 0x20AC, 0x201D) + "b",                     // â€� dash
      cp(0x141) + "uk: " + cp(0xC5, 0x201A) + "san",            // Å‚
      "emoji " + cp(0xF0, 0x178, 0x2DC, 0x20AC) + " end")       // ðŸ˜€
    for (s <- samples) {
      assert(repair(s) == fix(s), s"gated != raw on mojibake '$s'")
      assert(repair(s) != s, s"signature doc must repair: '$s'")
    }
    // residual (documented): a doc carrying BOTH real mojibake and a
    // clean pair re-decodes both — the gate is per doc, not per char
    val mixed = "bad " + cp(0xC3, 0xA9) + " clean " + cp(0xD6, 0xAB)
    assert(repair(mixed) == fix(mixed))
  }

  test("corrupt-then-repair round trip across code point classes") {
    val samples = Seq(
      "caf" + cp(0xE9) + " na" + cp(0xEF) + "ve " + cp(0xFC) + "ber",
      cp(0x153) + "uvre " + cp(0x160) + "koda",
      cp(0x2014) + "dash" + cp(0x2026) + " " + cp(0x201C) + "quoted" +
        cp(0x201D) + " " + cp(0x20AC) + "5",
      cp(0x4F60, 0x597D, 0x4E16, 0x754C),
      "emoji " + cp(0x1F600) + " and " + cp(0x1F680, 0x2708) + " travel",
      "mixed ascii + " + cp(0xE9, 0x2014, 0x4F60, 0x1F389) + " end")
    for (s <- samples) {
      val bad = corrupt(s)
      assert(bad != s, s"corruption should change '$s'")
      assert(fix(bad) == s, s"round trip failed for '$s' via '$bad'")
    }
  }
}
