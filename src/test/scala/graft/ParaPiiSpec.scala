package graft

import org.apache.spark.sql.functions._

/** t30 paragraph-level dedup and t31 PII redaction. */
class ParaPiiSpec extends SparkSpec {
  import spark.implicits._

  private def paraDedup(docs: org.apache.spark.sql.DataFrame) = {
    // mirror of the t30 pipeline on an in-memory frame (the catalog
    // query reads parquet; the logic under test is identical)
    import org.apache.spark.sql.expressions.Window
    val words = split(col("text"), " ")
    val segArr = transform(
      sequence(lit(0), ceil(size(words) / 10.0).cast("int") - 1),
      i => array_join(slice(words, i * 10 + 1, lit(10)), " "))
    docs.select(col("doc_id"), posexplode(segArr).as(Seq("seg_idx", "seg")))
      .withColumn("first_doc",
        min(col("doc_id")).over(Window.partitionBy("seg")))
      .withColumn("keep", col("doc_id") === col("first_doc"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(col("keep").cast("long")).as("n_kept"))
  }

  test("paragraph dedup: keep-first across docs, self-kept within a doc") {
    val ten = ('a' to 'j').mkString(" ")              // one 10-word segment
    val more = ('k' to 't').mkString(" ")
    val docs = Seq(
      (0L, ten),                                      // first owner: kept
      (1L, s"$ten $more"),                            // seg0 duped -> dropped
      (2L, more),                                     // doc1 owns it first
      (3L, s"$more $more")                            // hmm: dup of doc1's
    ).toDF("doc_id", "text")
    val got = paraDedup(docs).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == ((1L, 1L)))
    assert(got(1L) == ((2L, 1L)), "first 10 words belong to doc 0")
    assert(got(2L) == ((1L, 0L)), "doc 1 already owns this segment")
    assert(got(3L) == ((2L, 0L)), "both copies lose to doc 1")
  }

  test("paragraph dedup: within-doc repeats of a NOVEL segment all survive") {
    val seg = (1 to 10).map(i => s"v$i").mkString(" ")
    val got = paraDedup(Seq((7L, s"$seg $seg")).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].head()
    assert(got == ((7L, 2L, 2L)), "keep-first is per-corpus, not per-position")
  }

  test("t30 catalog query: totals consistent, full docs unaffected-or-reduced") {
    val out = SparkEntry.queries("t30_paragraph_dedup")(
      spark, "/root/testdata/sf0.001")
    val rows = out.select("n_segs", "n_kept").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, k) => assert(k >= 0 && k <= n && n > 0) }
    assert(rows.exists { case (n, k) => k < n },
      "the synthetic corpus repeats 10-word runs somewhere")
  }

  test("pii regexes: emails then phones, sequential counts") {
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phoneRe = "\\+?[0-9][0-9() .-]{6,}[0-9]"
    val r = Seq("write a.b+c@dom.co or x@y.io, dial +44 20 7946 0958 x")
      .toDF("t")
      .withColumn("r1", regexp_replace(col("t"), emailRe, "<EMAIL>"))
      .withColumn("clean", regexp_replace(col("r1"), phoneRe, "<PHONE>"))
      .select(regexp_count(col("t"), lit(emailRe)),
        regexp_count(col("r1"), lit(phoneRe)), col("clean"))
      .as[(Int, Int, String)].head()
    assert(r._1 == 2 && r._2 == 1, s"got $r")
    assert(r._3 == "write <EMAIL> or <EMAIL>, dial <PHONE> x", s"got ${r._3}")
  }

  test("t32 catalog query: canonical form drops chrome, keeps identity") {
    val out = SparkEntry.queries("t32_url_canonicalize")(
      spark, "/root/testdata/sf0.001")
    val rows = out.select("doc_id", "canon_url").as[(Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, c) =>
      assert(c.startsWith("https://example") && c.contains(s"/$id/"),
        s"identity must survive: $c")
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains("ref=") &&
        !c.contains(":443") && !c.contains("www.") && !c.contains("index.html"),
        s"chrome must not: $c")
      assert(c.endsWith("?a=1&b=2"), s"params sorted, tracking dropped: $c")
    }
    assert(rows.map(_._2).distinct.length == rows.length,
      "doc identity keeps canon URLs distinct")
  }

  test("canonicalizeUrl edge cases: ports, schemes, params, paths (r11)") {
    val cases = Seq(
      // scheme-aware default ports: https drops 443 only, http 80 only
      ("HTTPS://Host.COM:443/a", "https://host.com/a"),
      ("http://HOST.com:80/a", "http://host.com/a"),
      ("https://host.com:80/a", "https://host.com:80/a"),
      ("http://host.com:443/a", "http://host.com:443/a"),
      ("ftp://Host.com:443/a", "ftp://host.com:443/a"),
      ("https://host.com:8443/a", "https://host.com:8443/a"),
      // www + fragment + tracking params + sorting
      ("https://www.Host.com/p?z=9&utm_campaign=x&a=1#frag",
        "https://host.com/p?a=1&z=9"),
      // all params tracking -> no query at all
      ("https://host.com/p?utm_a=1&ref=tw", "https://host.com/p"),
      // no query, no fragment, bare path
      ("https://host.com/p/q", "https://host.com/p/q"),
      // /index.html collapses only as a trailing component
      ("https://host.com/index.html", "https://host.com/"),
      ("https://host.com/index.html/deeper", "https://host.com/index.html/deeper"),
      // empty path survives as empty (host-only URL)
      ("https://WWW.host.com", "https://host.com"),
      // www. stripped only as a prefix label
      ("https://wwwhost.com/a", "https://wwwhost.com/a"))
    val got = cases.map(_._1).toDF("url")
      .select(graft.functions.TextOps.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    cases.zip(got).foreach { case ((in, want), have) =>
      assert(have == want, s"$in -> $have (want $want)")
    }
  }

  test("t31 catalog query: exactly the injected PII found in every row") {
    val out = SparkEntry.queries("t31_pii_redact")(
      spark, "/root/testdata/sf0.001")
    val rows = out.select("n_email", "n_phone", "chars_removed")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (e, p, cr) =>
      assert(e == 1L, s"one injected email, got $e")
      assert(p == 2L, s"two injected phones, got $p")
      assert(cr > 0L, "redaction tokens are shorter than the PII spans")
    }
  }
}
