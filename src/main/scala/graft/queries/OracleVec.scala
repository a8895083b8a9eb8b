package graft.queries

/** DuckDB SQL generators that replay the CENTROID-SEEDED operator
  * family exactly — closing the last hash-oracle gap (VERDICT r11
  * item 3, extended to its end state in r12): s3/s4/s6/s7/d11 move
  * from rows-only to full rows+schema+hash oracles, leaving t29
  * (zlib-seeded) as the only rows-only catalog query.
  *
  * Why this is possible at all: every quantizer in the repo is
  * deterministic BY DESIGN —
  *  - `KMeans.fitLocal` samples by the smallest (xxhash64(id), id)
  *    and runs Lloyd on the driver, accumulating per-cell sums in
  *    that fixed sample order with plain JVM double ops;
  *  - `ProductQuantizer.fit` does the same per subspace (init = first
  *    ks DISTINCT subvectors in sample order);
  *  - assignment ties break toward the lowest cell/code everywhere.
  * Each of those steps has an exact DuckDB counterpart:
  *  - Spark's `xxhash64` of a BIGINT is XXH64.hashLong(l, 42) —
  *    replayed in 64-bit-wrapping HUGEINT arithmetic (32-bit limb
  *    multiplies, rotates as shift-and-add of disjoint bit ranges),
  *    the same staging the d3/d6/s2 oracles established;
  *  - the JVM's left-to-right double accumulation `acc += x*y` is
  *    bit-identical to DuckDB's `list_dot_product` sequential kernel
  *    (the parity the d5/s1/s2 oracles already rest on), so an
  *    ORDER-SENSITIVE sum over cell members replays as
  *    `list_dot_product(list(x ORDER BY hs, id), ones)` — x*1.0 = x
  *    exactly, so the dot IS the sequential sum;
  *  - `sqrt`, `/`, `round(…, 6)` are correctly-rounded IEEE ops in
  *    both engines.
  * For the decimal centroid path (s4, `graft_vec_dsum`):
  * `CAST(CAST(x AS VARCHAR) AS DECIMAL(30,15))` reproduces Spark's
  * `Decimal(Double.toString(x))` cast including HALF_UP tie behavior
  * on shortest-repr boundaries (measured: DuckDB's direct
  * double→decimal cast rounds those 278-of-32k tie elements the other
  * way at sf0.01), and DECIMAL sums are exact and order-free.
  *
  * Every CTE stage is MATERIALIZED: DuckDB inlines lateral aliases
  * textually, and a chained 64-bit hash would otherwise explode
  * exponentially (same discipline as the MinHash/XXH64 oracles). */
object OracleVec {

  private val B = "4294967296::HUGEINT" // 2^32
  private val M = "18446744073709551616::HUGEINT" // 2^64
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  /** 64-bit wrapping multiply over HUGEINT via 32-bit limbs. */
  private def mul64(x: String, y: String): String =
    s"(($x % $B) * ($y % $B) + (((($x % $B) * ($y // $B) + ($x // $B) * ($y % $B)) % $B) * $B)) % $M"

  /** rotl64: the shifted halves occupy disjoint bit ranges, so + is |. */
  private def rotl(x: String, r: Int): String = {
    val hi = BigInt(2).pow(r)
    val lo = BigInt(2).pow(64 - r)
    s"(($x * $hi::HUGEINT) % $M + $x // $lo::HUGEINT)"
  }

  /** XXH64.hashLong(id, 42) — Spark's `xxhash64` over one BIGINT —
    * as chained CTEs `{pfx}h0 … {pfx}fh`; the final stage carries
    * (id, hu HUGEINT unsigned, hs BIGINT signed — Spark's sort key). */
  private[queries] def hashLongCtes(pfx: String, src: String, idCol: String): String = {
    val fin = s"xor(v, v // 4294967296::HUGEINT)"
    s"""${pfx}h0 AS MATERIALIZED (SELECT $idCol AS id, CAST($idCol AS HUGEINT) AS hin FROM $src),
${pfx}h1 AS MATERIALIZED (SELECT id, ${mul64("hin", P2)} AS k1a FROM ${pfx}h0),
${pfx}h2 AS MATERIALIZED (SELECT id, ${rotl("k1a", 31)} AS k1b FROM ${pfx}h1),
${pfx}h3 AS MATERIALIZED (SELECT id, ${mul64("k1b", P1)} AS k1 FROM ${pfx}h2),
${pfx}h4 AS MATERIALIZED (SELECT id, xor((42::HUGEINT + $P5 + 8) % $M, k1) AS hh FROM ${pfx}h3),
${pfx}h5 AS MATERIALIZED (SELECT id, ${rotl("hh", 27)} AS hr FROM ${pfx}h4),
${pfx}h6 AS MATERIALIZED (SELECT id, (${mul64("hr", P1)} + $P4) % $M AS hh FROM ${pfx}h5),
${pfx}f1 AS MATERIALIZED (SELECT id, xor(hh, hh // 8589934592::HUGEINT) AS v FROM ${pfx}h6),
${pfx}f2 AS MATERIALIZED (SELECT id, ${mul64("v", P2)} AS v FROM ${pfx}f1),
${pfx}f3 AS MATERIALIZED (SELECT id, xor(v, v // 536870912::HUGEINT) AS v FROM ${pfx}f2),
${pfx}f4 AS MATERIALIZED (SELECT id, ${mul64("v", P3)} AS v FROM ${pfx}f3),
${pfx}fh AS MATERIALIZED (SELECT id, $fin AS hu,
  CASE WHEN $fin >= 9223372036854775808::HUGEINT
       THEN CAST($fin - $M AS BIGINT) ELSE CAST($fin AS BIGINT) END AS hs FROM ${pfx}f4)"""
  }

  /** The sequential sum of `x` over group members in (hs, id) order —
    * the JVM accumulation order of the driver-side Lloyd loops. */
  private def seqSum(x: String): String =
    s"list_dot_product(list($x ORDER BY hs, id), list_transform(list($x ORDER BY hs, id), y -> 1.0))"

  /** KMeans.fitLocal(k, iters, sampleMod, maxSample) replay over
    * `src` (idc, vecc FLOAT[]). Emits CTEs; the fitted centroids land
    * in `fl_c{iters}` (cell, cv DOUBLE[dim]); `fl_nn` carries the
    * widened corpus (id, v, nrm) with zero-norms dropped. */
  def fitLocalCtes(k: Int, iters: Int, sampleMod: Int, maxSample: Int,
                   dim: Int, src: String, idc: String, vecc: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += s"""fl_nn AS MATERIALIZED (SELECT $idc AS id, $vecc::DOUBLE[] AS v,
  sqrt(list_dot_product($vecc::DOUBLE[], $vecc::DOUBLE[])) AS nrm
  FROM $src WHERE list_dot_product($vecc::DOUBLE[], $vecc::DOUBLE[]) > 0)"""
    parts += hashLongCtes("flx", "fl_nn", "id")
    val modf = if (sampleMod > 1) s"WHERE hu % $sampleMod::HUGEINT = 0" else ""
    parts += s"""fl_samp AS MATERIALIZED (SELECT n.id, n.v, n.nrm, h.hs,
  ROW_NUMBER() OVER (ORDER BY h.hs, n.id) AS rn
  FROM fl_nn n JOIN (SELECT id, hu, hs FROM flxfh $modf) h USING (id)
  QUALIFY rn <= $maxSample)"""
    parts += s"fl_c0 AS MATERIALIZED (SELECT rn - 1 AS cell, v AS cv FROM fl_samp WHERE rn <= $k)"
    for (t <- 1 to iters) {
      val p = s"fl_c${t - 1}"
      parts += s"""fl_u$t AS MATERIALIZED (SELECT cell,
  CASE WHEN sqrt(list_dot_product(cv, cv)) > 0
       THEN list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
       ELSE list_transform(cv, x -> 0.0) END AS unit FROM $p)"""
      parts += s"""fl_a$t AS MATERIALIZED (SELECT s.id, s.v, s.hs, u.cell,
  list_dot_product(s.v, u.unit) / s.nrm AS cc
  FROM fl_samp s CROSS JOIN fl_u$t u
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.id ORDER BY cc DESC, u.cell) = 1)"""
      parts += s"""fl_e$t AS MATERIALIZED (SELECT a.cell, r.pos, a.v[r.pos] AS x, a.hs, a.id
  FROM fl_a$t a, (SELECT unnest(generate_series(1, $dim)) AS pos) r)"""
      parts += s"""fl_s$t AS MATERIALIZED (SELECT cell, pos,
  ${seqSum("x")} / count(*) AS mn
  FROM fl_e$t GROUP BY cell, pos)"""
      parts += s"""fl_c$t AS MATERIALIZED (SELECT p.cell,
  COALESCE(nc.cv, p.cv) AS cv FROM $p p LEFT JOIN
  (SELECT cell, list(mn ORDER BY pos) AS cv FROM fl_s$t GROUP BY cell) nc USING (cell))"""
    }
    parts.mkString(",\n")
  }

  /** Unit-normalized cell centroids of the fitted quantizer (the
    * scoring form `KMeans.centroidScores` embeds as literals). */
  private def unitCte(name: String, from: String): String =
    s"""$name AS MATERIALIZED (SELECT cell,
  CASE WHEN sqrt(list_dot_product(cv, cv)) > 0
       THEN list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
       ELSE list_transform(cv, x -> 0.0) END AS unit FROM $from)"""

  /** ProductQuantizer.fit(m, ks, iters, maxSample) replay; final
    * codebooks in `pq_c{iters}` (j, code, cv DOUBLE[dim/m]);
    * `pq_unit` carries the unit-normalized corpus (id, uv). */
  def pqFitCtes(m: Int, ks: Int, iters: Int, maxSample: Int, dim: Int,
                src: String, idc: String, vecc: String): String = {
    val sd = dim / m
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += s"""pq_unit AS MATERIALIZED (SELECT $idc AS id,
  list_transform($vecc::DOUBLE[], x -> x / sqrt(list_dot_product($vecc::DOUBLE[], $vecc::DOUBLE[]))) AS uv
  FROM $src WHERE list_dot_product($vecc::DOUBLE[], $vecc::DOUBLE[]) > 0)"""
    parts += hashLongCtes("pqx", "pq_unit", "id")
    parts += s"""pq_samp AS MATERIALIZED (SELECT u.id, u.uv, h.hs,
  ROW_NUMBER() OVER (ORDER BY h.hs, u.id) AS rn
  FROM pq_unit u JOIN pqxfh h USING (id) QUALIFY rn <= $maxSample)"""
    parts += s"""pq_sub AS MATERIALIZED (SELECT s.id, s.hs, s.rn, j.j,
  s.uv[j.j * $sd + 1 : j.j * $sd + $sd] AS sv
  FROM pq_samp s, (SELECT unnest(generate_series(0, ${m - 1})) AS j) j)"""
    // init: first ks DISTINCT subvectors per subspace in sample order,
    // padded by repeating the first (ProductQuantizer.fit:87-94)
    parts += s"""pq_i0 AS MATERIALIZED (SELECT j, sv, rn FROM pq_sub
  QUALIFY ROW_NUMBER() OVER (PARTITION BY j, sv ORDER BY rn) = 1)"""
    parts += s"""pq_i1 AS MATERIALIZED (SELECT j, sv,
  ROW_NUMBER() OVER (PARTITION BY j ORDER BY rn) - 1 AS code
  FROM pq_i0 QUALIFY code < $ks)"""
    parts += s"""pq_c0 AS MATERIALIZED (SELECT g.j, g.code, COALESCE(i.sv, f.sv) AS cv
  FROM (SELECT j.j, c.c AS code FROM (SELECT unnest(generate_series(0, ${m - 1})) AS j) j,
        (SELECT unnest(generate_series(0, ${ks - 1})) AS c) c) g
  LEFT JOIN pq_i1 i ON g.j = i.j AND g.code = i.code
  JOIN (SELECT j, sv FROM pq_i1 WHERE code = 0) f ON g.j = f.j)"""
    for (t <- 1 to iters) {
      val p = s"pq_c${t - 1}"
      // argmin L2 as argmax(<v,c> − |c|²/2) — ProductQuantizer.fit:105-108
      parts += s"""pq_a$t AS MATERIALIZED (SELECT s.id, s.hs, s.j, s.sv, c.code,
  list_dot_product(s.sv, c.cv) - list_dot_product(c.cv, c.cv) / 2 AS sc
  FROM pq_sub s JOIN $p c ON s.j = c.j
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.id, s.j ORDER BY sc DESC, c.code) = 1)"""
      parts += s"""pq_s$t AS MATERIALIZED (SELECT j, code, pos,
  ${seqSum("sv[pos]")} / count(*) AS mn
  FROM pq_a$t, (SELECT unnest(generate_series(1, $sd)) AS pos) r
  GROUP BY j, code, pos)"""
      parts += s"""pq_c$t AS MATERIALIZED (SELECT p.j, p.code,
  COALESCE(nc.cv, p.cv) AS cv FROM $p p LEFT JOIN
  (SELECT j, code, list(mn ORDER BY pos) AS cv FROM pq_s$t GROUP BY j, code) nc
  ON p.j = nc.j AND p.code = nc.code)"""
    }
    parts.mkString(",\n")
  }

  /** s3_ivf_ann: fitLocal(k=8, iters=3, sampleMod=8) +
    * ivfKmeansTopK(k=3, nCells=8, nProbe=2) over `embeddings`. */
  val s3IvfAnn: String =
    "WITH " + fitLocalCtes(8, 3, 8, 65536, 64, "embeddings", "vec_id", "embedding") + s""",
${unitCte("iv_u", "fl_c3")},
iv_asg AS MATERIALIZED (SELECT n.id AS c_id, n.v AS c_v, n.nrm AS c_nrm, u.cell,
  list_dot_product(n.v, u.unit) / n.nrm AS cc
  FROM fl_nn n CROSS JOIN iv_u u
  QUALIFY ROW_NUMBER() OVER (PARTITION BY n.id ORDER BY cc DESC, u.cell) = 1),
iv_q AS MATERIALIZED (SELECT n.id AS q_id, n.v AS q_v, n.nrm AS q_nrm, u.cell,
  list_dot_product(n.v, u.unit) / n.nrm AS cc
  FROM fl_nn n CROSS JOIN iv_u u WHERE n.id < 5
  QUALIFY ROW_NUMBER() OVER (PARTITION BY n.id ORDER BY cc DESC, u.cell) <= 2),
iv_j AS MATERIALIZED (SELECT q.q_id, q.cell, a.c_id,
  ROUND(list_dot_product(q.q_v, a.c_v) / (q.q_nrm * a.c_nrm), 6) AS cos
  FROM iv_q q JOIN iv_asg a USING (cell))
SELECT q_id, cell, c_id, cos,
  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
FROM iv_j QUALIFY rk <= 3 ORDER BY q_id, rk"""

  /** s4_ivf_label: label-cell IVF with `graft_vec_dsum` decimal
    * centroids. The VARCHAR-staged decimal cast mirrors Spark's
    * Decimal(Double.toString) including its HALF_UP shortest-repr
    * ties; the decimal SUM is exact, so the element order is free. */
  val s4IvfLabel: String =
    s"""WITH emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v,
  CAST(label AS BIGINT) AS cell,
  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
ex AS MATERIALIZED (SELECT cell, r.pos, v[r.pos] AS x
  FROM emb, (SELECT unnest(generate_series(1, 64)) AS pos) r),
sums AS MATERIALIZED (SELECT cell, pos,
  CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(30,15))) AS DOUBLE) AS sm, COUNT(*) AS n
  FROM ex GROUP BY cell, pos),
centn AS MATERIALIZED (SELECT cell, cent_v,
  sqrt(list_dot_product(cent_v, cent_v)) AS cent_nrm
  FROM (SELECT cell, list(sm / n ORDER BY pos) AS cent_v FROM sums GROUP BY cell)),
qa AS MATERIALIZED (SELECT e.vec_id AS q_id, e.v AS q_v, e.nrm AS q_nrm, c.cell
  FROM emb e CROSS JOIN centn c WHERE e.vec_id < 5
  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id
    ORDER BY list_dot_product(e.v, c.cent_v) / (e.nrm * c.cent_nrm) DESC, c.cell) = 1),
jn AS MATERIALIZED (SELECT q.q_id, q.cell, e.vec_id AS c_id,
  ROUND(list_dot_product(q.q_v, e.v) / (q.q_nrm * e.nrm), 6) AS cos
  FROM qa q JOIN emb e USING (cell))
SELECT q_id, cell, c_id, cos,
  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
FROM jn QUALIFY rk <= 3 ORDER BY q_id, rk"""

  /** s6_pq_ann: PQ fit(m=8, ks=16, iters=5) + encode + ADC top-20
    * shortlist + exact re-rank top-5 (pqTopK k=5, refine=4). */
  val s6PqAnn: String = {
    val (m, ks, iters, dim, k, refine) = (8, 16, 5, 64, 5, 4)
    val sd = dim / m
    val fin = s"pq_c$iters"
    "WITH " + pqFitCtes(m, ks, iters, 65536, dim, "embeddings", "vec_id", "embedding") + s""",
enc_s AS MATERIALIZED (SELECT u.id, j.j, u.uv[j.j * $sd + 1 : j.j * $sd + $sd] AS sv
  FROM pq_unit u, (SELECT unnest(generate_series(0, ${m - 1})) AS j) j),
enc AS MATERIALIZED (SELECT e.id, e.j, c.code
  FROM enc_s e JOIN $fin c ON e.j = c.j
  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.id, e.j
    ORDER BY list_dot_product(e.sv, c.cv) - list_dot_product(c.cv, c.cv) / 2 DESC, c.code) = 1),
qv AS MATERIALIZED (SELECT id AS q_id, uv AS q_v FROM pq_unit WHERE id < 5),
adc_c AS MATERIALIZED (SELECT q.q_id, e.id AS c_id, e.j,
  list_dot_product(q.q_v[e.j * $sd + 1 : e.j * $sd + $sd], c.cv) AS contrib
  FROM qv q CROSS JOIN enc e JOIN $fin c ON e.j = c.j AND e.code = c.code),
adc AS MATERIALIZED (SELECT q_id, c_id,
  ROUND(${seqSumOrdered("contrib", "j")}, 6) AS adc
  FROM adc_c GROUP BY q_id, c_id),
short AS MATERIALIZED (SELECT q_id, c_id FROM adc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc DESC, c_id) <= ${k * refine}),
rr AS MATERIALIZED (SELECT s.q_id, s.c_id,
  ROUND(list_dot_product(q.q_v, u.uv), 6) AS cos
  FROM short s JOIN qv q USING (q_id) JOIN pq_unit u ON s.c_id = u.id)
SELECT q_id, c_id, cos,
  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
FROM rr QUALIFY rk <= $k ORDER BY q_id, rk"""
  }

  /** Sequential (left-to-right in `ord` order) double sum — the
    * `aggregate(…, acc + x)` HOF fold of the ADC assembly. */
  private def seqSumOrdered(x: String, ord: String): String =
    s"list_dot_product(list($x ORDER BY $ord), list_transform(list($x ORDER BY $ord), y -> 1.0))"

  /** s7_ivfpq: coarse fitLocal(8, iters=3) + PQ fit(m=8, ks=8,
    * iters=3) + buildIndex + nProbe=3 probing + ADC + exact re-rank
    * (IvfPq.topK k=5, refine=4). */
  val s7IvfPq: String = {
    val (nCells, nProbe, m, ks, iters, dim, k, refine) = (8, 3, 8, 8, 3, 64, 5, 4)
    val sd = dim / m
    val fin = s"pq_c$iters"
    "WITH " + fitLocalCtes(nCells, iters, 1, 65536, dim, "embeddings", "vec_id", "embedding") +
      ",\n" + pqFitCtes(m, ks, iters, 65536, dim, "embeddings", "vec_id", "embedding") + s""",
${unitCte("iv_u", s"fl_c$iters")},
idx_cell AS MATERIALIZED (SELECT p.id, u.cell
  FROM pq_unit p CROSS JOIN iv_u u
  QUALIFY ROW_NUMBER() OVER (PARTITION BY p.id
    ORDER BY list_dot_product(p.uv, u.unit) DESC, u.cell) = 1),
enc_s AS MATERIALIZED (SELECT u.id, j.j, u.uv[j.j * $sd + 1 : j.j * $sd + $sd] AS sv
  FROM pq_unit u, (SELECT unnest(generate_series(0, ${m - 1})) AS j) j),
enc AS MATERIALIZED (SELECT e.id, e.j, c.code
  FROM enc_s e JOIN $fin c ON e.j = c.j
  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.id, e.j
    ORDER BY list_dot_product(e.sv, c.cv) - list_dot_product(c.cv, c.cv) / 2 DESC, c.code) = 1),
qv AS MATERIALIZED (SELECT id AS q_id, uv AS q_v FROM pq_unit WHERE id < 5),
probes AS MATERIALIZED (SELECT q.q_id, u.cell
  FROM qv q CROSS JOIN iv_u u
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q.q_id
    ORDER BY list_dot_product(q.q_v, u.unit) DESC, u.cell) <= $nProbe),
cand AS MATERIALIZED (SELECT p.q_id, ic.id AS c_id
  FROM probes p JOIN idx_cell ic USING (cell)),
adc_c AS MATERIALIZED (SELECT ca.q_id, ca.c_id, e.j,
  list_dot_product(q.q_v[e.j * $sd + 1 : e.j * $sd + $sd], c.cv) AS contrib
  FROM cand ca JOIN qv q USING (q_id)
  JOIN enc e ON ca.c_id = e.id JOIN $fin c ON e.j = c.j AND e.code = c.code),
adc AS MATERIALIZED (SELECT q_id, c_id,
  ROUND(${seqSumOrdered("contrib", "j")}, 6) AS adc
  FROM adc_c GROUP BY q_id, c_id),
short AS MATERIALIZED (SELECT q_id, c_id FROM adc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc DESC, c_id) <= ${k * refine}),
rr AS MATERIALIZED (SELECT s.q_id, s.c_id,
  ROUND(list_dot_product(q.q_v, u.uv), 6) AS cos
  FROM short s JOIN qv q USING (q_id) JOIN pq_unit u ON s.c_id = u.id)
SELECT q_id, c_id, cos,
  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS BIGINT) AS rk
FROM rr QUALIFY rk <= $k ORDER BY q_id, rk"""
  }

  /** d11_semantic_dedup: fitLocal(k=8, iters=2) + cell assignment +
    * within-cell cosine ≥ 0.4 pairs + min-id-survives keep labels.
    * The grid-block join is exact by construction (blocks only bound
    * task memory), so the oracle joins cells directly. */
  val d11SemanticDedup: String =
    "WITH " + fitLocalCtes(8, 2, 1, 65536, 64, "embeddings", "vec_id", "embedding") + s""",
${unitCte("sd_u", "fl_c2")},
sd_asg AS MATERIALIZED (SELECT n.id, n.v, n.nrm, u.cell,
  list_dot_product(n.v, u.unit) / n.nrm AS cc
  FROM fl_nn n CROSS JOIN sd_u u
  QUALIFY ROW_NUMBER() OVER (PARTITION BY n.id ORDER BY cc DESC, u.cell) = 1),
sd_p AS MATERIALIZED (SELECT a.id AS a_id, b.id AS b_id
  FROM sd_asg a JOIN sd_asg b ON a.cell = b.cell AND a.id < b.id
  WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4),
sd_n AS MATERIALIZED (SELECT pid, COUNT(*)::BIGINT AS n_dup_pairs, MAX(dropped) AS is_dropped
  FROM (SELECT a_id AS pid, 0 AS dropped FROM sd_p
        UNION ALL SELECT b_id, 1 FROM sd_p) GROUP BY pid)
SELECT g.id AS vec_id, g.cell,
  COALESCE(n.is_dropped = 0, TRUE) AS keep,
  COALESCE(n.n_dup_pairs, 0)::BIGINT AS n_dup_pairs
FROM sd_asg g LEFT JOIN sd_n n ON g.id = n.pid
ORDER BY vec_id"""
}
