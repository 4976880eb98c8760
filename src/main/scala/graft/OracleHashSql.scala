package graft

import graft.expressions.MinHashCoefficients
import graft.operators.Similarity

/** DuckDB oracle SQL for the hash-kernel operators (d02, d03, s02, s03,
  * t04) — the five queries previously declared weak-by-design because their
  * signatures come from custom codegen kernels. The kernels are pure
  * integer arithmetic (31-poly char fold + splitmix64 finalizer, wrapped
  * 64-bit multiply/add), so the SAME arithmetic is expressible in SQL by
  * emulating Java's two's-complement wraparound in HUGEINT:
  *
  *   - values live in the unsigned domain [0, 2^64); `% 2^64` after every
  *     multiply/add reproduces the wrap,
  *   - a 64×64-bit wrapped product is split 32/32 so no intermediate
  *     exceeds 2^97 (HUGEINT is 128-bit but checked — a direct u64×u64
  *     product would overflow and DuckDB throws instead of wrapping),
  *   - xor/shift hop to the signed domain and back (DuckDB `xor` is
  *     BIGINT-only; `>>> n` is `// 2^n` on the unsigned form),
  *   - Java's signed `%` (used by the minhash universal hash) is
  *     `((s % P) + P) % P` on the re-signed value.
  *
  * Each intermediate is one CTE column — inlining the whole finalizer
  * would duplicate subtrees ~8× per stage (measured: minutes to even plan).
  *
  * Model constants are read from the SAME definitions the engine uses
  * ([[MinHashCoefficients]], [[Similarity.hyperplanes]]) so the oracle
  * can never drift from the kernels it checks. Tokenization relies on the
  * Java/RE2 `\s+` common subset and BMP-only text (UTF-16 code units =
  * code points), the same contract t01/t13's oracles already use.
  */
object OracleHashSql {

  private val H = "18446744073709551616" // 2^64
  private val HH = "9223372036854775808" // 2^63

  private def s64(x: String): String =
    s"CAST(($x) - CASE WHEN ($x) >= $HH THEN CAST($H AS HUGEINT) ELSE 0 END AS BIGINT)"

  private def u64(y: String): String =
    s"(CAST(($y) AS HUGEINT) + CASE WHEN ($y) < 0 THEN CAST($H AS HUGEINT) ELSE 0 END)"

  private def xoru(a: String, b: String): String =
    u64(s"xor(${s64(a)}, ${s64(b)})")

  /** Wrapped multiply by an unsigned 64-bit CONSTANT, 32/32 split. */
  private def wmulc(c: BigInt, z: String): String = {
    val hi = c >> 32
    val lo = c & 0xFFFFFFFFL
    s"((($hi * ($z)) % 4294967296 * 4294967296 + $lo * ($z)) % $H)"
  }

  private def unsignedConst(v: Long): BigInt = BigInt(v) & ((BigInt(1) << 64) - 1)

  /** 31-poly char fold (unsigned). Empty string folds zero chars —
    * string_split('','') yields [''], hence the filter.
    */
  private def poly(s: String): String = {
    val chars = s"list_filter(string_split($s, ''), c -> c <> '')"
    val vals = s"list_transform($chars, c -> CAST(unicode(c) AS HUGEINT))"
    s"list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), $vals), (h, c) -> (31*h + c) % $H)"
  }

  /** Staged splitmix64 finalizer: input CTE `src` must expose unsigned
    * column `h0`; emits CTEs m1..m4, the last exposing unsigned `hu`,
    * carrying `carry` columns through.
    */
  private def mixCtes(src: String, carry: Seq[String]): String = {
    val cols = carry.mkString(", ")
    val c1 = unsignedConst(0xBF58476D1CE4E5B9L)
    val c2 = unsignedConst(0x94D049BB133111EBL)
    s"""m1 AS (SELECT $cols, (h0 + 11400714819323198485) % $H AS z1 FROM $src),
       |m2 AS (SELECT $cols, ${wmulc(c1, xoru("z1", "(z1 // 1073741824)"))} AS z2 FROM m1),
       |m3 AS (SELECT $cols, ${wmulc(c2, xoru("z2", "(z2 // 134217728)"))} AS z3 FROM m2),
       |m4 AS (SELECT $cols, ${xoru("z3", "(z3 // 2147483648)")} AS hu FROM m3)""".stripMargin
  }

  /** Whitespace tokenization, identical to the kernel's
    * `trim.toLowerCase.split("\\s+").filter(_.nonEmpty)`.
    */
  private val toks =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '') AS tk
      |  FROM documents)""".stripMargin

  /** The s01-oracle cosine (float inputs CAST to DOUBLE, left-to-right
    * list_sum — the dotFF accumulation order).
    */
  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), s -> CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
       |    * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))""".stripMargin

  private def topKRerank(k: Int): String =
    s"""scored AS (
       |  SELECT cd.q_id, cd.neighbor_id, ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM cand cd JOIN embeddings q ON q.vec_id = cd.q_id
       |  JOIN embeddings c ON c.vec_id = cd.neighbor_id),
       |r AS (SELECT q_id, neighbor_id, cos,
       |             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rnk
       |      FROM scored)
       |SELECT q_id, neighbor_id, round(cos, 4) AS cos, CAST(rnk AS BIGINT) AS "rank"
       |FROM r WHERE rnk <= $k""".stripMargin

  /** d03: 64-bit SimHash over per-token hashes, ALL pairs at hamming <= 3.
    * The engine's 4×16-bit chunk banding is exact here by pigeonhole
    * (3 bit flips cannot touch all 4 chunks), so the all-pairs oracle is a
    * true hash-match, not a recall floor.
    */
  def d03Sql: String =
    s"""WITH $toks,
       |sh AS (SELECT doc_id, CASE WHEN len(tk) = 0 THEN [''] ELSE tk END AS shs FROM toks),
       |g AS (SELECT doc_id, unnest(shs) AS s FROM sh),
       |h AS (SELECT doc_id, ${poly("s")} AS h0 FROM g),
       |${mixCtes("h", Seq("doc_id"))},
       |votes AS (
       |  SELECT doc_id, b.b AS b,
       |         sum(CASE WHEN (hu // (CAST(1 AS HUGEINT) << b.b)) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM m4, (SELECT unnest(range(0, 64)) AS b) b GROUP BY 1, 2),
       |sig AS (
       |  SELECT doc_id, ${s64("sum(CASE WHEN v > 0 THEN (CAST(1 AS HUGEINT) << b) ELSE 0 END)")} AS sim
       |  FROM votes GROUP BY 1),
       |pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, bit_count(xor(x.sim, y.sim)) AS hamming
       |  FROM sig x JOIN sig y ON x.doc_id < y.doc_id)
       |SELECT a, b, CAST(hamming AS INT) AS hamming FROM pairs WHERE hamming <= 3""".stripMargin

  /** d02: 64-hash MinHash over 3-token shingles, 16-band candidates,
    * signature-match-fraction estimate >= 0.5. Shingle DISTINCT is safe
    * (duplicates cannot change a min); band equality compares the raw
    * 4-row slice — the engine's xxhash64 band key equals slice equality
    * up to 2^-64 collisions, the same odds the engine itself accepts.
    */
  def d02Sql: String = {
    val p = "2305843009213693951"
    val coefs = MinHashCoefficients.a(64).zip(MinHashCoefficients.b(64)).zipWithIndex
      .map { case ((a, b), j) =>
        s"($j, CAST('${unsignedConst(a)}' AS HUGEINT), CAST('${unsignedConst(b)}' AS HUGEINT))"
      }
      .mkString(", ")
    val wmul = s"(((a // 4294967296 * hu) % 4294967296) * 4294967296 + (a % 4294967296) * hu) % $H"
    s"""WITH $toks,
       |sh AS (
       |  SELECT doc_id, CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
       |         ELSE list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')) END AS shs
       |  FROM toks),
       |g AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
       |h AS (SELECT doc_id, ${poly("s")} AS h0 FROM g),
       |${mixCtes("h", Seq("doc_id"))},
       |cf(j, a, b) AS (SELECT * FROM (VALUES $coefs)),
       |mh AS (
       |  SELECT doc_id, j, min(((${s64(s"(($wmul) + b) % $H")}) % $p + $p) % $p) AS mh
       |  FROM m4, cf GROUP BY 1, 2),
       |sig AS (SELECT doc_id, list(mh ORDER BY j) AS sig FROM mh GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, b.b AS b, array_to_string(sig[4*b.b+1:4*b.b+4], ',') AS bv
       |  FROM sig, (SELECT unnest(range(0, 16)) AS b) b),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id),
       |est AS (
       |  SELECT c.a, c.b,
       |    len(list_filter(range(1, 65), i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)])) AS m
       |  FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b)
       |SELECT a, b,
       |       CAST((2*m*10000 + 64) // 128 AS DOUBLE) / 10000.0 AS est_jaccard
       |FROM est WHERE m >= 32""".stripMargin
  }

  /** s02: 64-bit hyperplane signatures (the engine's seeded ±1 planes
    * embedded verbatim), 32×2-bit band candidates, exact-cosine top-5.
    * Sign ties are engine-exact: each plane dot is a left-to-right double
    * sum of EXACT ±v[i] products on both sides.
    */
  def s02Sql: String = {
    val rows = Similarity.hyperplanes(bits = 64, dim = 64).zipWithIndex
      .map { case (pv, j) =>
        val bv = (BigInt(1) << j).toString
        pv.map(v => if (v > 0) "1.0" else "-1.0")
          .mkString(s"($j, CAST('$bv' AS HUGEINT), [", ",", "]::DOUBLE[])")
      }
      .mkString(", ")
    val dot = "list_sum(list_transform(list_zip(e.embedding, p.pv), s -> CAST(s[1] AS DOUBLE)*s[2]))"
    s"""WITH pl(j, bv, pv) AS (SELECT * FROM (VALUES $rows)),
       |sig AS (
       |  SELECT e.vec_id, sum(CASE WHEN $dot >= 0.0 THEN p.bv ELSE CAST(0 AS HUGEINT) END) AS sig
       |  FROM embeddings e, pl p GROUP BY 1),
       |bands AS (
       |  SELECT vec_id, b.b AS b, (sig // (CAST(1 AS HUGEINT) << (2*b.b))) % 4 AS bv
       |  FROM sig, (SELECT unnest(range(0, 32)) AS b) b),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
       |  FROM bands q JOIN bands c ON q.b = c.b AND q.bv = c.bv AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 8),
       |${topKRerank(5)}""".stripMargin
  }

  /** s03: IVF with the 16 lowest-id centroids, 4-probe cells, exact-cosine
    * top-5 within probed cells — the s10 coarse-quantizer CTEs (which
    * already hash-match) plus the s01 rerank.
    */
  def s03Sql: String =
    s"""WITH cents AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS ci, embedding AS cv
       |  FROM embeddings ORDER BY vec_id LIMIT 16),
       |cscore AS (
       |  SELECT e.vec_id, c.ci, ${cosSql("e.embedding", "c.cv")} AS cos FROM embeddings e, cents c),
       |cells AS (
       |  SELECT vec_id, ci AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ci DESC) AS rn FROM cscore)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, ci AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ci DESC) AS rn
       |        FROM cscore WHERE vec_id < 8)
       |  WHERE rn <= 4),
       |cand AS (
       |  SELECT p.q_id, ce.vec_id AS neighbor_id
       |  FROM probes p JOIN cells ce ON ce.cell = p.cell AND ce.vec_id <> p.q_id),
       |${topKRerank(5)}""".stripMargin

  /** s12: IVF search with the TRAINED coarse quantizer — s11's three
    * exact-integer Lloyd rounds re-derived inline (CTEs kc..cfin, the s11
    * oracle verbatim with its `cells` renamed), centroids converted to
    * float exactly as `kmeansCentroidVectors` does (double quotient then
    * round-to-float), then the s03 probe/rerank chain over those centroids.
    * One oracle proving model TRAINING and model CONSUMPTION agree
    * end-to-end.
    */
  /** s11's three exact-integer Lloyd rounds as CTEs ending in
    * `cents(ci, cv)` — shared by every trained-quantizer consumer oracle
    * (s12, d13) so the trained model has ONE SQL definition.
    */
  private val lloydCents: String =
    s"""kc AS (
       |  SELECT vec_id, CAST(i AS BIGINT) AS dim,
       |         CAST(round(CAST(embedding[CAST(i+1 AS INT)] AS DOUBLE) * 1000000) AS BIGINT) AS x6
       |  FROM embeddings, range(0, 64) t(i)),
       |ids AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS ci
       |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
       |c0 AS (SELECT i.ci, c.dim, c.x6 AS c6 FROM ids i JOIN kc c USING (vec_id)),
       |dist1 AS (
       |  SELECT c.vec_id, k.ci, CAST(sum((c.x6 - k.c6)*(c.x6 - k.c6)) AS BIGINT) AS d2
       |  FROM kc c JOIN c0 k ON c.dim = k.dim GROUP BY 1, 2),
       |asg1 AS (
       |  SELECT vec_id, ci
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, ci ASC) AS rn FROM dist1)
       |  WHERE rn = 1),
       |upd1 AS (
       |  SELECT a.ci, c.dim, CAST(sum(c.x6) AS BIGINT) // count(*) AS c6n
       |  FROM asg1 a JOIN kc c USING (vec_id) GROUP BY 1, 2),
       |c1 AS (SELECT p.ci, p.dim, coalesce(u.c6n, p.c6) AS c6
       |       FROM c0 p LEFT JOIN upd1 u ON p.ci = u.ci AND p.dim = u.dim),
       |dist2 AS (
       |  SELECT c.vec_id, k.ci, CAST(sum((c.x6 - k.c6)*(c.x6 - k.c6)) AS BIGINT) AS d2
       |  FROM kc c JOIN c1 k ON c.dim = k.dim GROUP BY 1, 2),
       |asg2 AS (
       |  SELECT vec_id, ci
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, ci ASC) AS rn FROM dist2)
       |  WHERE rn = 1),
       |upd2 AS (
       |  SELECT a.ci, c.dim, CAST(sum(c.x6) AS BIGINT) // count(*) AS c6n
       |  FROM asg2 a JOIN kc c USING (vec_id) GROUP BY 1, 2),
       |c2 AS (SELECT p.ci, p.dim, coalesce(u.c6n, p.c6) AS c6
       |       FROM c1 p LEFT JOIN upd2 u ON p.ci = u.ci AND p.dim = u.dim),
       |dist3 AS (
       |  SELECT c.vec_id, k.ci, CAST(sum((c.x6 - k.c6)*(c.x6 - k.c6)) AS BIGINT) AS d2
       |  FROM kc c JOIN c2 k ON c.dim = k.dim GROUP BY 1, 2),
       |asg3 AS (
       |  SELECT vec_id, ci
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, ci ASC) AS rn FROM dist3)
       |  WHERE rn = 1),
       |upd3 AS (
       |  SELECT a.ci, c.dim, CAST(sum(c.x6) AS BIGINT) // count(*) AS c6n
       |  FROM asg3 a JOIN kc c USING (vec_id) GROUP BY 1, 2),
       |cfin AS (SELECT p.ci, p.dim, coalesce(u.c6n, p.c6) AS c6
       |         FROM c2 p LEFT JOIN upd3 u ON p.ci = u.ci AND p.dim = u.dim),
       |cents AS (
       |  SELECT ci, list(CAST(CAST(c6 AS DOUBLE) / 1000000.0 AS REAL) ORDER BY dim) AS cv
       |  FROM cfin GROUP BY ci)""".stripMargin

  def s12Sql: String =
    s"""WITH $lloydCents,
       |cscore AS (
       |  SELECT e.vec_id, c.ci, ${cosSql("e.embedding", "c.cv")} AS cos FROM embeddings e, cents c),
       |cells AS (
       |  SELECT vec_id, ci AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ci DESC) AS rn FROM cscore)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, ci AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ci DESC) AS rn
       |        FROM cscore WHERE vec_id < 8)
       |  WHERE rn <= 4),
       |cand AS (
       |  SELECT p.q_id, ce.vec_id AS neighbor_id
       |  FROM probes p JOIN cells ce ON ce.cell = p.cell AND ce.vec_id <> p.q_id),
       |${topKRerank(5)}""".stripMargin

  /** d13: SemDeDup over the s11-TRAINED quantizer — d11's cell-local
    * keep-min-id pass with the Lloyd centroids ([[lloydCents]]) in place
    * of the lowest-id stand-ins; the last stand-in consumer closed.
    */
  def d13Sql: String =
    s"""WITH $lloydCents,
       |score AS (
       |  SELECT e.vec_id, e.embedding, c.ci, ${cosSql("e.embedding", "c.cv")} AS cos
       |  FROM embeddings e CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, embedding, ci AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, ci DESC) AS rn
       |        FROM score)
       |  WHERE rn = 1),
       |rm AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM assign a JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
       |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35)
       |SELECT a.vec_id, a.cell,
       |       CAST(CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM assign a LEFT JOIN rm r ON a.vec_id = r.vec_id""".stripMargin

  /** t04: char-8-gram winnowing (window 4). `n_fp`/`fp_min` are
    * order-independent views of the fingerprint set (count-distinct and
    * min of the window minima), so the first-occurrence ordering the
    * kernel preserves needs no SQL mirror.
    */
  def t04Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lower(trim(text)) AS tx,
       |         greatest(length(lower(trim(text))) - 7, 1) AS ng FROM documents),
       |g AS (
       |  SELECT doc_id, ng, i.i AS i, substr(tx, CAST(i.i AS INT), 8) AS s
       |  FROM t, LATERAL (SELECT unnest(range(1, ng + 1)) AS i) i),
       |h AS (SELECT doc_id, ng, i, ${poly("s")} AS h0 FROM g),
       |${mixCtes("h", Seq("doc_id", "ng", "i"))},
       |gh AS (SELECT doc_id, ng, i, ${s64("hu")} AS gh FROM m4),
       |small AS (
       |  SELECT doc_id, CAST(1 AS BIGINT) AS n_fp, min(gh) AS fp_min
       |  FROM gh WHERE ng <= 4 GROUP BY doc_id),
       |wins AS (
       |  SELECT a.doc_id, a.i, min(b.gh) AS w
       |  FROM gh a JOIN gh b ON b.doc_id = a.doc_id AND b.i BETWEEN a.i AND a.i + 3
       |  WHERE a.ng > 4 AND a.i <= a.ng - 3
       |  GROUP BY a.doc_id, a.i),
       |big AS (
       |  SELECT doc_id, CAST(count(DISTINCT w) AS BIGINT) AS n_fp, min(w) AS fp_min
       |  FROM wins GROUP BY doc_id)
       |SELECT * FROM small UNION ALL SELECT * FROM big""".stripMargin

  /** t17: exact-integer Bloom contamination (m = 2^16 bits, 4
    * Kirsch–Mitzenmacher probes from the hash's unsigned 32-bit halves:
    * p_i = (lo + i·hi) mod m). The filter IS the distinct set of eval
    * probe positions, so membership — including every false positive —
    * re-derives exactly; 5-token shingles and the splitmix64 hash are the
    * d02/t08 pipeline verbatim.
    */
  def t17Sql: String =
    s"""WITH $toks,
       |sh AS (
       |  SELECT doc_id, CASE WHEN len(tk) <= 5 THEN [array_to_string(tk, ' ')]
       |         ELSE list_transform(range(1, len(tk) - 3), i -> array_to_string(tk[i:i+4], ' ')) END AS shs
       |  FROM toks),
       |g AS (SELECT doc_id, unnest(shs) AS s FROM sh),
       |h AS (SELECT doc_id, ${poly("s")} AS h0 FROM g),
       |${mixCtes("h", Seq("doc_id"))},
       |hset AS (SELECT DISTINCT doc_id, hu FROM m4),
       |parts AS (
       |  SELECT doc_id, hu, (hu % 4294967296) AS lo, (hu // 4294967296) AS hi
       |  FROM hset),
       |evp AS (
       |  SELECT DISTINCT ((lo + i.i * hi) % 65536) AS p
       |  FROM parts, (SELECT unnest(range(0, 4)) AS i) i
       |  WHERE doc_id < 20),
       |flag AS (
       |  SELECT doc_id, hu FROM parts
       |  WHERE doc_id >= 20
       |    AND ((lo + 0 * hi) % 65536) IN (SELECT p FROM evp)
       |    AND ((lo + 1 * hi) % 65536) IN (SELECT p FROM evp)
       |    AND ((lo + 2 * hi) % 65536) IN (SELECT p FROM evp)
       |    AND ((lo + 3 * hi) % 65536) IN (SELECT p FROM evp))
       |SELECT doc_id, count(*) AS n_flagged FROM flag GROUP BY doc_id""".stripMargin

  /** q71: global sketch-boundary equal-frequency bins — the bottom-256
    * orders by unsigned splitmix64(o_orderkey) form the deterministic
    * sample (q65's contract), decile boundaries are type-1 picks over it
    * (ceil in FP — the q65 rule; the i/10.0 literals match the engine's
    * once-rounded doubles), and membership is the 9-comparison sum. The
    * whole chain is a pure function of the order set, so bins and their
    * exact per-bin stats hash-match.
    */
  def q71Sql: String = {
    val k = 256
    val bounds = (1 until 10).map { i =>
      s"max(CASE WHEN rn = CAST(ceil(ns * ${i / 10.0}) AS BIGINT) THEN price_c END) AS b$i"
    }.mkString(",\n       |  ")
    val binSum = (1 until 10).map(i =>
      s"(CASE WHEN o.price_c >= b.b$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH src AS (
       |  SELECT ${u64("o_orderkey")} AS h0,
       |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
       |  FROM orders),
       |${mixCtes("src", Seq("price_c"))},
       |r AS (SELECT price_c, hu, row_number() OVER (ORDER BY hu) AS hrk FROM m4),
       |samp AS (SELECT price_c, hu FROM r WHERE hrk <= $k),
       |sq AS (SELECT price_c,
       |              row_number() OVER (ORDER BY price_c ASC, hu ASC) AS rn,
       |              count(*) OVER () AS ns
       |       FROM samp),
       |b AS (SELECT
       |  $bounds
       |  FROM sq),
       |binned AS (
       |  SELECT o.price_c, 1 + $binSum AS bin
       |  FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders) o, b)
       |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_orders,
       |       min(price_c) AS min_c, max(price_c) AS max_c,
       |       CAST(sum(price_c) AS BIGINT) AS sum_c
       |FROM binned GROUP BY 1""".stripMargin
  }

  /** q63: KMV distinct sketch — per event_type, the k smallest distinct
    * splitmix64(user_id) hashes in UNSIGNED order, estimate = exact
    * integer floor((k−1)·2⁶⁴ / kth). splitmix64 is a bijection on 64 bits,
    * so distinct user_ids map to distinct hashes and the sketch state is a
    * pure function of the user set — the SQL re-derivation proves the
    * engine's TypedImperativeAggregate (buffer inserts, unsigned evictions,
    * merge tree) lands on the identical k-minimum set.
    */
  def q63Sql: String = {
    val k = 64
    s"""WITH src AS (
       |  SELECT event_type, ${u64("user_id")} AS h0
       |  FROM (SELECT DISTINCT event_type, user_id FROM events)),
       |${mixCtes("src", Seq("event_type"))},
       |r AS (SELECT event_type, hu,
       |             row_number() OVER (PARTITION BY event_type ORDER BY hu) AS rk,
       |             count(*) OVER (PARTITION BY event_type) AS n
       |      FROM m4),
       |kk AS (SELECT event_type, max(CASE WHEN rk = $k THEN hu END) AS kth, max(n) AS n
       |       FROM r GROUP BY 1)
       |SELECT kk.event_type,
       |  CASE WHEN n >= $k
       |       THEN CAST((${k - 1} * CAST(18446744073709551616 AS HUGEINT)) // greatest(kth, 1) AS BIGINT)
       |       ELSE n END AS est_users,
       |  CASE WHEN n >= $k THEN ${s64("kth")} ELSE NULL END AS kth_hash
       |FROM kk""".stripMargin
  }

  /** q64: the GLOBAL sketch — one k-min set over all distinct user hashes.
    * The oracle derives ONE estimate; the engine must land on it twice
    * (per-type states union-merged, and the direct global sketch): the
    * merge-exactness theorem k-min(∪ sets) = k-min(∪ k-min sets) as a
    * hash-checked equality.
    */
  def q64Sql: String = {
    val k = 64
    s"""WITH src AS (
       |  SELECT ${u64("user_id")} AS h0
       |  FROM (SELECT DISTINCT user_id FROM events)),
       |${mixCtes("src", Seq("h0"))},
       |r AS (SELECT hu, row_number() OVER (ORDER BY hu) AS rk, count(*) OVER () AS n FROM m4),
       |kk AS (SELECT max(CASE WHEN rk = $k THEN hu END) AS kth, max(n) AS n FROM r),
       |est AS (
       |  SELECT CASE WHEN n >= $k
       |         THEN CAST((${k - 1} * CAST(18446744073709551616 AS HUGEINT)) // greatest(kth, 1) AS BIGINT)
       |         ELSE n END AS e,
       |         CASE WHEN n >= $k THEN ${s64("kth")} ELSE NULL END AS kth_s
       |  FROM kk)
       |SELECT est.e AS est_union, est.kth_s AS kth_union, est.e AS est_direct
       |FROM est""".stripMargin
  }

  /** q69: KMV INTERSECTION estimate from two per-type k-min sets (the
    * theta-sketch estimator): θ = the union sketch's kth min, c = common
    * hashes inside the union's k-min set, est = c·est_union/k (exact
    * integer; c exact below fill). Every term is a pure function of the
    * two k-min sets, so the estimator re-derives bit-for-bit.
    */
  def q69Sql: String = {
    val k = 64
    s"""WITH src AS (
       |  SELECT event_type, ${u64("user_id")} AS h0
       |  FROM (SELECT DISTINCT event_type, user_id FROM events
       |        WHERE event_type IN ('click', 'purchase'))),
       |${mixCtes("src", Seq("event_type"))},
       |u AS (SELECT DISTINCT hu FROM m4),
       |r AS (SELECT hu, row_number() OVER (ORDER BY hu) AS rk, count(*) OVER () AS n FROM u),
       |kk AS (SELECT max(CASE WHEN rk = $k THEN hu END) AS kth, max(n) AS n FROM r),
       |eu AS (SELECT CASE WHEN n >= $k
       |              THEN CAST((${k - 1} * CAST(18446744073709551616 AS HUGEINT)) // greatest(kth, 1) AS BIGINT)
       |              ELSE n END AS est_union, n, kth FROM kk),
       |ka AS (SELECT hu, row_number() OVER (ORDER BY hu) AS rk
       |       FROM (SELECT DISTINCT hu FROM m4 WHERE event_type = 'click')),
       |kb AS (SELECT hu, row_number() OVER (ORDER BY hu) AS rk
       |       FROM (SELECT DISTINCT hu FROM m4 WHERE event_type = 'purchase')),
       |commons AS (
       |  SELECT a.hu FROM (SELECT hu FROM ka WHERE rk <= $k) a
       |  JOIN (SELECT hu FROM kb WHERE rk <= $k) b USING (hu)),
       |cc AS (SELECT count(*) AS n_common FROM commons, eu
       |       WHERE eu.n < $k OR commons.hu <= eu.kth)
       |SELECT CASE WHEN eu.n < $k THEN cc.n_common
       |            ELSE (cc.n_common * eu.est_union) // $k END AS est_intersection,
       |       cc.n_common, eu.est_union
       |FROM cc, eu""".stripMargin
  }

  /** q65: sample-quantile sketch — bottom-k rows by unsigned
    * splitmix64(event_id) per group, type-1 quantile picks over the sample
    * ordered by (value, unsigned hash). `ceil(n*q)` stays in FP on both
    * engines (q26's rule — ceil(9·n/10) in exact rationals can differ from
    * IEEE when 10 | 9n). NULL values are filtered to match the sketch's
    * skip-null update contract (ADVICE r7); the exact full-data quantiles
    * moved to the spec layer (sketch-only output, VERDICT r7).
    */
  def q65Sql: String = {
    val k = 256
    s"""WITH src AS (
       |  SELECT event_type, ${u64("event_id")} AS h0,
       |         CAST(round(value * 100) AS BIGINT) AS v_c
       |  FROM events
       |  WHERE value IS NOT NULL),
       |${mixCtes("src", Seq("event_type", "v_c"))},
       |r AS (SELECT event_type, v_c, hu,
       |             row_number() OVER (PARTITION BY event_type ORDER BY hu) AS hrk
       |      FROM m4),
       |samp AS (SELECT event_type, v_c, hu FROM r WHERE hrk <= $k),
       |sq AS (SELECT event_type, v_c,
       |              row_number() OVER (PARTITION BY event_type ORDER BY v_c ASC, hu ASC) AS rn,
       |              count(*) OVER (PARTITION BY event_type) AS n
       |       FROM samp)
       |SELECT event_type, max(n) AS n_sample,
       |       max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN v_c END) AS p50_c,
       |       max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN v_c END) AS p90_c
       |FROM sq GROUP BY 1""".stripMargin
  }
}
