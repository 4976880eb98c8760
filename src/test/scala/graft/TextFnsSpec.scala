package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(text).toDF("text").select(c.as("r")).collect().head
      .getAs[collection.Seq[String]]("r").toSeq

  test("tokens lowercases, trims, drops empties") {
    val t = one(TextFns.tokens(col("text")), "  Hello   WORLD  foo ")
    assert(t == Seq("hello", "world", "foo"))
  }

  test("shingles produce n-k+1 k-grams, short docs one shingle") {
    val s = one(TextFns.shingles(TextFns.tokens(col("text")), 3), "a b c d e")
    assert(s == Seq("a b c", "b c d", "c d e"))
    val short = one(TextFns.shingles(TextFns.tokens(col("text")), 3), "a b")
    assert(short == Seq("a b"))
  }

  test("identical texts yield identical minhash signatures; disjoint texts differ") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words entirely unrelated content here now ok then")
    ).toDF("id", "text")
    val sig = TextFns.minhashSignature(
      TextFns.shingleHashes(TextFns.shingles(TextFns.tokens(col("text")), 3)), 64)
    val sigs = df.select(col("id"), sig.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 64)
  }

  test("minhash jaccard estimate: identical=1.0, disjoint~0") {
    val df = Seq(
      ("a b c d e f g h i j", "a b c d e f g h i j"),
      ("a b c d e f g h i j", "z y x w v u t s r q")
    ).toDF("t1", "t2")
    def sig(c: org.apache.spark.sql.Column) =
      TextFns.minhashSignature(TextFns.shingleHashes(TextFns.shingles(TextFns.tokens(c), 3)), 64)
    val est = df.select(TextFns.minhashJaccard(sig(col("t1")), sig(col("t2"))).as("j"))
      .as[Double].collect()
    assert(est(0) == 1.0)
    assert(est(1) < 0.2)
  }

  test("simhash: identical texts equal, near-identical close, disjoint far") {
    val df = Seq(
      (1L, "spark is a unified analytics engine for large scale data processing"),
      (2L, "spark is a unified analytics engine for large scale data processing"),
      (3L, "spark is a unified analytics engine for large scale data processing today"),
      (4L, "cats meow dogs bark birds sing fish swim horses gallop llamas hum")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextFns.simhash64(TextFns.tokens(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(java.lang.Long.bitCount(out(1L) ^ out(3L)) <= 12)
    assert(java.lang.Long.bitCount(out(1L) ^ out(4L)) > 12)
  }

  test("langId picks the language with most markers; und for no markers") {
    val df = Seq(
      (1L, "the cat sat on a mat and it is warm in the sun"),
      (2L, "der hund und die katze das ist nicht ein problem zu haben"),
      (3L, "el perro y la casa de un amigo que es grande en madrid"),
      (4L, "xyzzy plugh qwerty asdf")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextFns.langId(TextFns.tokens(col("text"))).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "und"))
  }

  test("quality features") {
    val f = TextFns.qualityFeatures(col("text"))
    val row = Seq("the cat, the hat!").toDF("text")
      .select(f("n_tokens").as("n"), f("punct_ratio").as("p"), f("stopword_ratio").as("s"))
      .collect().head
    assert(row.getLong(0) == 4L)
    assert(math.abs(row.getDouble(1) - 2.0 / 17.0) < 1e-9)
    assert(row.getDouble(2) == 0.5) // "the" twice of 4 tokens
  }

  test("fingerprints are deterministic and non-empty") {
    def fps(s: String): Seq[Seq[Long]] =
      TextFns.withFingerprints(Seq(s).toDF("text"), "text", 8, 4)
        .select("fp").collect().map(_.getSeq[Long](0)).toSeq
    val a = fps("some document text that is long enough to window")
    val b = fps("some document text that is long enough to window")
    assert(a == b && a.head.nonEmpty)
    // identical prefixes share fingerprints (the winnowing guarantee that
    // makes them useful for near-dup detection); short docs yield one
    val c = fps("some document text that is long enough to window PLUS EXTRA TAIL HERE")
    assert(a.head.toSet.intersect(c.head.toSet).nonEmpty)
    assert(fps("tiny").head.length == 1)
  }

  test("marker-count kernel matches the declarative scoring") {
    import graft.expressions.TextKernels
    val docs = Seq(
      "the cat sat on a mat and it is warm in the sun",
      "der hund und die katze das ist nicht ein problem zu haben",
      "el perro y la casa de un amigo que es grande en madrid",
      "xyzzy plugh qwerty asdf", "", "   ", "the the the und und es le"
    ).toDF("text")
    val kernel = docs.select(
      TextKernels.langMarkerCounts(col("text"), TextFns.langMarkers.map(_._2)).as("mc"))
      .collect().map(_.getSeq[Long](0).toSeq)
    val declarative = docs.select(
      array(TextFns.langMarkers.map { case (_, ws) =>
        TextFns.markerCount(TextFns.tokens(col("text")), ws) }: _*).as("mc"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(kernel.toSeq == declarative.toSeq)
  }

  test("redactPii replaces emails, IPs, and phone runs with typed tokens") {
    def red(s: String): (String, Long, Long, Long) = {
      val df = Seq(s).toDF("text")
      val counts = TextFns.piiCounts(col("text"))
      df.select(TextFns.redactPii(col("text")).as("r"),
          counts("n_emails"), counts("n_phones"), counts("n_ips"))
        .as[(String, Long, Long, Long)].head()
    }
    assert(red("mail a.b+c@ex-1.org or b@x.io now") == (("mail <EMAIL> or <EMAIL> now", 2L, 0L, 0L)))
    assert(red("call +1 555-010-99 asap") == (("call <PHONE> asap", 0L, 1L, 0L)))
    assert(red("from 192.168.0.1 port 80") == (("from <IP> port 80", 0L, 0L, 1L)))
    // order: the IP's digit runs must not leak into a phone match, and a
    // digit-heavy email local part must not count as a phone
    assert(red("x 10.0.0.1 y 1-555-010-42 z") == (("x <IP> y <PHONE> z", 0L, 1L, 1L)))
    assert(red("d 1234567890@spam.example e") == (("d <EMAIL> e", 1L, 0L, 0L)))
    assert(red("clean text stays clean") == (("clean text stays clean", 0L, 0L, 0L)))
  }

  test("normalize strips markup/URLs/emails/control chars, folds case, collapses whitespace") {
    def norm(s: String): (String, Long) =
      Seq(s).toDF("text")
        .select(TextFns.normalize(col("text")).as("n"), TextFns.noiseCount(col("text")).as("c"))
        .as[(String, Long)].head()

    assert(norm("<p>Hello</p> visit https://example.com/x?y=1 or mail me@example.org  NOW") ==
      (("hello visit or mail now", 4L)))
    assert(norm("a\u0001b\nc") == (("a b c", 0L)))
    assert(norm("  Tabs\tand\r\nnewlines  ") == (("tabs and newlines", 0L)))
    assert(norm("http://plain.example/path trailing") == (("trailing", 1L)))
    // already-clean text is a fixpoint — the guarantee the dedup family
    // relies on (normalize(normalize(x)) == normalize(x))
    val clean = "key agg row scan slow fast table value"
    assert(norm(clean) == ((clean, 0L)))
  }

  test("token-stats kernel matches declarative token/length/stopword counts") {
    import graft.expressions.TextKernels
    val docs = Seq("the cat, the hat!", "", "  one  ", "a bb ccc dddd the")
      .toDF("text")
    val stops = TextFns.langMarkers.head._2
    val kernel = docs.select(TextKernels.tokenStats(col("text"), stops).as("st"))
      .collect().map(_.getSeq[Long](0).toSeq)
    val toks = TextFns.tokens(col("text"))
    val declarative = docs.select(array(
      size(toks).cast("long"),
      coalesce(aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")), lit(0L)),
      TextFns.markerCount(toks, stops)).as("st"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(kernel.toSeq == declarative.toSeq)
  }

  test("repetition-stats kernel matches the explode + groupBy token counts") {
    import graft.expressions.TextKernels
    // covers: repeats, all-distinct, single token, unicode whitespace
    // handling via \s+, case folding, and the zero-token shapes the
    // query's pre-filter must drop identically — including the
    // NON-SPACE whitespace-only docs (tab/newline, CR-space-FF) where
    // the former length(trim(text)) > 0 filter diverged from explode
    // semantics (ADVICE r18: SQL trim strips 0x20 only)
    val docs = Seq(
      "the cat the hat the", "a bb ccc dddd", "solo", "x X x X",
      "tab\tand\nnewline tab", "", "   ", "\t\n", "\r \f",
      "a a a a a a a a b")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val kernel = docs
      .where(col("text").isNotNull && col("text").rlike("\\S"))
      .select(col("doc_id"), TextKernels.repetitionStats(col("text")).as("st"))
      .select(col("doc_id"), element_at(col("st"), 1), element_at(col("st"), 2),
        element_at(col("st"), 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val declarative = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("d"), max(col("c")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(kernel == declarative)
    // the pre-filter is EXACTLY the explode row-dropping rule: both sides
    // must have dropped the empty and ALL whitespace-only docs (spaces,
    // tab/newline, CR-space-FF)
    assert(kernel.size == 6)
  }
}
