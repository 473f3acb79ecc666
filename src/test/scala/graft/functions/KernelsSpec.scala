package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Native kernels must be bit-identical with the built-in formulations they
  * replace (the DuckDB oracle mirrors the built-in side). */
class KernelsSpec extends SparkSuite {

  import spark.implicits._

  private val docs = Seq(
    "The quick brown fox jumps over the lazy dog",
    "the the the",
    "one  two", // double space → empty token
    "solo",
    "a b c a b c d",
    "Ünïcode tëst ünïcode").toDF("text")

  test("token_set == array_sort(array_distinct(split(lower(text), ' ')))") {
    TextFunctions.ensureRegistered(spark)
    val cmp = docs.select(
      TextFunctions.tokenSet(col("text")).as("native"),
      array_sort(array_distinct(split(lower(col("text")), " "))).as("builtin"))
    assert(cmp.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("shingle_set == HOF word-trigram formulation") {
    TextFunctions.ensureRegistered(spark)
    val toks = split(lower(col("text")), " ")
    val hof = when(size(toks) >= 3,
      array_sort(array_distinct(
        transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3))))))
      .otherwise(array().cast("array<string>"))
    val cmp = docs.select(
      TextFunctions.shingleSet(col("text"), 3).as("native"), hof.as("builtin"))
    assert(cmp.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("sorted_intersect_size == size(array_intersect) on sorted distinct arrays") {
    TextFunctions.ensureRegistered(spark)
    val pairs = docs.select(TextFunctions.tokenSet(col("text")).as("a"))
      .crossJoin(docs.select(TextFunctions.tokenSet(col("text")).as("b")))
    val cmp = pairs.select(
      TextFunctions.sortedIntersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(cmp.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("cosine_sim matches the double left-to-right formula") {
    VectorFunctions.ensureRegistered(spark)
    val vecs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(0.5f, -0.5f), Array(0.5f, 0.5f)),
      (Array(1.0f), Array(1.0f))).toDF("a", "b")
    val got = vecs.select(VectorFunctions.cosineSim(col("a"), col("b")).as("c"))
      .as[Double].collect()
    def ref(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / math.sqrt(na * nb)
    }
    assert(got(0) === ref(Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
    assert(got(1) === ref(Array(0.5f, -0.5f), Array(0.5f, 0.5f)))
    assert(got(2) === 1.0)
  }

  test("simhash64 is deterministic and order/duplication-insensitive") {
    TextFunctions.ensureRegistered(spark)
    val sigs = Seq("a b c", "c b a", "a a b c c", "a b x")
      .toDF("text")
      .select(TextFunctions.simhash64(col("text")).as("s")).as[Long].collect()
    assert(sigs(0) === sigs(1)) // order-insensitive (set semantics)
    assert(sigs(0) === sigs(2)) // duplication-insensitive
    assert(sigs(0) !== sigs(3)) // different content differs
  }

  test("minhash_bands: identical shingle sets collide in every band") {
    TextFunctions.ensureRegistered(spark)
    val bands = Seq("w x y z", "z w x y") // same 3-shingle set? no — different
      .toDF("text")
      .select(TextFunctions.minhashBands(
        TextFunctions.shingleSet(col("text"), 1), 8, 4).as("b"))
      .as[Seq[Long]].collect()
    // 1-shingles (token sets) are identical → all 8 bands equal
    assert(bands(0) === bands(1))
  }

  test("mojibake/fix_mojibake: double-encoding round-trips; clean text untouched") {
    TextFunctions.ensureRegistered(spark)
    val cases = Seq(
      "café — déjà vu №1",   // accented + beyond-Latin-1 codepoints
      "plain ascii text",     // ASCII: mojibake is identity, repair no-op
      "中文 emoji 😀 mixed") // CJK + surrogate pairs
      .toDF("clean")
    val out = cases.select(col("clean"),
      TextFunctions.fixMojibake(TextFunctions.mojibake(col("clean"))).as("fixed"),
      TextFunctions.fixMojibake(col("clean")).as("noop"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) === r.getString(0),
        s"repair must invert the corruption for '${r.getString(0)}'")
      assert(r.getString(2) === r.getString(0),
        s"repair must not damage clean text '${r.getString(0)}'")
    }
    // genuine Latin-1-looking text whose bytes are NOT valid UTF-8 stays
    val latin1ish = Seq("Müller: 5°").toDF("s")
      .select(TextFunctions.fixMojibake(col("s"))).as[String].collect().head
    assert(latin1ish === "Müller: 5°")
  }

  test("unicode_normalize: NFC(NFD(x)) round-trips; ASCII untouched; forms differ") {
    TextFunctions.ensureRegistered(spark)
    val composed = "café naïve déjà №" // NFC source form
    val r = Seq(composed).toDF("s").select(
      TextFunctions.unicodeNormalize(
        TextFunctions.unicodeNormalize(col("s"), "NFD"), "NFC").as("roundtrip"),
      TextFunctions.unicodeNormalize(col("s"), "NFD").as("nfd"),
      TextFunctions.unicodeNormalize(col("s"), "NFKC").as("nfkc"))
      .collect().head
    assert(r.getString(0) === composed)
    assert(r.getString(1) !== composed, "NFD must decompose the accents")
    assert(r.getString(2).endsWith("No"), "NFKC folds № to 'No'")
    val ascii = Seq("plain ascii").toDF("s")
      .select(TextFunctions.unicodeNormalize(col("s"), "NFC"))
      .as[String].collect().head
    assert(ascii === "plain ascii")
  }

  test("script_counts == six regexp_replace range counts") {
    TextFunctions.ensureRegistered(spark)
    val adversarial = (docs.as[String].collect().toSeq ++ Seq(
      "ABC abc 012 кириллица Ελληνικά العربية 漢字文化圏 mixed слово7",
      "", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 supplementary 😀 planes", "   ", "7")).toDF("text")
    val ranges = Seq("A-Za-z", "0-9", "\\u0400-\\u04FF", "\\u0370-\\u03FF",
      "\\u0600-\\u06FF", "\\u4E00-\\u9FFF")
    val builtin = ranges.zipWithIndex.map { case (r, i) =>
      length(regexp_replace(col("text"), s"[^$r]", "")).cast("long").as(s"b$i") }
    val native = (0 until 6).map(i =>
      element_at(TextFunctions.scriptCounts(col("text")), i + 1).as(s"n$i"))
    val cmp = adversarial.select(builtin ++ native: _*)
    val bad = (0 until 6).map(i => col(s"b$i") =!= col(s"n$i")).reduce(_ || _)
    assert(cmp.filter(bad).count() === 0)
  }

  test("char_space == regexp_replace(s, '(.)', '$1 ')") {
    TextFunctions.ensureRegistered(spark)
    val texts = (docs.as[String].collect().toSeq ++ Seq(
      "", "a", "line\nbreaks\r\nhere", "𝔘ni😀code", "xy z w"))
      .toDF("text")
    val cmp = texts.select(
      TextFunctions.charSpace(col("text")).as("native"),
      regexp_replace(col("text"), "(.)", "$1 ").as("builtin"))
    assert(cmp.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("bpe_cascade == the per-rank doubled nested-replace cascade") {
    TextFunctions.ensureRegistered(spark)
    // the full shipped merge table, over fixture-like text AND
    // adversarial repeats that exercise the consumed-separator miss the
    // second replace exists for
    val merges = graft.SparkEntry.BpeMerges
    val texts = (docs.as[String].collect().toSeq ++ Seq(
      "aaaa", "abababab", "tthhee erer inin", "the thth hth tht",
      "", " ", "x", "ererer atatat", "the theory thesis in ing ings",
      "rererere ananan")).toDF("text")
    val spaced = concat(lit(" "),
      regexp_replace(replace(lower(col("text")), lit(" "), lit("_")), "(.)", "$1 "))
    val builtin = merges.foldLeft(spaced) { case (c, (a, b)) =>
      replace(replace(c, lit(s" $a $b "), lit(s" $a$b ")),
        lit(s" $a $b "), lit(s" $a$b ")) }
    val cmp = texts.select(
      TextFunctions.bpeCascade(spaced, merges).as("native"),
      builtin.as("builtin"))
    assert(cmp.filter(col("native") =!= col("builtin")).count() === 0)
    // and the token-level kernel agrees with plain Java String.replace
    val ref = (s: String) => merges.foldLeft(s) { case (acc, (a, b)) =>
      acc.replace(s" $a $b ", s" $a$b ").replace(s" $a $b ", s" $a$b ") }
    texts.as[String].collect().foreach { t =>
      val sp = " " + t.toLowerCase.replace(" ", "_").flatMap(c => s"$c ")
      val viaKernel = TextKernels.bpeCascade(
        org.apache.spark.unsafe.types.UTF8String.fromString(sp),
        merges.map(_._1).toArray, merges.map(_._2).toArray,
        merges.map(p => p._1 + p._2).toArray).toString
      assert(viaKernel === ref(sp), s"kernel diverged on <$t>")
    }
  }

  test("functions usable from plain SQL via extensions-style registration") {
    TextFunctions.ensureRegistered(spark)
    VectorFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT token_set('b a b'), cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F))")
      .collect().head
    assert(r.getSeq[String](0) === Seq("a", "b"))
    assert(r.getDouble(1) === 1.0)
  }
}
