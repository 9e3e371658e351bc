package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** The compiled byte-scan kernels must equal the regex formulations they
  * replace — on edge cases including blanks, UTF-8 multibyte chars,
  * underscores (word chars for `\b`), and punctuation-adjacent words.
  */
class TextExprsSpec extends AnyFunSuite {
  import spark.implicits._

  private val cases = Seq(
    "", " ", "\t\n", "the", " the ", "the the the", "a_the the_b",
    "the-and.of,to", "héllo wörld the", "naïve the café", "x the and",
    "THE And of", "123 the 456", "the_", "_the", "tab\tthe\nand",
    "punct!!! ??? the", "mixed héé_the the")

  test("wsTokenCount == regexp_count(\\S+) — maximal non-ws runs") {
    val df = cases.toDF("t")
    val bad = df.filter(
      TextExprs.wsTokenCount($"t") =!= regexp_count($"t", lit("\\S+"))).collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
  }

  test("alpha/punct counts == regexp_count character classes") {
    val df = cases.toDF("t")
    val bad = df.filter(
      TextExprs.alphaCount($"t") =!= regexp_count($"t", lit("[a-zA-Z]")) ||
      TextExprs.punctCount($"t") =!= regexp_count($"t", lit("[^a-zA-Z0-9\\s]"))).collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
  }

  test("winnowFingerprints matches a naive reference implementation") {
    // naive: full recompute per gram (no rolling), direct window mins
    def naive(text: String): Set[Long] = {
      val cps = text.codePoints().toArray
      val K = 5; val W = 4; val B = 131L; val M = 134217689L
      val gh: Seq[Long] =
        if (cps.length < K) Seq(cps.foldLeft(0L)((a, c) => (a * B + c) % M))
        else (0 to cps.length - K).map(i =>
          (i until i + K).foldLeft(0L)((a, j) => (a * B + cps(j)) % M))
      if (gh.length <= W) Set(gh.min)
      else (0 to gh.length - W).map(i => gh.slice(i, i + W).min).toSet
    }
    val texts = Seq("", "a", "abcd", "abcde", "abcdef",
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld naïve café — ünïcödé ≤ ∑",
      "aaaaaaaaaaaaaaa", "ab ab ab ab ab ab")
    texts.foreach { t =>
      val got = Seq(t).toDF("t")
        .select(explode(TextExprs.winnowFingerprints($"t")).as("fp"))
        .collect().map(_.getLong(0)).toSet
      assert(got == naive(t), s"mismatch on '$t'")
    }
  }

  test("bpeTokenCount == regexp_count([a-z]+|[0-9]+|[^a-z0-9\\s]) on lowered text") {
    val df = (cases ++ Seq("a1b2", "...", "é12é", "x9 9x", "ab12cd ef")).toDF("t")
    val bad = df.filter(
      TextExprs.bpeTokenCount(lower($"t")) =!=
        regexp_count(lower($"t"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))).collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
  }

  test("tokenRepStats == the explode/HOF formulation it replaced") {
    // the reference semantics, spelled in built-ins: tokens are
    // filter(split(s, "\s+"), length > 0); bigrams are exact strings
    val df = (cases ++ Seq("a a a a a b", "ab ab cd cd ab cd",
      "é é é x", "one two one two one")).toDF("t")
      .withColumn("toks", filter(split($"t", "\\s+"), x => length(x) > 0))
    val bigrams = when(size($"toks") < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice($"toks", lit(1), size($"toks") - 1),
        slice($"toks", lit(2), size($"toks") - 1),
        (a, b) => concat(a, lit(" "), b)))
    val both = df.select($"t",
      TextExprs.tokenRepStats($"t").as("st"),
      size($"toks").as("e_ntok"),
      size(array_distinct($"toks")).as("e_dtok"),
      coalesce(array_max(transform(array_distinct($"toks"),
        u => aggregate($"toks", lit(0), (acc, x) =>
          acc + when(x === u, 1).otherwise(0)))), lit(0)).as("e_maxfreq"),
      size(array_distinct(bigrams)).as("e_dbig"))
    val bad = both.filter(
      $"st".getItem(0) =!= $"e_ntok" || $"st".getItem(1) =!= $"e_dtok" ||
        $"st".getItem(2) =!= $"e_maxfreq" || $"st".getItem(3) =!= $"e_dbig")
      .collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
  }

  test("tokTf == explode(wsSplit) + per-doc groupBy count — edge cases, generated inputs, corpus") {
    // the exploded reference form, as a sorted pair list per input
    def expected(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("tok", explode(TextExprs.wsSplit($"t")))
      .groupBy($"t", $"tok").agg(count(lit(1)).as("tf"))
      .groupBy($"t")
      .agg(sort_array(collect_list(struct($"tok", $"tf"))).as("pairs"))
    def actual(df: org.apache.spark.sql.DataFrame) = df
      .select($"t", explode(TextExprs.tokTf($"t")).as("p"))
      .groupBy($"t")
      .agg(sort_array(collect_list(struct($"p.tok".as("tok"), $"p.tf".as("tf"))))
        .as("pairs"))
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val a = actual(df).withColumnRenamed("pairs", "a_pairs")
      val e = expected(df).withColumnRenamed("pairs", "e_pairs")
      val bad = a.join(e, Seq("t")).filter($"a_pairs" =!= $"e_pairs").collect()
      assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
      // zero-token inputs: the kernel must emit an EMPTY array (the
      // exploded form drops the row entirely, so the join above never
      // sees it)
      val blanks = df.filter(size(TextExprs.wsSplit($"t")) === 0 &&
        size(TextExprs.tokTf($"t")) =!= 0).collect()
      assert(blanks.isEmpty, s"non-empty tokTf on blank: ${blanks.toSeq}")
    }
    check(cases.toDF("t"))
    // adversarial generated inputs: ws runs, multibyte, repeats
    val tokc = org.scalacheck.Gen.frequency(
      (4, org.scalacheck.Gen.oneOf("a", "b", "ab", "é", "wörld", "_x", "9")),
      (3, org.scalacheck.Gen.oneOf(" ", "\t", "\n", "", "\f", "\r")),
      (1, org.scalacheck.Gen.oneOf("", "  ", "a a")))
    val strGen = for {
      n <- org.scalacheck.Gen.choose(0, 30)
      cs <- org.scalacheck.Gen.listOfN(n, tokc)
    } yield cs.mkString
    val gen = (0 until 300).map(i => strGen.pureApply(
      org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong))).distinct
    check(gen.toDF("t"))
    // the real corpus surface (what the oracle gate exercises)
    check(graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(lower(trim($"text")).as("t")).distinct())
  }

  test("wordGramHashes == xxhash64(concat_ws of split-by-space grams), empties included") {
    // the kernel runs on ALREADY-normalized text but must replicate
    // split(s, " ") exactly — including empty tokens from leading /
    // trailing / lone spaces, which concat_ws keeps as separators
    val texts = Seq("", " ", "a", "a b", "a b c", "a b c d",
      " a b c", "a b c ", "  ", "é ü ö x", "one two three four five",
      "x " + ("y " * 10).trim)
    for (n <- Seq(2, 3, 8)) {
      val df = texts.toDF("t")
        .withColumn("toks", split($"t", " "))
        .withColumn("expect",
          when(size($"toks") >= n, expr(
            s"transform(sequence(0, size(toks) - $n), i -> xxhash64(concat_ws(' ', slice(toks, i + 1, $n))))"))
            .otherwise(array().cast("array<bigint>")))
        .withColumn("got", TextExprs.wordGramHashes($"t", n))
      val bad = df.filter(not($"got" <=> $"expect")).collect()
      assert(bad.isEmpty,
        s"n=$n mismatch on: ${bad.map(_.getString(0)).toSeq}")
    }
  }

  test("wordSetCount == regexp_count(lower, \\b(?:...)\\b)") {
    val words = Seq("the", "and", "of", "to", "in")
    val df = cases.toDF("t")
    val bad = df.filter(
      TextExprs.wordSetCount($"t", words) =!=
        regexp_count(lower($"t"), lit("\\b(?:the|and|of|to|in)\\b"))).collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).toSeq}")
  }

  test("tokenSetCounts == explode(wsSplit) ⋈ candidates groupBy counts") {
    // The ta_heavy_hitters_exact pass-2 kernel must reproduce the
    // exploded-stream join form it replaced, per source: same slots,
    // same counts — including docs with zero matches, multibyte
    // whitespace neighbors, and a source absent from the index.
    val docs = Seq(
      ("s1", "the cat  and THE dog	the"),
      ("s1", ""),
      ("s1", "  catx cat CAT. ça the"),
      ("s2", "and and and"),
      ("s2", "héllo the wörld"),
      ("s3", "no candidates for this source"))
    val cands = Map(
      "s1" -> Array("cat", "the"),
      "s2" -> Array("and", "hx"))
    val idx = new TokenSetIndex(cands)
    val df = docs.toDF("source", "text")
    val got = df
      .select($"source", TextExprs.tokenSetCounts(
        $"source", lower(trim($"text")), idx).as("c"))
      .select($"source", posexplode($"c"))
      .groupBy($"source", $"pos").agg(sum($"col").as("cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val want = (for {
      (src, ts) <- cands.toSeq
      (t, i) <- ts.zipWithIndex
    } yield {
      val cnt = docs.filter(_._1 == src).map { case (_, text) =>
        text.toLowerCase.trim.split("\\s+").count(_ == t).toLong
      }.sum
      (src, i, cnt)
    }).toSet
    assert(got == want)
    // source with no candidate entry emits an empty vector -> no rows
    assert(!got.exists(_._1 == "s3"))
  }
}
