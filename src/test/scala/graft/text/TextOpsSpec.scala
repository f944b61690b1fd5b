package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles empties, runs of whitespace, trim") {
    val df = Seq("a b  c", "  x ", "", "   ").toDF("t")
    val got = df.select(TextOps.tokenCount($"t")).as[Int].collect().toSeq
    assert(got == Seq(3, 1, 0, 0))
  }

  test("subwordCount splits words, digits and punctuation") {
    val df = Seq("hello world42 v2.0!").toDF("t")
    // hello | world | 42 | v | 2 | . | 0 | !
    assert(df.select(TextOps.subwordCount($"t")).as[Int].head() == 8)
  }

  test("punctRatio and stopwordRatio") {
    val df = Seq("the cat, the hat!").toDF("t")
    val pr = df.select(TextOps.punctRatio($"t")).as[Double].head()
    assert(math.abs(pr - 2.0 / 17) < 1e-12)
    val sr = df.select(TextOps.stopwordRatio($"t", Seq("the"))).as[Double].head()
    assert(sr == 0.5) // 2 of 4 tokens ("cat," with comma doesn't match)
  }

  test("langId votes by stopwords with CJK short-circuit") {
    val df = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist nicht da",
      "le chat et la maison est dans les arbres",
      "el perro y el gato es una casa",
      "spark 你好 world",
      "zzz qqq www").toDF("t")
    val got = df.select(TextOps.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "es", "zh", "unknown"))
  }

  test("qualityScore in [0,1], higher for clean prose") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the hills in a day that is long and warm for everyone",
      "!!! ??? ### $$$ %%%").toDF("t")
    val got = df.select(TextOps.qualityScore($"t")).as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("staged withLangId/withQualityScore equal the scalar forms") {
    val df = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist nicht da",
      "le chat et la maison est dans les arbres",
      "el perro y el gato es una casa",
      "spark 你好 world", "zzz qqq www", "",
      "the quick brown fox! jumps, over 12 lazy dogs.").toDF("t")
    val scalar = df.select(TextOps.langId($"t").as("l"),
      TextOps.qualityScore($"t").as("q")).collect().toSeq
    val staged = TextOps.withQualityScore(
      TextOps.withLangId(df, "t", "l"), "t", "q")
      .select($"l", $"q").collect().toSeq
    assert(scalar == staged)
  }

  test("redactPii replaces emails, SSNs, IPs and phone runs in order") {
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "ssn is 123-45-6789 ok",
      "host 192.168.254.1 up",
      "call +1 555 867 5309 today",
      "clean text with no pii at all").toDF("t")
    val got = df.select(TextOps.redactPii($"t")).as[String].collect()
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "ssn is <SSN> ok")
    assert(got(2) == "host <IP> up")
    assert(got(3) == "call <PHONE> today")
    assert(got(4) == "clean text with no pii at all")
  }

  test("NFC normalization composes combining marks; ASCII passes through untouched") {
    val decomposed = "café"     // e + COMBINING ACUTE
    val composed = "café"        // precomposed é
    val df = Seq(decomposed, composed, "plain ascii").toDF("t")
    val got = df.select(graft.expressions.NfcNormalizeExpr.nfc($"t")).as[String].collect()
    assert(got(0) == composed)
    assert(got(1) == composed)
    assert(got(2) == "plain ascii")
    // normalization makes visually identical strings byte-identical → dedup-safe
    assert(got(0).length == 4 && decomposed.length == 5)
  }

  test("fingerprint is stable and shared-substring-sensitive") {
    val base = "x" * 5 + ("shared rolling window content here" * 2)
    val df = Seq(base, base, "completely different text body entirely").toDF("t")
    val got = df.select(TextOps.fingerprint($"t")).as[Long].collect()
    assert(got(0) == got(1))
    assert(got(0) != got(2))
  }

  test("fingerprintMd5 matches a JVM-computed min-md5 over shingles") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val long = "the quick brown fox jumps over the lazy dog"
    val short = "tiny doc" // < 16 chars → whole-document digest
    val df = Seq(long, short).toDF("t")
    val got = df.select(TextOps.fingerprintMd5($"t")).as[String].collect()
    val expectLong = (1 to long.length - 15).map(i => md5hex(long.substring(i - 1, i + 15))).min
    assert(got(0) == expectLong)
    assert(got(1) == md5hex(short))
  }

  test("withReadability: hand-computed counts and the Flesch tree") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),   // 6 words, 2 sentences
      (2L, "a"),                           // 1 word, no terminator → 1 sent
      (3L, "")).toDF("doc_id", "text")     // 0 words → NULL flesch
    val r = TextOps.withReadability(df, "text")
      .select("doc_id", "words", "sentences", "syllables", "flesch")
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t).toMap
    val d1 = r(1L)
    assert(d1._2 == 6L && d1._3 == 2L)
    // vowel groups: e|a|a|e|o|a = 6 → max(6, 6) = 6
    assert(d1._4 == 6L)
    val expected = BigDecimal(206.835 - 1.015 * (6.0 / 2.0) - 84.6 * 1.0)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d1._5.contains(expected))
    assert(r(2L)._2 == 1L && r(2L)._3 == 1L && r(2L)._4 == 1L)
    assert(r(3L)._2 == 0L && r(3L)._5.isEmpty)
  }

  test("gopherRules: each rule binds on its own hand case") {
    val df = Seq(
      (1L, "the cat sat be on that mat with and toys of dogs"), // all pass
      (2L, "- the cat\n- be that\n- with dog"), // every line a bullet
      (3L, "# # # word the be"),                // symbols + non-alpha words
      (4L, "aa aa"),                            // too short, no stops
      (5L, "a b c d e f the be of and with that")) // mean word len < 3
      .toDF("doc_id", "text")
    val r = TextOps.gopherRules(df, "text", minWords = 3L)
      .select("doc_id", "n_words", "stop_hits", "r_words", "r_meanlen",
        "r_symbol", "r_bullet", "r_alpha", "r_stops", "keep")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean,
        Boolean, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    val d1 = r(1L)
    assert(d1._2 == 12L && d1._3 == 6L && d1._10, d1.toString) // keep
    assert(!r(2L)._7 && r(2L)._4, r(2L).toString)     // r_bullet fails alone
    assert(!r(3L)._6 && !r(3L)._8, r(3L).toString)    // r_symbol + r_alpha
    assert(!r(4L)._4 && !r(4L)._9, r(4L).toString)    // r_words + r_stops
    assert(!r(5L)._5 && r(5L)._9, r(5L).toString)     // r_meanlen fails alone
    assert(Seq(2L, 3L, 4L, 5L).forall(id => !r(id)._10))
  }

  test("gopherRules mean_wl is the exact rounded token-length mean") {
    val df = Seq((1L, "ab abcd")).toDF("doc_id", "text")
    val mwl = TextOps.gopherRules(df, "text", minWords = 1L)
      .select("mean_wl").as[Option[Double]].head()
    assert(mwl.contains(3.0)) // (2 + 4) / 2
  }
}
