package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train reproduces the hand-computed merge sequence and stops when dry") {
    // dict: abab ×3, ab ×2 → pair (a,b) = 8, (b,a) = 3 → merge1 (a,b);
    // then (ab,ab) = 3 → merge2; then nothing reaches minCount → stop
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("ab")).toDF("text")
    val wf = Bpe.wordFrequencies(docs, "text")
    val merges = Bpe.train(wf, numMerges = 5)
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
  }

  test("tie-break is deterministic: equal counts pick the lexicographically smaller pair") {
    // "xy" ×2 and "ab" ×2: pairs (x,y)=2, (a,b)=2 → (a,b) first
    val docs = (Seq.fill(2)("xy") ++ Seq.fill(2)("ab")).toDF("text")
    val merges = Bpe.train(Bpe.wordFrequencies(docs, "text"), numMerges = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("replace-all on the two-space format IS the leftmost-greedy BPE merge") {
    // the classic run case: aaa + merge (a,a) must give [aa, a], not [a, aa]
    // — and adjacent pair occurrences (abab) must BOTH merge in one pass
    val words = Seq("aaa", "abab", "ababa", "b").toDF("w")
    val got = words
      .select(col("w"), trim(Bpe.applyMerges(Bpe.seed(col("w")),
        Seq(("a", "a"), ("a", "b")))).as("s"))
      .as[(String, String)].collect().toMap
    assert(got("aaa") == "aa  a")      // greedy leftmost, not a, aa
    assert(got("abab") == "ab  ab")    // both occurrences in one pass
    assert(got("ababa") == "ab  ab  a")
    assert(got("b") == "b")
  }

  test("distributed encode equals a driver-side greedy reimplementation") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    def driverEncode(w: String): Seq[String] = {
      var syms = w.map(_.toString).toBuffer
      merges.foreach { case (a, b) =>
        var j = 0
        while (j + 1 < syms.length) {
          if (syms(j) == a && syms(j + 1) == b) {
            syms(j) = a + b; syms.remove(j + 1)
          }
          j += 1
        }
      }
      syms.toSeq
    }
    val corpus = Seq("lowest", "newest", "widest", "low", "slow",
      "test", "estes", "wlowest")
    val docs = corpus.toDF("text")
    val wf = Bpe.wordFrequencies(docs, "text")
    val got = Bpe.encodeCounts(wf, merges)
      .as[(String, Long)].collect().toMap
    val expected = corpus.flatMap(driverEncode)
      .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    assert(got == expected)
  }

  test("wordFrequencies filters charset, lowercases, and caps word length") {
    val docs = Seq("The THE the x9y " + ("a" * 25) + " ok!").toDF("text")
    val wf = Bpe.wordFrequencies(docs, "text")
      .as[(String, Long)].collect().toMap
    // "the" ×3 survives lowercased; x9y (digit), 25-char run (len cap) and
    // "ok!" (punct) are dropped
    assert(wf == Map("the" -> 3L))
  }
}
