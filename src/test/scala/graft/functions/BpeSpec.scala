package graft.functions

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Proves the Column replace-chain BPE (TextAnalysis.bpeWordTokens /
  * bpeTokenCountColumns) computes EXACT standard BPE — the iterative
  * highest-priority-merge algorithm (bpeEncodeReference) — including the
  * adversarial shapes that break naive encodings: repeat chains ("llll"
  * must merge into ll,ll, not ll,l,l — the shared-separator trap), cascades
  * (t+h→th then th+e→the), and merges whose operands are compounds.
  */
class BpeSpec extends SparkSpec {

  test("replace-chain BPE equals the standard iterative encoder on adversarial words") {
    import spark.implicits._
    val words = Seq(
      "", "a", "z", "ll", "lll", "llll", "lllll",
      "the", "then", "that", "this", "them", "these",
      "nation", "station", "attention", "international", "restoration",
      "ing", "inging", "ingingly", "understanding", "standing",
      "and", "anand", "ananan", "anderson",
      "ch", "chch", "chchch", "church", "whether", "wh",
      "tition", "titition", "thethethe", "erserser",
      "out", "you", "ou", "oom", "om", "stst", "ststst",
      "qqqq", "zzz", "xyzzy")
    val got = words.toDF("w")
      .select(col("w"), TextAnalysis.bpeWordTokens(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      val want = TextAnalysis.bpeEncodeReference(w)
      assert(got(w) == want.length.toLong,
        s"word '$w': column=${got(w)} reference=$want")
    }
  }

  test("bpeTokenCountColumns equals per-word reference sums on real documents") {
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id").cast("long"), col("text")).limit(80)
    val got = docs
      .select(col("doc_id") +: TextAnalysis.bpeTokenCountColumns(col("text")): _*)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val ws = Option(r.getString(1)).getOrElse("").trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty)
      val want = (
        ws.length.toLong,
        ws.map(w => TextAnalysis.bpeEncodeReference(w.replaceAll("[^a-z]", "")).length.toLong).sum)
      assert(got(id) == want, s"doc $id: column=${got(id)} reference=$want")
    }
  }

  test("unicode adversaries: Spark lower+strip agrees with the reference path (casing expansions, combining marks, CJK)") {
    import spark.implicits._
    // words whose lowercasing is non-trivial: U+0130 expands to i +
    // combining dot (the combining mark must be stripped by [^a-z], keeping
    // the i), ß stays ß (stripped), CJK strips entirely, emoji strips —
    // the column path and the JVM reference must agree on the SURVIVING
    // a-z content and hence the token count
    val words = Seq("İstanbul", "Straße", "ISTANBUL", "Σίσυφος", "你好世界",
      "naïve", "héllo", "🙂emoji", "ABCdef", "ǅungla")
    val got = words.toDF("raw")
      .select(col("raw"),
        TextAnalysis.bpeWordTokens(regexp_replace(lower(col("raw")), "[^a-z]", "")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      val az = w.toLowerCase.replaceAll("[^a-z]", "")
      val want = TextAnalysis.bpeEncodeReference(az)
      assert(got(w) == want.length.toLong,
        s"word '$w' (az='$az'): column=${got(w)} reference=$want")
    }
  }

  test("randomized sweep: 500 seeded words over a merge-heavy alphabet, chain == reference") {
    import spark.implicits._
    // biased toward the merge alphabet so cascades and repeat chains occur
    // often; seeded, so a failure reproduces exactly
    val rnd = new scala.util.Random(42)
    val alphabet = "tttheeeiinnaaoorrsslgduucmw" + ('a' to 'z').mkString
    val words = (0 until 500).map { _ =>
      val len = rnd.nextInt(25)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val got = words.toDF("w")
      .select(col("w"), TextAnalysis.bpeWordTokens(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      val want = TextAnalysis.bpeEncodeReference(w)
      assert(got(w) == want.length.toLong, s"word '$w': column=${got(w)} reference=$want")
    }
  }

  test("the merges table is well-ordered and each merge genuinely fires on some input") {
    // every merge must be REACHABLE — a merge that never fires is dead
    // weight in the generated SQL and a silent sign the ordering is wrong
    TextAnalysis.bpeMerges.foreach { case (a, b) =>
      val probe = a + b
      val enc = TextAnalysis.bpeEncodeReference(probe)
      assert(enc.contains(a + b) || enc.length < probe.length,
        s"merge ($a,$b) never fires, even on its own concatenation '$probe' → $enc")
    }
  }
}
