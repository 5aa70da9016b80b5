package graft.llm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Iterative BPE training (C64's learn loop): each round RECOUNTS pairs
  * after the merges so far — the property a single-pass top-K cannot
  * have, because a merge changes the pair distribution and creates
  * pairs (with merged symbols) round 1 never saw.
  */
class BpeTrainingSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("round-2 counts differ from round-1: merges include merged-symbol pairs") {
    import spark.implicits._
    // 'ababab': round 1 counts ab:3, ba:2 per word — a single-pass top-3
    // would stop at {ab, ba}. Iterative training merges ab→A, then the
    // REWRITTEN corpus 'AAA' offers AA (unseen in round 1), then 'BA'.
    val docs = Seq((0L, "ababab ababab"), (1L, "ababab")).toDF("doc_id", "text")
    val merges = Corpus.bpeLearn(docs, 3)
    assert(merges == Seq("ab", "AA", "BA"), merges.toString)
    // the single-pass statistic over round-1 counts cannot produce AA
    assert(!Seq("ab", "ba").contains(merges(1)),
      "second merge must come from the RECOUNTED corpus, not round-1 counts")
  }

  test("training stops when the corpus runs out of pairs") {
    import spark.implicits._
    // after ab→A, AA→B, BA→C every word is the single symbol 'C' —
    // round 4 has zero pairs and the loop must stop, not loop to k
    val docs = Seq((0L, "ababab")).toDF("doc_id", "text")
    val merges = Corpus.bpeLearn(docs, 10)
    assert(merges == Seq("ab", "AA", "BA"), merges.toString)
  }

  test("greedy replace chain encodes to the expected token counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((0L, "ababab ababab")).toDF("doc_id", "text")
    val merges = Corpus.bpeLearn(docs, 3)
    // apply the same chain the query uses: each word collapses to 'C'
    val chained = merges.zipWithIndex.foldLeft(lower(col("text"))) {
      case (c, (p, i)) => call_function("replace", c, lit(p), lit(('A' + i).toChar.toString))
    }
    val out = docs.select(chained.as("t")).collect().head.getString(0)
    assert(out == "C C", out)
  }
}
