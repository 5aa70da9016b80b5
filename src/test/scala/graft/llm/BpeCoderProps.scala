package graft.llm

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.BpeCoder

/** Property pins for the C68 BPE coder — the claims the suite asserts on
  * examples, held universally over random merge chains and words:
  *
  * 1. greedy lowest-rank encode ≡ applying the merge table SEQUENTIALLY
  *    by rank (each merge as an exhaustive left-to-right non-overlapping
  *    rewrite) — the equivalence that lets C68 share C64's replace-chain
  *    oracle. It holds because merge r's pair contains only symbols
  *    minted before r, so applying a later merge can never re-open an
  *    earlier one.
  * 2. expanding every output token reproduces the input exactly
  *    (tokenization is lossless).
  * 3. the output contains no adjacent pair present in the merge table
  *    (encoding runs to a fixed point).
  */
object BpeCoderProps extends Properties("BpeCoder") {

  private val baseAlphabet: Seq[Int] = "ab01".map(_.toInt)

  /** A VALID random merge chain: merge r pairs any two symbols existing
    * before r (base symbols or earlier merges) — the invariant the real
    * trainer guarantees.
    */
  private val genChain: Gen[Seq[(Int, Int)]] =
    Gen.choose(0, 60).flatMap { k =>
      (0 until k).foldLeft(Gen.const(Vector.empty[(Int, Int)])) { (acc, r) =>
        acc.flatMap { chain =>
          val avail = baseAlphabet ++ (0 until r).map(BpeCoder.MergeBase + _)
          // distinct pairs only — the real trainer can never re-merge an
          // eliminated pair, and a duplicate would make the rank map
          // ambiguous; (4+r)^2 >> r, so free pairs always exist
          (for {
            a <- Gen.oneOf(avail)
            b <- Gen.oneOf(avail)
          } yield (a, b)).retryUntil(p => !chain.contains(p))
            .map(chain :+ _)
        }
      }
    }

  private val genWord: Gen[Array[Int]] =
    Gen.choose(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(baseAlphabet)).map(_.toArray))

  /** Sequential-by-rank application via String.replace on the char
    * rendering — the exact semantics of C64's replace chain (valid while
    * every id is one BMP char, true for K <= 60 here).
    */
  private def sequentialEncode(word: Array[Int], merges: Seq[(Int, Int)]): Array[Int] = {
    var w = new String(word.map(_.toChar))
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      w = w.replace(s"${a.toChar}${b.toChar}", (BpeCoder.MergeBase + r).toChar.toString)
    }
    w.toCharArray.map(_.toInt)
  }

  property("greedy rank encode == sequential replace chain") =
    Prop.forAll(genChain, genWord) { (merges, word) =>
      val rank = BpeCoder.rankMap(merges)
      BpeCoder.encode(word, rank).toSeq == sequentialEncode(word, merges).toSeq
    }

  property("expanding the tokens reproduces the word") =
    Prop.forAll(genChain, genWord) { (merges, word) =>
      val rank = BpeCoder.rankMap(merges)
      val enc = BpeCoder.encode(word, rank)
      enc.map(BpeCoder.tokenString(_, merges)).mkString ==
        new String(word.map(_.toChar))
    }

  property("no applicable merge survives in the output") =
    Prop.forAll(genChain, genWord) { (merges, word) =>
      val rank = BpeCoder.rankMap(merges)
      val enc = BpeCoder.encode(word, rank)
      enc.toSeq.sliding(2).forall {
        case Seq(a, b) => rank.get(BpeCoder.pack(a, b)) == null
        case _ => true
      }
    }
}
