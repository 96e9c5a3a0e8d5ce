package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the codegen'd token-set expressions against a
  * straightforward local model — guards the hand-written tokenize/hash/
  * min-md5 fast paths (byte-compare min, HashSet dedupe, shingle
  * StringBuilder) across arbitrary inputs including empty tokens,
  * repeated separators, mixed case and non-ASCII. Generators run with
  * fixed seeds (deterministic CI), matching FilterDslPropertySpec.
  */
class TokenSetPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val wordGen: Gen[String] =
    Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("The", "THE", "the", "a", "", "héllo", "日本", "x"))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def localItems(text: String, n: Int): Seq[String] = {
    val toks = text.toLowerCase.split(" ", -1).toSeq
    if (n == 1) toks.distinct
    else if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("token_set_size/min_md5/ids match the local model on arbitrary text") {
    for (seed <- 1L to 40L) {
      val texts = sample(Gen.listOfN(24, textGen), seed)
      val n = (seed % 3).toInt + 1
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = df.select(col("id"),
          tokenSetSize(col("text"), n).as("sz"),
          tokenSetMinMd5(col("text"), n).as("mn"),
          tokenSetIds(col("text"), n).as("ids"))
        .collect()
        .map(r => r.getLong(0) -> (r.getInt(1), Option(r.getString(2)), r.getSeq[Long](3)))
        .toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val items = localItems(t, n)
        val (sz, mn, ids) = got(i.toLong)
        assert(sz == items.length, s"size of '$t' n=$n")
        assert(mn == (if (items.isEmpty) None else Some(items.map(md5hex).min)),
          s"min-md5 of '$t' n=$n")
        assert(ids.length == items.length && ids == ids.sorted,
          s"ids of '$t' n=$n not sorted-distinct-sized")
      }
    }
  }

  test("simhash64 equals the bit-majority model over the id arrays") {
    for (seed <- 1L to 20L) {
      val texts = sample(Gen.listOfN(16, textGen), seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val rows = df.select(col("id"),
          tokenSetIds(col("text"), 1).as("ids"),
          simHash64(tokenSetIds(col("text"), 1)).as("sig"))
        .collect()
      rows.foreach { r =>
        val ids = r.getSeq[Long](1)
        var want = 0L
        (0 until 64).foreach { j =>
          val votes = ids.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
          if (votes > 0) want |= (1L << j)
        }
        assert(r.getLong(2) == want, s"sig mismatch for ids=$ids")
      }
    }
  }
}
