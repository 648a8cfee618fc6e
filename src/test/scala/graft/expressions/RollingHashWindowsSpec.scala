package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashWindowsSpec extends SparkSpec {
  import spark.implicits._

  // The contract substringSpans depends on: two window positions hash
  // equal IFF their k-char substrings are equal (collisions aside), with
  // char-positional indexing identical to substr. The reference pattern is
  // the composed substr form the expression replaced.
  private def patterns(texts: Seq[String], k: Int) = {
    val df = texts.zipWithIndex.toDF("text", "id")
    val rolled = df.select(col("id"),
        posexplode(RollingHashWindows(col("text"), k)))
      .select(col("id"), col("pos"), col("col").as("h"))
    val substrd = df.filter(length(col("text")) >= k)
      .select(col("id"), posexplode(
        transform(sequence(lit(1), length(col("text")) - (k - 1)),
          i => col("text").substr(i, lit(k)))))
      .select(col("id"), col("pos"), col("col").as("g"))
    (rolled.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap,
      substrd.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getString(2)).toMap)
  }

  test("window hashes partition positions exactly like the substr windows") {
    val rnd = new scala.util.Random(7)
    val texts = Seq.fill(60)(
      Seq.fill(rnd.nextInt(40))("abcab".charAt(rnd.nextInt(5))).mkString) ++
      Seq("", "ab", "aaaaaaaaaa", "abcabcabcabc")
    for (k <- Seq(2, 3, 5)) {
      val (h, g) = patterns(texts, k)
      assert(h.keySet == g.keySet, s"k=$k position sets differ")
      // same-gram => same-hash (the correctness direction), and over this
      // tiny alphabet the 64-bit hash must also separate every distinct
      // gram (a collision here would be astronomically unlucky)
      for (Seq(a, b) <- h.keySet.toSeq.combinations(2))
        assert((h(a) == h(b)) == (g(a) == g(b)),
          s"k=$k equality pattern diverges at $a vs $b")
    }
  }

  test("multi-byte chars index char-positionally, not byte-positionally") {
    // "héllo wörld" — é and ö are 2 UTF-8 bytes; substr counts chars
    val (h, g) = patterns(Seq("héllo wörld", "héllé héllé"), 4)
    assert(h.keySet == g.keySet)
    for (Seq(a, b) <- h.keySet.toSeq.combinations(2))
      assert((h(a) == h(b)) == (g(a) == g(b)), s"$a vs $b")
  }

  test("short and empty inputs yield empty arrays") {
    val out = Seq("", "a", "ab").toDF("text")
      .select(size(RollingHashWindows(col("text"), 3)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 0, 0))
  }
}
