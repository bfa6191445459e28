package graft

import scala.io.Source
import graft.core.MapReduce

/** Byte-for-byte parity with the reference's own committed outputs:
  * word count over /root/reference/inputdir must equal
  * outputdir/output.txt (incl. the do_merge sort order), and number
  * sort over number_sort_input must equal sort_outputdir/output.txt.
  */
class ReferenceParitySpec extends SparkSpec {

  private def lines(p: String): Seq[String] = {
    val s = Source.fromFile(p)
    try s.getLines().toIndexedSeq finally s.close()
  }

  test("wordCount reproduces the reference output.txt exactly") {
    val got = MapReduce.wordCount(spark, "/root/reference/inputdir")
      .collect().map { case (w, c) => s"$w,$c" }.toSeq
    val want = lines("/root/reference/outputdir/output.txt").filter(_.nonEmpty)
    assert(got.size === want.size)
    // full equality including order (count desc, word desc)
    assert(got === want)
  }

  test("numberSort reproduces the reference sorted output exactly") {
    val got = MapReduce.numberSort(spark, "/root/reference/number_sort_input")
      .collect().toSeq
    val want = lines("/root/reference/sort_outputdir/output.txt")
      .filter(_.nonEmpty).map(_.trim.toInt)
    assert(got.size === want.size)
    assert(got === want)
  }

  test("referenceTokens matches the C tokenizer semantics") {
    assert(MapReduce.referenceTokens("Hello,  World don't 42x end.") ===
      Seq("hello", "world", "dont", "x", "end"))
    assert(MapReduce.referenceTokens("   ") === Seq.empty)
    assert(MapReduce.referenceTokens("a") === Seq("a"))
  }
}
