package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Signatures

/** Property tests for the pure JVM kernels — no SparkSession needed,
  * so these run fast and cover the long-tail inputs (unicode,
  * surrogates, huge values) the table-driven specs cannot.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val mod = BigInt("2305843009213693951") // 2^61-1

  test("fingerprint64 matches the BigInt recurrence on arbitrary unicode strings") {
    checkProp(Prop.forAll(Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)) {
      s =>
        var h = BigInt(0)
        s.getBytes("UTF-8").foreach { b => h = (h * 257 + (b & 0xff)) % mod }
        Signatures.fingerprint64(s) == h.toLong
    })
  }

  test("fingerprint64 stays in [0, 2^61-1)") {
    checkProp(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val fp = Signatures.fingerprint64(s)
      fp >= 0L && fp < (1L << 61) - 1
    })
  }

  test("minhash signature component-match rate is symmetric and self is 1") {
    val tokens = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
    checkProp(Prop.forAll(tokens, tokens) { (a, b) =>
      val sa = Signatures.minhashSig(a.mkString(" "), 1)
      val sb = Signatures.minhashSig(b.mkString(" "), 1)
      val ab = sa.zip(sb).count { case (x, y) => x == y }
      val ba = sb.zip(sa).count { case (x, y) => x == y }
      ab == ba && sa.zip(sa).forall { case (x, y) => x == y }
    })
  }

  test("simhash of token-identical strings is identical; whitespace-only is null") {
    checkProp(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))) { toks =>
      val s = toks.mkString(" ")
      Signatures.simhash64(s) == Signatures.simhash64(s + " ") &&
        Signatures.simhash64("   ") == null
    })
  }

  test("shingleStrings emits distinct n-grams, all n tokens long") {
    val gen = for {
      toks <- Gen.listOf(Gen.alphaLowerStr)
      n <- Gen.choose(1, 4)
    } yield (toks, n)
    checkProp(Prop.forAll(gen) { case (toks, n) =>
      val out = Signatures.shingleStrings(toks.mkString(" "), n)
      out.distinct.sameElements(out) &&
        out.forall(_.split(" ").length == n)
    })
  }

  test("planeComponent lands in [-1, 1) for any plane/dim") {
    checkProp(Prop.forAll(Gen.choose(0, 1000), Gen.choose(0, 4096)) { (p, d) =>
      val x = graft.similarity.Ann.planeComponent(p, d)
      x >= -1.0 && x < 1.0
    })
  }
}
