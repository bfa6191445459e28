package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Single-pass JVM signature kernels for dedup.
  *
  * These exist because Spark's higher-order functions
  * (transform/filter/aggregate) evaluate INTERPRETED — a nested-HOF
  * MinHash recomputes the shingle chain per hash function with a
  * UTF8String copy per element (measured: ~1300 s CPU for 5k docs).
  * Here each document is one tight primitive loop: tokenize once,
  * hash token windows arithmetically (no shingle strings are ever
  * built), then derive the 64 minima via xorshift remixes. The UDF
  * boundary costs one row-serialization; the interior is allocation-
  * free per shingle.
  *
  * Hash building blocks are the public-domain splitmix64 / xorshift64
  * mixers and FNV-1a.
  */
/** One content-defined chunk: byte offset, byte length, polynomial
  * hash of the chunk bytes. Top-level so the UDF encoder's generated
  * code can construct it.
  */
case class CdcChunk(start: Int, len: Int, hash: Long)

object Signatures {

  val NumHashes = 64

  /** Per-index xor seeds, fixed by a splitmix64 chain from seed 42 —
    * deterministic across runs and executors with no RNG state.
    */
  private[graft] val seeds: Array[Long] = {
    var x = 42L
    Array.fill(NumHashes) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  @inline private def xorshift(x0: Long): Long = {
    var x = x0
    x ^= x << 13
    x ^= x >>> 7
    x ^= x << 17
    x
  }

  /** FNV-1a 64 over the chars + splitmix finalizer for avalanche. */
  @inline private[graft] def hashToken(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Reference tokenizer (mapreduce.c:110-130), allocation-light. */
  private[graft] def tokenHashes(text: String): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (sb.length > 0) { out += hashToken(sb.toString); sb.setLength(0) }
      } else {
        val c = text.charAt(i)
        if (c >= 'a' && c <= 'z') sb.append(c)
        else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      }
      i += 1
    }
    out.toArray
  }

  /** Distinct hashes of n-token windows, combined arithmetically. */
  private[graft] def shingleHashes(toks: Array[Long], n: Int): Array[Long] = {
    if (toks.length < n) return Array.emptyLongArray
    val set = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i + n <= toks.length) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) {
        var z = h ^ toks(i + j)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        h = z ^ (z >>> 27)
        j += 1
      }
      if (set.add(h)) out += h
      i += 1
    }
    out.toArray
  }

  /** 64-component MinHash signature; null for docs with no shingle. */
  def minhashSig(text: String, n: Int): Array[Long] = {
    val sh = shingleHashes(tokenHashes(text), n)
    if (sh.isEmpty) return null
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var si = 0
    while (si < sh.length) {
      val h = sh(si)
      var i = 0
      while (i < NumHashes) {
        val v = xorshift(h ^ seeds(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      si += 1
    }
    sig
  }

  /** 64-bit SimHash (term-frequency-weighted bit votes). */
  def simhash64(text: String): java.lang.Long = {
    val toks = tokenHashes(text)
    if (toks.isEmpty) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = toks(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Distinct word-n-gram shingles as strings (for the Jaccard join,
    * which must match the SQL oracle's shingle construction).
    */
  def shingleStrings(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.split(' ')
      .map(_.filter(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    toks.sliding(n).map(_.mkString(" ")).toArray.distinct
  }

  /** Reference-tokenizer tokens as strings (same semantics as
    * TextFunctions.refTokens, one JVM pass instead of interpreted
    * HOFs).
    */
  def refTokenStrings(text: String): Array[String] = {
    if (text == null) return Array.empty
    text.split(' ')
      .map(_.filter(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)
  }

  /** 2^61-1 (Mersenne prime) — modulus of the rolling fingerprint. */
  val FpMod: Long = (1L << 61) - 1

  /** (a*b) mod 2^61-1 without BigInt: 128-bit product via
    * Math.multiplyHigh, then the Mersenne fold 2^64 ≡ 8 (mod 2^61-1).
    * Valid for 0 <= a,b < 2^61 (so hi < 2^58 and no step overflows a
    * signed long).
    */
  @inline private def mulmod61(a: Long, b: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, b)
    val lo = a * b
    // x = hi*2^64 + lo ≡ (x >> 61) + (x & M): hi<<3 has clear low bits,
    // so OR-ing in lo's top 3 bits reassembles x>>61 exactly
    var r = ((hi << 3) | (lo >>> 61)) + (lo & FpMod)
    if (r >= FpMod) r -= FpMod
    if (r >= FpMod) r -= FpMod // sum can reach 2*M after one fold
    r
  }

  /** Polynomial rolling hash (Rabin–Karp, base 257) over the UTF-8
    * bytes, mod 2^61-1 — bit-identical to the BigInt formulation it
    * replaced ((h*257 + byte) % m per byte), one allocation-free pass.
    */
  def fingerprint64(s: String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulmod61(h, 257L) + (bytes(i) & 0xff)
      if (h >= FpMod) h -= FpMod
      i += 1
    }
    h
  }

  /** Content-defined chunking (the FastCDC/rsync shape) over the
    * document's UTF-8 bytes: a cut lands where the Rabin–Karp hash of
    * the trailing `w`-byte window (same base-257 mod-2^61-1 family as
    * [[fingerprint64]], so the oracle replays it in HUGEINT SQL) is
    * ≡ 0 mod `div`, bounded to [minLen, maxLen] per chunk (the max
    * bound forces a cut — standard CDC; content-definedness is lost
    * only at forced cuts). Because cut positions depend ONLY on local
    * content, two documents sharing a long byte run cut it at the
    * SAME internal positions regardless of where the run sits — so
    * chunk-level exact dedup detects shared substrings without any
    * alignment search (the property suffix-array substring dedup
    * buys with a global sort; here it costs one narrow pass).
    * Each chunk carries its polynomial hash of the full chunk bytes:
    * (P(e) − P(s)·257^(e−s)) mod 2^61−1 from one prefix-hash array.
    */
  def cdcChunks(text: String, w: Int = 16, div: Long = 32,
      minLen: Int = 24, maxLen: Int = 128): Array[CdcChunk] = {
    require(minLen > w && maxLen >= minLen && div > 0,
      s"cdcChunks needs minLen > w (window must fit before the first cut), " +
        s"got w=$w minLen=$minLen maxLen=$maxLen div=$div")
    if (text == null || text.isEmpty) return Array.empty
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length
    val pref = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      var h = mulmod61(pref(i), 257L) + (bytes(i) & 0xff)
      if (h >= FpMod) h -= FpMod
      pref(i + 1) = h
      i += 1
    }
    val pow = new Array[Long](maxLen + 1)
    pow(0) = 1L
    i = 1
    while (i <= maxLen) { pow(i) = mulmod61(pow(i - 1), 257L); i += 1 }
    def rangeHash(s: Int, e: Int): Long = {
      var r = pref(e) - mulmod61(pref(s), pow(e - s))
      if (r < 0) r += FpMod
      r
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[CdcChunk]
    var c0 = 0
    while (c0 < n) {
      val lo = c0 + minLen
      val hi = math.min(c0 + maxLen, n)
      var cut = hi
      if (lo < hi) {
        var c = lo
        var found = false
        // minLen > w by contract, so the window [c-w, c) always exists
        while (!found && c <= hi) {
          if (rangeHash(c - w, c) % div == 0L) { cut = c; found = true }
          c += 1
        }
      }
      out += CdcChunk(c0, cut - c0, rangeHash(c0, cut))
      c0 = cut
    }
    out.toArray
  }

  /** splitmix64 of a long key — the deterministic per-row uniform for
    * sampling operators (same finalizer as hashToken; replayed in
    * oracle SQL with HUGEINT arithmetic).
    */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // Column wrappers for the heavy text kernels. asNondeterministic is
  // a LIE in the narrow sense — every kernel is a pure function — told
  // to the OPTIMIZER for a measured reason: Catalyst rewrites inferred
  // join-key constraints (isnotnull/size>0 on a downstream join or
  // Generate column) through the kernel's Project alias and pushes
  // them below the fan-out repartition into the 1-2-split SCAN stage,
  // where the kernel then re-runs per row, serially, per constraint
  // (dedup_ngram_jaccard at sf1: 2 extra full-corpus shingle passes in
  // two-task stages — ProbeStages/ProbeNgram). Nondeterministic
  // expressions cannot be pushed through, so the kernel runs exactly
  // once, post-fan-out, at full width. Results are bit-identical; the
  // flag only constrains WHERE the optimizer may replicate the call.
  val refTokensUdf = udf((text: String) => refTokenStrings(text)).asNondeterministic()
  def refTokensFast(text: Column): Column = refTokensUdf(text)
  def minhashSigUdf(n: Int) = udf((text: String) => minhashSig(text, n)).asNondeterministic()
  val simhashUdf = udf((text: String) => simhash64(text)).asNondeterministic()
  def shinglesUdf(n: Int) = udf((text: String) => shingleStrings(text, n)).asNondeterministic()

  val tokenHashesUdf = udf((text: String) => tokenHashes(text)).asNondeterministic()
  val cdcChunksUdf = udf((text: String) => cdcChunks(text)).asNondeterministic()

  val fingerprintUdf = udf((text: String) => fingerprint64(text)).asNondeterministic()
  val splitmixUdf = udf((x: Long) => splitmix64(x))

  def minhashCol(text: Column, n: Int = 3): Column = minhashSigUdf(n)(text)
  def simhashCol(text: Column): Column = simhashUdf(text)
  def shinglesCol(text: Column, n: Int = 3): Column = shinglesUdf(n)(text)
  def fingerprintCol(text: Column): Column = fingerprintUdf(text)
}
