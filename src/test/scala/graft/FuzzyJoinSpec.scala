package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** The fuzzy join's same-name clique expansion is quadratic in the
  * copy count of a single name — inherent to the all-pairs contract
  * (k copies ARE C(k,2) pairs). The supported contract is
  * exact-dedup-first (documented at the sameName join): this spec
  * pins BOTH sides of that statement on a mass-duplicate corpus —
  * the raw quadratic is real, and exact dedup bounds the whole
  * operator to one row per surviving name.
  */
class FuzzyJoinSpec extends SparkSpec {

  private val Copies = 200

  // 200 identical copies of one name + a near-miss (dist 1) + a far
  // name; ids are distinct so exact dedup has real work to do
  private def corpus = {
    val s = spark
    import s.implicits._
    val dups = (1 to Copies).map(i => (i.toLong, "promo steel widget"))
    val rest = Seq((9001L, "promo steel widgat"), (9002L, "aluminium bolt"))
    (dups ++ rest).toDF("p_partkey", "p_name")
  }

  test("mass-duplicate name: raw pair volume is C(k,2), post-dedup it is linear") {
    val raw = FuzzyJoin.fuzzyPairs(corpus, tau = 2)
    val rawSame = raw.filter(col("dist") === 0L).count()
    assert(rawSame === Copies.toLong * (Copies - 1) / 2,
      s"raw same-name clique is C($Copies,2) — the documented quadratic")
    // exact-dedup-first: one survivor per name (min id — the
    // dedup_golden arg-max shape), then the fuzzy join
    val surviving = corpus.groupBy("p_name").agg(min("p_partkey").as("p_partkey"))
      .select("p_partkey", "p_name")
    val deduped = FuzzyJoin.fuzzyPairs(surviving, tau = 2)
    assert(deduped.filter(col("dist") === 0L).count() === 0L,
      "no same-name pairs after exact dedup")
    val cross = deduped.collect()
    assert(cross.length === 1, "exactly the one near-miss pair survives")
    assert(cross.head.getLong(2) === 1L, "at edit distance 1")
    // total output bounded by near-dup structure, not copy count:
    // 3 distinct names -> 1 pair, vs 19,901 raw
    assert(deduped.count() < Copies.toLong)
  }
}
