package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Text

/** Round-9 chaos gates (round-8 verdict item 7): the iterative/collapse
  * machinery under planted pathological fixtures the random dirty corpora
  * never produce.
  *
  *  - A single GIANT exact-dup group (3,000 verbatim copies): `withRepOf`
  *    must shape it as one fat window PARTITION (never one fat collected
  *    row), the rep-level pair machinery must see 1 representative, and
  *    the member expansion must recover the full combinatorial pair count
  *    exactly — C(3000,2) within plus m_A·m_B across. The counts are
  *    hand-derived (a brute-force twin would itself be the 4.5 M-pair
  *    blow-up the collapse exists to avoid).
  *  - A 64-doc near-dup CHAIN (sliding 10-token windows: consecutive docs
  *    J = 9/11 ≥ 0.8, skip-pairs 8/12 < 0.8) = a path graph of diameter
  *    63. The CC loop's min-label + pointer-doubling must converge well
  *    inside its iter < 50 cap (≈ log₂ 63 rounds) and label the whole
  *    chain by its min id — the planted evidence that the cap is
  *    headroom, not a silent truncation.
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: DataFrame): Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)

  private def docsTable(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  // ---- giant dup group ------------------------------------------------------

  /** 3,000 copies of A (10 tokens), 5 copies of B = A + one token
    * (J(A,B) = 10/11 ≥ 0.8), 3 singletons with disjoint vocab. */
  private def giantGroupDocs: Seq[(Long, String, String, String)] = {
    val a = (0 until 10).map(i => f"t$i%02d").mkString(" ")
    val b = a + " t10"
    val copies = (0L until 3000L).map(id => (id, a, "en", "web"))
    val nears = (3000L until 3005L).map(id => (id, b, "en", "web"))
    val lone = (3005L until 3008L).map(id =>
      (id, Seq(s"u${id}a", s"u${id}b", s"u${id}c").mkString(" "), "en", "web"))
    copies ++ nears ++ lone
  }

  test("giant dup group: one rep per group, exact combinatorial pair expansion") {
    val docs = Text.docSetsOf(docsTable(giantGroupDocs))
    val withRep = Text.withRepOf(docs)
    // the 3,008-doc corpus collapses to 3 groups + nothing fat on the driver
    assert(rows(withRep.select(col("rep")).distinct().orderBy("rep"))
      === Seq(Seq(0L), Seq(3000L), Seq(3005L), Seq(3006L), Seq(3007L)))
    // expansion arithmetic at giant m: C(3000,2) + C(5,2) + 3000·5,
    // counted distributed (never collected)
    val expected = 3000L * 2999L / 2L + 5L * 4L / 2L + 3000L * 5L
    assert(Text.neardupPairsOf(docs).count() === expected)
    // containment: B contains A fully (C = 10/10) and dup pairs are C = 1
    assert(Text.neardupContainmentOf(docs).count() === expected)
  }

  test("giant dup group: dedup components labels the merged cluster by min id") {
    val out = Text.dedupComponentsOf(docsTable(giantGroupDocs))
    assert(rows(out) === Seq(Seq(0L, 3005L, 3004L)))
  }

  // ---- long-diameter near-dup chain ------------------------------------------

  /** doc i = tokens [i, i+10) over a 73-token line: J(i, i+1) = 9/11 ≥ 0.8,
    * J(i, i+2) = 8/12 < 0.8 — a path of diameter 63, no exact dups. */
  private def chainDocs: Seq[(Long, String, String, String)] =
    (0L until 64L).map { i =>
      val text = (i until i + 10L).map(j => f"c$j%03d").mkString(" ")
      (i, text, "en", "web")
    }

  test("near-dup chain: CC converges across diameter 63 inside the iteration cap") {
    val out = Text.dedupComponentsOf(docsTable(chainDocs))
    assert(rows(out) === Seq(Seq(0L, 64L, 63L)))
  }

  test("near-dup chain: pair table is exactly the 63 consecutive edges") {
    val pairs = Text.neardupPairsOf(Text.docSetsOf(docsTable(chainDocs)))
    assert(rows(pairs.orderBy("d1"))
      === (0L until 63L).map(i => Seq[Any]("en", "web", i, i + 1L, 0.8182)))
  }
}
