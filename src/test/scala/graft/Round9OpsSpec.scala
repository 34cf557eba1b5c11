package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, MLDeterministic, Text, Vectors}
import graft.core.Tables

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

  // ---- round-9 full-sf3-bench collapse twins --------------------------------
  // Each collapsed op is pinned against its VERBATIM uncollapsed pipeline on a
  // planted dirty corpus (heavy duplicate groups, tied fields, scattered ids)
  // the graded fixtures never produce.

  test("fsPatterns counting == verbatim blocked pair join") {
    import spark.implicits._
    // one 200-row heavy block (the quadratic shape), a second block with
    // different field-collision structure, an all-agree block, a singleton
    val c = ((0L until 200L).map(i => (i, 1L, s"S${i % 3}", i % 4, i % 5, 7L)) ++
        (200L until 260L).map(i => (i, 2L, s"S${i % 2}", i % 7, i % 3, 7L)) ++
        (260L until 280L).map(i => (i, 1L, "S0", 0L, 0L, 8L)) :+
        ((280L, 9L, "S9", 1L, 1L, 9L)))
      .toDF("cust", "nat", "seg", "f2", "f3", "bb")
    val l = c.select(col("cust").as("cust1"), col("nat"), col("bb"),
      col("seg").as("seg1"), col("f2").as("f21"), col("f3").as("f31"))
    val r = c.select(col("cust").as("cust2"), col("nat"), col("bb"),
      col("seg").as("seg2"), col("f2").as("f22"), col("f3").as("f32"))
    val observed = l.join(r, Seq("nat", "bb"))
      .filter(col("cust1") < col("cust2"))
      .select(
        when(col("seg1") === col("seg2"), 1L).otherwise(0L).as("a1"),
        when(col("f21") === col("f22"), 1L).otherwise(0L).as("a2"),
        when(col("f31") === col("f32"), 1L).otherwise(0L).as("a3"))
      .groupBy(col("a1"), col("a2"), col("a3"))
      .agg(count(lit(1)).as("n_pairs"))
    val lattice = spark.range(1)
      .select(explode(array(lit(0L), lit(1L))).as("a1"))
      .select(col("a1"), explode(array(lit(0L), lit(1L))).as("a2"))
      .select(col("a1"), col("a2"), explode(array(lit(0L), lit(1L))).as("a3"))
    val twin = lattice.join(observed, Seq("a1", "a2", "a3"), "left_outer")
      .select(col("a1"), col("a2"), col("a3"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
    assert(rows(MLDeterministic.fsPatternsOf(c).orderBy("a1", "a2", "a3"))
      === rows(twin.orderBy("a1", "a2", "a3")))
  }

  test("uplift rank decomposition == verbatim user-pair theta join") {
    import spark.implicits._
    // 300 users, ids scattered (i·7919 is injective), 9-way activity ties
    val u = (0 until 300)
      .map(i => (i.toLong * 7919L, (i % 9 + 1).toLong, (i % 3).toLong))
      .toDF("user_id", "act", "np")
      .select(col("user_id"), col("act"), col("np"),
        (col("user_id") % 2).as("arm"))
    val ranked = u.as("a")
      .join(u.select(col("user_id").as("u2"), col("act").as("act2")).as("b"),
        col("act2") < col("act") ||
          (col("act2") === col("act") && col("u2") < col("user_id")), "left_outer")
      .groupBy(col("a.user_id").as("user_id"), col("a.act").as("act"),
        col("a.np").as("np"), col("a.arm").as("arm"))
      .agg(count(col("u2")).as("rk"))
    val n = u.agg(count(lit(1)).as("n"))
    val twin = ranked.crossJoin(broadcast(n))
      .select(expr("least(3, rk * 4 div n)").as("quartile"), col("arm"),
        col("act"), col("np"))
      .groupBy(col("quartile"))
      .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("arm") === 1, col("np")).otherwise(0L)).as("p_treat"),
        sum(when(col("arm") === 0, col("np")).otherwise(0L)).as("p_ctrl"))
      .select(col("quartile"), col("n_treat"), col("n_ctrl"),
        expr("p_treat * 10000 div greatest(n_treat, CAST(1 AS BIGINT))").as("rate_treat_e4"),
        expr("p_ctrl * 10000 div greatest(n_ctrl, CAST(1 AS BIGINT))").as("rate_ctrl_e4"),
        (expr("p_treat * 10000 div greatest(n_treat, CAST(1 AS BIGINT))")
          - expr("p_ctrl * 10000 div greatest(n_ctrl, CAST(1 AS BIGINT))")).as("uplift_e4"))
      .orderBy("quartile")
    assert(rows(MLDeterministic.upliftQuartilesOf(u)) === rows(twin))
  }

  /** Verbatim round-8 closest-pair grid over raw (vec_id, x, y) points. */
  private def closestPairTwin(pts: DataFrame): DataFrame = {
    val bounds = pts.agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
      min(col("y")).as("y0"), max(col("y")).as("y1"))
    val cells = pts.crossJoin(broadcast(bounds))
      .select(col("vec_id"), col("x"), col("y"),
        expr("(x - x0) * 32 div (x1 - x0 + 1)").as("cx"),
        expr("(y - y0) * 32 div (y1 - y0 + 1)").as("cy"))
    val probe = cells.select(col("vec_id").as("b"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy"))
      .withColumn("d", explode(expr(
        "transform(sequence(0, 8), i -> struct(i div 3 - 1 AS ox, i % 3 - 1 AS oy))")))
      .select(col("b"), col("bx"), col("by"),
        (col("cx") + col("d.ox")).as("cx"), (col("cy") + col("d.oy")).as("cy"))
    val cand = cells.join(probe, Seq("cx", "cy"))
      .filter(col("vec_id") < col("b"))
      .select(col("vec_id").as("a"), col("b"),
        ((col("x") - col("bx")) * (col("x") - col("bx"))
          + (col("y") - col("by")) * (col("y") - col("by"))).as("d2"))
      .localCheckpoint()
    val n = cand.agg(count(lit(1)).as("n_candidates"))
    cand.orderBy(col("d2").asc, col("a").asc, col("b").asc).limit(1)
      .crossJoin(broadcast(n))
      .select(col("a").as("vec_a"), col("b").as("vec_b"),
        col("d2").as("d2_e14"), col("n_candidates"))
  }

  test("closest-pair rep collapse == verbatim grid, dup-group winner") {
    import spark.implicits._
    // 100-copy group (zero-distance winner must be its two smallest ids),
    // a 3-copy neighbor group one cell over, two near singletons, one far
    val pts = ((0L until 100L).map(i => (i, 100000L, 100000L)) ++
        (100L until 103L).map(i => (i, 100200L, 100100L)) :+
        ((103L, 500000L, 500000L)) :+ ((104L, 500100L, 500100L)) :+
        ((105L, 10000000L, 10000000L)))
      .toDF("vec_id", "x", "y")
    assert(rows(Vectors.closestPair2dOf(pts)) === rows(closestPairTwin(pts)))
    assert(rows(Vectors.closestPair2dOf(pts)).head.take(3) === Seq(0L, 1L, 0L))
  }

  test("closest-pair rep collapse == verbatim grid, no duplicates") {
    import spark.implicits._
    val pts = (0L until 60L).map(i => (i, i * 37L % 700L * 1000L, i * 53L % 700L * 1000L))
      .toDF("vec_id", "x", "y")
    assert(rows(Vectors.closestPair2dOf(pts)) === rows(closestPairTwin(pts)))
  }

  test("nn-distance-hist rep collapse == verbatim block pair join") {
    import spark.implicits._
    // 50-copy group, 2-copy group, two singletons whose 1-NN is a GROUP
    val block = ((0L until 50L).map(i => (i, Seq(0L, 0L, 0L, 0L))) ++
        Seq((50L, Seq(10L, 0L, 0L, 0L)), (51L, Seq(10L, 0L, 0L, 0L)),
          (52L, Seq(13L, 0L, 0L, 0L)), (53L, Seq(2000L, 500L, 0L, 0L))))
      .toDF("vec_id", "qe")
    val twin = block.as("a")
      .join(block.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"),
        Vectors.dist2E14(col("a.qe"), col("b.qe")).as("d2"))
      .groupBy(col("a_id")).agg(min(col("d2")).as("nn_d2"))
      .select(expr("CAST(length(bin(nn_d2)) AS BIGINT)").as("bucket"), col("nn_d2"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("nn_d2")).as("min_d2"),
        max(col("nn_d2")).as("max_d2"))
      .orderBy("bucket")
    assert(rows(Vectors.nnDistanceHistOf(block)) === rows(twin))
  }

  // ---- ROUGE/BLEU rep collapse ----------------------------------------------

  private def gramCountsTwin(d: DataFrame, n: Int): DataFrame = {
    val base = d.select(col("doc_id"), col("lang"), col("source"),
      split(lower(col("text")), " ").as("tk"))
    val grams =
      if (n == 1) base.select(col("doc_id"), col("lang"), col("source"),
        explode(col("tk")).as("g"))
      else base.select(col("doc_id"), col("lang"), col("source"),
        explode(expr("transform(sequence(1, size(tk) - 1), " +
          "i -> concat(tk[i - 1], ' ', tk[i]))")).as("g"))
    grams.groupBy(col("doc_id"), col("lang"), col("source"), col("g"))
      .agg(count(lit(1)).as("c"))
  }

  private def pairOverlapTwin(d: DataFrame, n: Int, out: String): DataFrame = {
    val g = gramCountsTwin(d, n)
    g.as("a")
      .join(g.select(col("lang"), col("source"), col("doc_id").as("d2"),
        col("g"), col("c").as("c2")).as("b"), Seq("lang", "source", "g"))
      .filter(col("doc_id") < col("d2"))
      .groupBy(col("lang"), col("source"), col("doc_id"), col("d2"))
      .agg(sum(least(col("c"), col("c2"))).as(out))
  }

  /** Verbatim round-8 ROUGE pipeline over a (doc_id, lang, source, text)
    * frame. */
  private def rougeTwin(dsrc: DataFrame): DataFrame = {
    val docs = dsrc.select(col("doc_id"), col("lang"), col("source"), col("text"),
      size(split(lower(col("text")), " ")).cast("long").as("len"))
    val pairs = docs.as("a")
      .join(docs.select(col("lang"), col("source"), col("doc_id").as("d2")).as("b"),
        Seq("lang", "source"))
      .filter(col("doc_id") < col("d2"))
      .select(col("lang"), col("source"), col("doc_id"), col("d2"), col("len"))
    pairs
      .join(pairOverlapTwin(dsrc, 1, "ov1"), Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .join(pairOverlapTwin(dsrc, 2, "ov2"), Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .select(col("lang"), col("source"),
        round(coalesce(col("ov1"), lit(0L)).cast("double") /
          col("len").cast("double") * lit(1e6)).cast("long").as("r1_e6"),
        round(coalesce(col("ov2"), lit(0L)).cast("double") /
          (col("len") - 1L).cast("double") * lit(1e6)).cast("long").as("r2_e6"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        (round(sum(col("r1_e6")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6)), 4) + lit(0.0)).as("mean_rouge1"),
        (round(sum(col("r2_e6")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6)), 4) + lit(0.0)).as("mean_rouge2"))
      .orderBy("lang", "source")
  }

  /** Verbatim round-8 BLEU pipeline over the same frame. */
  private def bleuTwin(dsrc: DataFrame): DataFrame = {
    val docs = dsrc.select(col("doc_id"), col("lang"), col("source"),
      size(split(lower(col("text")), " ")).cast("long").as("len"))
    val pairs = docs.as("a")
      .join(docs.select(col("lang"), col("source"), col("doc_id").as("d2"),
        col("len").as("len2")).as("b"), Seq("lang", "source"))
      .filter(col("doc_id") < col("d2"))
      .select(col("lang"), col("source"), col("doc_id"), col("d2"),
        col("len"), col("len2"))
    val bp = when(col("len2") >= col("len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("len").cast("double") / col("len2").cast("double")))
    val p1 = col("ov1").cast("double") / col("len2").cast("double")
    val p2 = col("ov2").cast("double") / (col("len2") - 1L).cast("double")
    pairs
      .join(pairOverlapTwin(dsrc, 1, "ov1"), Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .join(pairOverlapTwin(dsrc, 2, "ov2"), Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .select(col("lang"), col("source"),
        when(coalesce(col("ov1"), lit(0L)) === 0L ||
          coalesce(col("ov2"), lit(0L)) === 0L, lit(0L))
          .otherwise(round(bp * sqrt(p1 * p2) * lit(1e6)).cast("long"))
          .as("bleu_e6"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        (round(sum(col("bleu_e6")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6)), 4) + lit(0.0)).as("mean_bleu2"))
      .orderBy("lang", "source")
  }

  /** Orientation-adversarial corpus: dup groups of DIFFERENT lengths with
    * interleaved, skewed doc-id patterns (one group entirely after
    * another, one interleaved mid-stream), an equal-length pair (where
    * orientation must not matter), partial-overlap singletons, a
    * disjoint-vocab singleton, and a second shard. */
  private def pairMetricDocs: DataFrame = {
    import spark.implicits._
    val a = (0 until 10).map(i => s"w$i").mkString(" ")                 // 10 tokens
    val b = a + " x0 x1"                                               // 12 tokens
    val e = (0 until 9).map(i => s"w$i").mkString(" ") + " y0"         // 10 tokens
    val cTxt = "w0 w1 w2 w3 w4"
    val dTxt = "z0 z1 z2"
    val aIds = (0L until 52L).filterNot(Set(5L, 11L, 17L, 23L, 29L, 35L, 41L,
      3L, 19L, 33L, 47L, 50L, 51L).contains)                           // 39 ids
    val bIds = Seq(5L, 11L, 17L, 23L, 29L, 35L, 41L)                   // interleaved
    val eIds = Seq(3L, 19L, 33L)                                       // interleaved
    val rows =
      aIds.map(id => (id, a, "en", "web")) ++
        bIds.map(id => (id, b, "en", "web")) ++ eIds.map(id => (id, e, "en", "web")) ++
        Seq((100L, cTxt, "en", "web"), (47L, dTxt, "en", "web"),
          (50L, "m0 m1 m2 m3", "fr", "web"), (51L, "m0 m1 k0 k1 k2", "fr", "web"))
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("rouge rep collapse == verbatim pair join on orientation-adversarial corpus") {
    val d = pairMetricDocs
    assert(rows(graft.ops.TextPipeline.rougeRecallOf(d)) === rows(rougeTwin(d)))
  }

  test("bleu rep collapse == verbatim pair join on orientation-adversarial corpus") {
    val d = pairMetricDocs
    assert(rows(graft.ops.TextPipeline.bleuPairsOf(d)) === rows(bleuTwin(d)))
  }

  /** All-distinct corpus (the graded sf0.1 shape): exercises the round-10
    * no-duplicates fast path of shardPairStatsOf, which must equal the
    * verbatim pair join exactly like the dup path does. */
  private def noDupDocs: DataFrame = {
    import spark.implicits._
    val rows = (0L until 20L).map { i =>
      val text = (i until i + 6L).map(j => s"n$j").mkString(" ")
      (i, text, if (i % 2 == 0) "en" else "fr", "web")
    }
    rows.toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  test("rouge/bleu no-dup fast path == verbatim pair join") {
    val d = noDupDocs
    assert(rows(graft.ops.TextPipeline.rougeRecallOf(d)) === rows(rougeTwin(d)))
    assert(rows(graft.ops.TextPipeline.bleuPairsOf(d)) === rows(bleuTwin(d)))
  }

  /** Verbatim round-8 winnowing pipeline over a (doc_id, lang, source,
    * text) frame. */
  private def winnowingTwin(dsrc: DataFrame): DataFrame = {
    val fps = dsrc
      .select(col("doc_id"), col("lang"), col("source"),
        split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 6)
      .select(col("doc_id"), col("lang"), col("source"), expr(
        """transform(sequence(1, size(t) - 2),
             i -> cast(conv(substring(md5(cast(concat_ws(' ', t[i-1], t[i], t[i+1])
                  as binary)), 1, 8), 16, 10) as bigint))""").as("hs"))
      .select(col("doc_id"), col("lang"), col("source"), explode(expr(
        "array_distinct(transform(sequence(1, size(hs) - 3), j -> array_min(slice(hs, j, 4))))"))
        .as("fp"))
    val perDoc = fps.groupBy(col("lang"), col("source"), col("doc_id"))
      .agg(count(lit(1)).as("nfp"))
    val pairs = fps.as("a")
      .join(fps.select(col("lang").as("l2"), col("source").as("s2"),
        col("doc_id").as("d2"), col("fp").as("fp2")).as("b"),
        col("lang") === col("l2") && col("source") === col("s2") &&
          col("fp") === col("fp2") && col("doc_id") < col("d2"))
      .groupBy(col("lang"), col("source"), col("doc_id"), col("d2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("candidate_pairs"))
    perDoc.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nfp")).as("n_fingerprints"))
      .join(pairs, Seq("lang", "source"), "left_outer")
      .select(col("lang"), col("source"), col("n_docs"), col("n_fingerprints"),
        coalesce(col("candidate_pairs"), lit(0L)).as("candidate_pairs"))
      .orderBy("lang", "source")
  }

  test("winnowing rep collapse == verbatim fingerprint join") {
    import spark.implicits._
    val t1 = (0 until 20).map(i => s"w$i").mkString(" ")
    val t2 = ((0 until 15).map(i => s"w$i") ++ (0 until 5).map(i => s"q$i")).mkString(" ")
    val t3 = (0 until 12).map(i => s"r$i").mkString(" ")
    val t4 = (Seq("s0", "s1", "s2") ++ (0 until 6).map(i => s"w$i") ++
      (3 until 10).map(i => s"s$i")).mkString(" ")
    val docs = ((0L until 25L).map(id => (id, t1, "en", "web")) ++
        (30L until 33L).map(id => (id, t2, "en", "web")) ++
        Seq((40L, t3, "en", "web"), (41L, t3, "en", "web"),
          (50L, t4, "en", "web"), (60L, "a b c", "en", "web"),
          (70L, (0 until 10).map(i => s"f$i").mkString(" "), "fr", "web")))
      .toDF("doc_id", "text", "lang", "source")
    assert(rows(graft.ops.TextPipeline.winnowingFingerprintOf(docs))
      === rows(winnowingTwin(docs)))
  }

  test("label-noise rep collapse == verbatim member-level grid") {
    import spark.implicits._
    // mixed-label dup groups across every vote regime: a 30-member group
    // (rank ≥ 7 class + explicit top-6), m = 6 (all-explicit, no external),
    // m = 5 (4 internal + 1 external), m = 2 (1 internal + 4 external),
    // singletons (pure external) including one whose 5-NN straddles a
    // d²-tie between two groups and interleaves by member id
    val block = (
      (0L until 30L).map(i => (i, if (i % 3 == 0) 1L else 0L, Seq(0L, 0L, 0L, 0L))) ++
        Seq(40L -> 1L, 41L -> 1L, 42L -> 0L, 43L -> 1L, 44L -> 0L)
          .map { case (id, lb) => (id, lb, Seq(7L, 0L, 0L, 0L)) } ++
        Seq((50L, 1L, Seq(10L, 0L, 0L, 0L)), (51L, 1L, Seq(10L, 0L, 0L, 0L))) ++
        Seq((60L, 0L, Seq(8L, 0L, 0L, 0L))) ++
        Seq((31L, 1L), (32L, 0L), (36L, 1L), (37L, 0L))
          .map { case (id, lb) => (id, lb, Seq(14L, 0L, 0L, 0L)) } ++
        Seq((90L, 1L, Seq(12L, 0L, 0L, 0L))) ++
        (100L until 106L).zip(Seq(0L, 1L, 1L, 0L, 1L, 0L))
          .map { case (id, lb) => (id, lb, Seq(100L, 0L, 0L, 0L)) })
      .toDF("vec_id", "label", "qe")
    val flagged = Vectors.gridTopK(
        Vectors.gridDirectedD2(block, 8, Nil, Seq("label")), 5)
      .select(col("qid").as("a_id"), col("q_label").as("a_label"),
        col("n_label").as("b_label"))
      .groupBy(col("a_id"), col("a_label"))
      .agg(sum(when(col("b_label") === 1, 1L).otherwise(0L)).as("votes1"))
      .select(col("a_label"),
        when((col("votes1") >= 3) =!= (col("a_label") === 1), 1L).otherwise(0L)
          .as("flagged"))
    val twin = flagged.groupBy(col("a_label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"), sum(col("flagged")).as("n_flagged"))
      .select(col("label"), col("n"), col("n_flagged"),
        expr("n_flagged * 10000 div n").as("flagged_share_e4"))
      .orderBy("label")
    assert(rows(Vectors.labelNoiseOf(block)) === rows(twin))
  }

  test("single-linkage rep collapse == verbatim cross-label pair join") {
    import spark.implicits._
    // duplicate vectors WITHIN a label (multiplicity weights) and the same
    // vector ACROSS two labels (a zero-distance cross pair)
    val src = ((0L until 40L).map(i => (i, i % 5, Seq(0L, 0L, 0L, 0L))) ++
        (40L until 46L).map(i => (i, 0L, Seq(100L, 0L, 0L, 0L))) ++
        (46L until 49L).map(i => (i, 1L, Seq(100L, 0L, 0L, 0L))) :+
        ((49L, 3L, Seq(0L, 777L, 0L, 0L))))
      .toDF("vec_id", "label0", "qe")
      .select(col("vec_id"), col("label0").cast("long").as("label"), col("qe"))
    val cross = src.as("a")
      .join(src.as("b"),
        col("a.label") =!= col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(least(col("a.label"), col("b.label")).as("la"),
        greatest(col("a.label"), col("b.label")).as("lb"),
        Vectors.dist2E14(col("a.qe"), col("b.qe")).as("d2"))
      .groupBy(col("la"), col("lb"))
      .agg(min(col("d2")).as("min_d2"), count(lit(1)).as("n_pairs"))
    val best = cross.orderBy(col("min_d2").asc, col("la").asc, col("lb").asc).limit(1)
      .select(col("la").as("ma"), col("lb").as("mb"), lit(1L).as("mf"))
    val twin = cross.join(broadcast(best),
        col("la") === col("ma") && col("lb") === col("mb"), "left_outer")
      .select(col("la"), col("lb"), col("min_d2"), col("n_pairs"),
        coalesce(col("mf"), lit(0L)).as("merges_first"))
      .orderBy("la", "lb")
    assert(rows(Vectors.singleLinkageStepOf(src)) === rows(twin))
  }

  test("support-2 PAIR COUNTS equal the legacy self-join (weighted-graph input)") {
    // round 9 moved q_sssp_weighted / q_boruvka_step / q_recsys_lift onto
    // Analytics.support2PairCounts; unlike Round7's edge-SET twin this
    // pins the s counts themselves (w = 1000 div s must be identical)
    val sf = "/root/testdata/sf0.001"
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val legacy = items.as("a")
      .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("s"))
      .orderBy("u", "v")
    val rewritten = Analytics.support2PairCounts(spark, sf).orderBy("u", "v")
    assert(rows(rewritten) === rows(legacy))
  }
}
