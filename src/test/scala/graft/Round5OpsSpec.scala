package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Invariant + plan-shape gates for the round-5 work: the §2.211
  * inequality audits, and the scale rewrites of the pair-generation cores
  * (prefix-filtered near-dup candidates, grid-blocked dense pair ops,
  * lattice trimmed mean).
  */
class Round5OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("jensen gap: gap equals the population variance and is non-negative") {
    Analytics.q_jensen_gap(spark, sf).collect().foreach { r =>
      val gap = r.getAs[Long]("jensen_gap_e2")
      assert(gap === r.getAs[Long]("variance_e2"), "Jensen gap != variance")
      assert(gap >= 0L, s"convexity violated: $gap")
    }
  }

  test("am-gm: arithmetic mean >= geometric mean, gap consistent") {
    Analytics.q_amgm_gap(spark, sf).collect().foreach { r =>
      val am = r.getAs[Long]("am_cents")
      val gm = r.getAs[Long]("gm_cents")
      // the e9 ln lattice can displace GM by at most 1 cent at this scale
      assert(am >= gm - 1L, s"AM $am < GM $gm")
      assert(r.getAs[Long]("amgm_gap_cents") === am - gm)
    }
  }

  test("log-sum-exp: LSE sits in the [max, max + tau*ln n] sandwich") {
    Analytics.q_logsumexp_audit(spark, sf).collect().foreach { r =>
      val lse = r.getAs[Long]("lse_cents_e2")
      val mx = r.getAs[Long]("max_cents") * 100L
      val ub = r.getAs[Long]("upper_cents_e2")
      // per-row e9 quantization can shift the ln by <1e-6 — allow 1 e2 unit
      assert(lse >= mx - 1L, s"LSE $lse below max $mx")
      assert(lse <= ub + 1L, s"LSE $lse above upper bound $ub")
    }
  }

  // ---- prefix-filtered near-dup core ---------------------------------------

  import org.apache.spark.sql.functions._
  import graft.core.Tables

  /** The pre-round-5 naive postings self-join, kept as the spec's oracle:
    * every same-block pair sharing >=1 token with its exact overlap. */
  private def naiveOverlap(): org.apache.spark.sql.DataFrame = {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(split(lower(col("text")), " "))).as("word"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    toks.as("a")
      .join(toks.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
  }

  test("near-dup rewrites reproduce the naive postings join at every consumer threshold") {
    val naive = naiveOverlap().collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("inter"), r.getAs[Long]("sz1"), r.getAs[Long]("sz2")))
    val jac = naive.filter { case (_, _, i, s1, s2) =>
      i.toDouble / (s1 + s2 - i) >= 0.8 }.map(t => (t._1, t._2)).toSet
    val got = Text.q_neardup_jaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(got === jac, "Jaccard >= 0.8 pair set changed")
    val cont = naive.filter { case (_, _, i, s1, s2) =>
      i * 10000L / math.min(s1, s2) >= 9000L }.map(t => (t._1, t._2)).toSet
    val gotC = Text.q_neardup_containment(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(gotC === cont, "containment >= 0.9 pair set changed")
    val sweep = Text.q_dedup_threshold_sweep(spark, sf).collect()
      .map(r => r.getAs[Long]("threshold_e4") -> r.getAs[Long]("n_pairs")).toMap
    for (thr <- Seq(5000L, 7000L, 9000L)) {
      val want = naive.count { case (_, _, i, s1, s2) =>
        i * 10000L / (s1 + s2 - i) >= thr }
      assert(sweep.getOrElse(thr, 0L) === want.toLong, s"sweep@$thr changed")
    }
  }

  test("prefix filter prunes a Zipf corpus to zero candidates but keeps true near-dups") {
    import spark.implicits._
    // 60 docs: 11 unique tokens (df=1, the rarity prefix) + 9 ubiquitous
    // stopwords (df=62, never in a prefix) -> J = 9/31 < 0.5 for every
    // cross pair; plus one genuine duplicate pair sharing all 20 tokens.
    val stop = (0 until 9).map(i => f"zz_stop$i%02d")
    val mk = (id: Int) => (id.toLong, "en", "src",
      ((0 until 11).map(i => f"uniq_${id}%03d_$i") ++ stop).toArray, 20L)
    val dup = Seq(
      (1000L, "en", "src", ((0 until 11).map(i => f"uniq_999_$i") ++ stop).toArray, 20L),
      (1001L, "en", "src", ((0 until 11).map(i => f"uniq_999_$i") ++ stop).toArray, 20L))
    val docs = ((0 until 60).map(mk) ++ dup)
      .toDF("doc_id", "lang", "source", "toks", "sz")
    val cand = Text.pairCandidatesOf(docs).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(cand.contains((1000L, 1001L)), "true duplicate pair pruned away")
    // the naive join would generate C(62,2)=1891 stopword-driven pairs;
    // the prefix filter must keep only the duplicate pair
    assert(cand === Set((1000L, 1001L)),
      s"prefix filter failed to prune the stopword fan-out: ${cand.size} candidates")
  }

  test("prefix filter is complete for containment pairs with unequal sizes") {
    import spark.implicits._
    // small doc fully contained in a big doc that shares NO prefix token
    // with it under the symmetric scheme (big doc's prefix is its own
    // rarest tokens) — the asymmetric small-prefix x full-postings leg
    // must still find it: C = 10/10 = 1.0 >= 0.9.
    val small = (1L, "en", "s", (0 until 10).map(i => s"w$i").toArray, 10L)
    val big = (2L, "en", "s",
      ((0 until 10).map(i => s"w$i") ++ (0 until 30).map(i => s"rare_$i")).toArray, 40L)
    // make w* frequent so they sort LAST in big's rarity order
    val noise = (10 until 40).map(id => (id.toLong, "en", "s",
      (0 until 10).map(i => s"w$i").toArray ++ Array(s"pad_$id"), 11L))
    val docs = (Seq(small, big) ++ noise).toDF("doc_id", "lang", "source", "toks", "sz")
    val cand = Text.pairCandidatesOf(docs).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(cand.contains((1L, 2L)), "containment pair missed by candidate stage")
  }

  // ---- grid-blocked dense pair ops -----------------------------------------

  test("gridLegs covers every unordered pair exactly once") {
    import spark.implicits._
    val v = (0L until 100L).toDF("vec_id")
    val (l, r) = Vectors.gridLegs(v, 8, "vec_id")
    val pairs = l.as("a")
      .join(r.as("b"),
        col("a.gi") === col("b.gi") && col("a.gj") === col("b.gj") &&
          (col("a.gi") =!= col("a.gj") || col("a.vec_id") < col("b.vec_id")))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("v1"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("v2"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    assert(pairs.length === 100 * 99 / 2, s"pair count ${pairs.length}")
    assert(pairs.toSet.size === pairs.length, "a pair appeared in two tasks")
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("similarity join and embedding near-dup match their naive all-pairs twins") {
    val v = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), Vectors.q7(col("embedding")).as("qe"))
      .withColumn("nrm", Vectors.dotE14(col("qe"), col("qe")))
    val naiveTop = v.filter(col("label").isin(0, 1)).as("a")
      .join(v.filter(col("label").isin(0, 1)).as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        (round(Vectors.cosine(Vectors.dotE14(col("a.qe"), col("b.qe")),
          col("a.nrm"), col("b.nrm")), 4) + lit(0.0)).as("cos"))
      .orderBy(col("cos").desc, col("v1").asc, col("v2").asc).limit(20)
      .collect().map(_.toSeq).toSeq
    val gotTop = Vectors.q_similarity_join_topk(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(gotTop === naiveTop, "grid top-20 diverged from naive all-pairs")
    val naiveNd = v.as("a")
      .join(v.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"), col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        Vectors.cosine(Vectors.dotE14(col("a.qe"), col("b.qe")), col("a.nrm"), col("b.nrm"))
          .as("cos"))
      .filter(col("cos") >= 0.25)
      .select(col("label"), col("v1"), col("v2"), (round(col("cos"), 4) + lit(0.0)).as("cos"))
      .collect().map(_.toSeq).toSet
    val gotNd = Ann.q_neardup_embedding(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(gotNd === naiveNd, "grid near-dup diverged from naive label join")
  }

  test("tfidf cosine grid rewrite matches the naive postings-dot twin") {
    val docs = Tables.documents(spark, sf)
    val n = docs.agg(count(lit(1)).as("nn"))
    val tf = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val weights = tf.join(dfr, "word").crossJoin(broadcast(n))
      .select(col("doc_id"), col("lang"), col("source"), col("word"),
        (col("tf") * round(log(col("nn").cast("double") / (col("df") + lit(1L)).cast("double"))
          * lit(1e4)).cast("long")).as("w"))
    val norms = weights.groupBy(col("doc_id").as("nd"))
      .agg(sum(col("w").cast("decimal(38,0)") * col("w")).as("nrm"))
    val naive = weights.as("a")
      .join(weights.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(sum(col("a.w").cast("decimal(38,0)") * col("b.w")).as("dot"))
      .join(norms.select(col("nd").as("d1"), col("nrm").as("n1")), "d1")
      .join(norms.select(col("nd").as("d2"), col("nrm").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (round(col("dot").cast("double") /
          sqrt(col("n1").cast("double") * col("n2").cast("double")), 6) + lit(0.0)).as("cos"))
      .orderBy(col("cos").desc, col("d1").asc, col("d2").asc).limit(20)
      .collect().map(_.toSeq).toSeq
    val got = Retrieval.q_tfidf_cosine_docs(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got === naive, "prefix-candidate tfidf cosine diverged from naive")
  }

  // ---- lattice percentile ----------------------------------------------------

  test("latticePercentile replicates the builtin percentile bit-for-bit") {
    import spark.implicits._
    val v = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice") * 100).cast("long").as("pc"))
    for (p <- Seq(0.1, 0.25, 0.5, 0.9)) {
      val builtin = v.groupBy(col("g")).agg(percentile(col("pc"), lit(p)).as("want"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val lat = v.groupBy(col("g"), col("pc")).agg(count(lit(1)).as("cnt"))
      val got = Relational.latticePercentile(lat, "g", p, "got")
        .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("got")).toMap
      assert(got === builtin, s"lattice percentile p=$p diverged")
    }
    // adversarial shapes: single value, two values, all-equal, n%10==0 ties
    val tricky = Seq(
      ("a", Seq(7L)), ("b", Seq(3L, 9L)), ("c", Seq(5L, 5L, 5L, 5L)),
      ("d", (1L to 20L) ++ Seq(10L, 10L, 10L)), ("e", (1L to 11L).map(_ * 100L)))
      .flatMap { case (g, xs) => xs.map(x => (g, x)) }.toDF("g", "pc")
    for (p <- Seq(0.0, 0.1, 0.5, 0.9, 1.0)) {
      val builtin = tricky.groupBy(col("g")).agg(percentile(col("pc"), lit(p)).as("want"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val lat = tricky.groupBy(col("g"), col("pc")).agg(count(lit(1)).as("cnt"))
      val got = Relational.latticePercentile(lat, "g", p, "got")
        .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("got")).toMap
      assert(got === builtin, s"lattice percentile p=$p diverged on tricky data")
    }
  }

  test("trimmed mean no longer plans the value-buffering Percentile aggregate") {
    val p = plan(Relational.q_trimmed_mean(spark, sf))
    assert(!p.toLowerCase.contains("percentile"), s"builtin percentile still planned:\n$p")
  }

  test("one-pass trimmed mean equals the pre-round-5 percentile formulation") {
    val v = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
    val bounds = v.groupBy(col("flag"))
      .agg(percentile(col("pc"), lit(0.1)).as("lo"),
        percentile(col("pc"), lit(0.9)).as("hi"))
    val naive = v.join(broadcast(bounds), "flag")
      .filter(col("pc").cast("double") >= col("lo") && col("pc").cast("double") <= col("hi"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_kept"), sum(col("pc")).as("s"))
      .select(col("flag"), col("n_kept"),
        (round(col("s").cast("double") / col("n_kept").cast("double") / lit(100.0), 4)
          + lit(0.0)).as("trimmed_mean"))
      .orderBy("flag").collect().map(_.toSeq).toSeq
    val got = Relational.q_trimmed_mean(spark, sf).collect().map(_.toSeq).toSeq
    assert(got === naive, "one-pass trimmed mean diverged from percentile formulation")
  }

  test("source overlap: non-empty path verified with synthetic cross-source dups") {
    import spark.implicits._
    // srcA/srcB share the bag-of-words of "x y z" (one doc each, plus a
    // token-order permutation that must fingerprint identically) and srcB/
    // srcC share "p q"; srcA has a private doc. Expected matrix:
    //   (A,B): 1 shared fp, cross pairs = 2*1 = 2 (A holds 2 copies)
    //   (B,C): 1 shared fp, cross pairs = 1
    val docs = Seq(
      ("srcA", "x y z"), ("srcA", "z y x"), ("srcB", "y z x"),
      ("srcB", "p q"), ("srcC", "q p"),
      ("srcA", "only here")).toDF("source", "text")
    val got = TextPipeline.sourceOverlapOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_shared_fps"), r.getAs[Long]("n_cross_pairs"))).toSet
    assert(got === Set(("srcA", "srcB", 1L, 2L), ("srcB", "srcC", 1L, 1L)), got.toString)
    // and the fixture path really is the empty matrix — if a regenerated
    // fixture ever gains cross-source dups, the oracle hash still holds,
    // and this assertion documents the expectation flip
    assert(TextPipeline.q_source_overlap(spark, sf).count() === 0L,
      "fixture gained cross-source duplicates: drop this assertion")
  }

  test("kmeans-to-convergence: reaches a fixpoint, beats iteration 1, deterministic") {
    val rows = MLDeterministic.q_kmeans_converged(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("converged")), "did not converge in 30 iters")
    val iters = rows.head.getAs[Long]("n_iters")
    assert(iters >= 2L, s"converged suspiciously fast: $iters iters")
    // Lloyd monotonicity: the converged WCSS must not exceed iteration 1's
    // (both on the same e14 lattice; mean_dist2 is per-cluster, so compare
    // the size-weighted totals)
    def wcss(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("n") * r.getAs[Double]("mean_dist2")).sum
    val it1 = wcss(MLDeterministic.q_kmeans_step(spark, sf))
    val fin = wcss(MLDeterministic.q_kmeans_converged(spark, sf))
    assert(fin <= it1 * 1.0001, s"WCSS rose: iter1=$it1 converged=$fin")
    // determinism: a second run returns the identical table
    val again = MLDeterministic.q_kmeans_converged(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("builtin percentile stays confined to the audited bounded-domain allowlist") {
    // Round-5 audit: every builtin `percentile` whose buffered value
    // domain SCALES with the data (cents lattices, per-entity spend,
    // scores, gaps in µs) was converted to Relational.latticePercentiles.
    // The sites below buffer bounded domains only (day/week indexes,
    // quantities 1..50, discount pct, per-user groups, hourly counts,
    // count-of-count profiles) plus the documented q_conformal_interval
    // exception. A NEW builtin percentile call must either be over a
    // bounded domain (then: bump the count here and say why in the op's
    // docstring) or use the lattice form.
    val expected = Map(
      "Analytics.scala" -> 5, // reorder gap_days x2, did dayn, theil-sen slopes, newsvendor weekly
      "Events.scala" -> 2, // hourly counts p95, per-user purchase-gap median
      "MLDeterministic.scala" -> 4, // woe quantity, conformal (documented), tail-dependence daily x2
      "Relational.scala" -> 1, // impute: discount pct domain
      "Sampling.scala" -> 0, "Sketches.scala" -> 1, // count-of-count profile
      "Text.scala" -> 0, "TextPipeline.scala" -> 0, "Vectors.scala" -> 0,
      "Retrieval.scala" -> 0, "Joins.scala" -> 0, "Windows.scala" -> 0,
      "Scalars.scala" -> 0, "GraphMl.scala" -> 0, "Ann.scala" -> 0,
      "BandedScan.scala" -> 0)
    val dir = java.nio.file.Paths.get("src/main/scala/graft/ops")
    expected.foreach { case (f, want) =>
      val src = new String(java.nio.file.Files.readAllBytes(dir.resolve(f)), "UTF-8")
      val calls = src.linesIterator.zipWithIndex.filter { case (l, _) =>
        l.contains("percentile(") && !l.contains("approx_percentile") &&
          !l.contains("latticePercentile") &&
          !l.trim.startsWith("*") && !l.trim.startsWith("//")
      }.toSeq
      assert(calls.size === want,
        s"$f: expected $want audited builtin percentile sites, found " +
          calls.map { case (l, i) => s"${i + 1}: ${l.trim}" }.mkString("\n", "\n", ""))
    }
  }

  // ---- sorted-postings dot expression ---------------------------------------

  test("postings dot: codegen merge equals a driver-side sparse dot, plus edges") {
    import spark.implicits._
    // 40 docs over a 30-word vocabulary with deterministic weights; every
    // doc pair shares a data-dependent subset, exercising both match and
    // skip branches of the two-pointer merge
    val rows = for (d <- 0L until 40L; k <- 0 until 12) yield {
      val w = s"w${(d * 7 + k * 5) % 30}"
      (d, w, (d * 13 + k * 3 % 17 + 1).toLong)
    }
    val weights = rows.toDF("doc_id", "word", "w")
      .groupBy(col("doc_id"), col("word")).agg(max(col("w")).as("w"))
    val posts = weights.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("word"), col("w")))).as("p"))
      .localCheckpoint()
    val got = posts.as("a").join(posts.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        graft.functions.GraftFunctions.postingsDot(col("a.p"), col("b.p")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val maps = weights.collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    for (d1 <- 0L until 40L; d2 <- d1 + 1 until 40L) {
      val want = maps(d1).iterator
        .map { case (w, v) => v * maps(d2).getOrElse(w, 0L) }.sum
      assert(got((d1, d2)) === want, s"dot($d1,$d2)")
    }
    // edge cases: empty side and fully-disjoint vocabularies -> 0.
    // Seq-literal arrays type as containsNull=true, which the expression
    // rejects at plan time (the merge loop reads elements unconditionally)
    // — rebuild via transform, whose non-nullable struct lambda yields the
    // exact containsNull=false type the real producers emit
    def exact(c: org.apache.spark.sql.Column) =
      transform(c, x => struct(x.getField("_1").as("word"), x.getField("_2").as("w")))
    val e = Seq(
      (Seq.empty[(String, Long)], Seq(("a", 3L), ("b", 4L))),
      (Seq(("a", 2L)), Seq(("b", 5L), ("c", 1L))))
      .toDF("x", "y")
      .select(graft.functions.GraftFunctions.postingsDot(
        exact(col("x")), exact(col("y"))).as("dot"))
      .collect().map(_.getLong(0))
    assert(e.toSeq === Seq(0L, 0L), "empty/disjoint postings must dot to 0")
    // a containsNull=true array is a loud PLAN-TIME type error, never a
    // runtime NPE on a null element
    val err = intercept[Exception] {
      Seq((Seq(("a", 1L)), Seq(("a", 1L)))).toDF("x", "y")
        .select(graft.functions.GraftFunctions.postingsDot(col("x"), col("y")))
        .collect()
    }
    assert(err.getMessage.contains("containsNull=false"),
      s"expected the type-check rejection, got: ${err.getMessage}")
  }

  // ---- q-gram rarity fuzzy match -------------------------------------------

  test("fuzzy match equals the naive nation-blocked join on the fixture") {
    val s = Tables.supplier(spark, sf)
      .select(col("s_nationkey"), col("s_suppkey"), col("s_name"))
    val naive = s.as("a")
      .join(s.as("b"),
        col("a.s_nationkey") === col("b.s_nationkey") &&
          col("a.s_suppkey") < col("b.s_suppkey"))
      .withColumn("d", levenshtein(col("a.s_name"), col("b.s_name")).cast("long"))
      .filter(col("d") <= 2L)
      .select(col("a.s_nationkey").cast("long").as("nationkey"), col("d"),
        col("a.s_name").as("n1"), col("b.s_name").as("n2"))
      .collect().map(_.toSeq).toSet
    val got = Relational.fuzzyPairsOf(s, "s_nationkey", "s_suppkey", "s_name")
      .select(col("nationkey").cast("long"), col("d"), col("n1"), col("n2"))
      .collect().map(_.toSeq).toSet
    assert(got === naive, "q-gram candidate fuzzy pairs diverged from naive")
  }

  test("fuzzy match candidates survive templated prefixes, indels and short strings") {
    import spark.implicits._
    // 200 heavily-templated names (shared 12-char prefix, the PassJoin
    // killer): candidates must come from the discriminative tails only.
    val base = (0 until 200).map(i => (1L, i.toLong, f"Template#Pre$i%04d"))
    val cases = Seq(
      // substitution x2 (d=2), insertion (d=1, shifts every later gram),
      // deletion (d=1), insertion+substitution (d=2)
      (1L, 900L, "Template#Pre0107x"),   // vs 0107 tail edits
      (1L, 901L, "Template#PreX0042"),   // insertion before tail
      (1L, 902L, "Template#Pr0042"),     // deletion inside prefix
      (1L, 903L, "Template#PreY004Z"),   // ins + sub vs 0042? verify below
      // short-string block (both < 9 chars -> fallback leg)
      (2L, 904L, "ab"), (2L, 905L, "ax"), (2L, 906L, "abcd"),
      // cross: short vs long in same nation (probe-covered from long side)
      (2L, 907L, "Template#Pre0001"))
    val df = (base ++ cases).toDF("nk", "k", "nm")
    val naive = df.as("a")
      .join(df.as("b"), col("a.nk") === col("b.nk") && col("a.k") < col("b.k"))
      .withColumn("d", levenshtein(col("a.nm"), col("b.nm")).cast("long"))
      .filter(col("d") <= 2L)
      .select(col("a.nk").as("nationkey"), col("d"),
        col("a.nm").as("n1"), col("b.nm").as("n2"))
      .collect().map(_.toSeq).toSet
    assert(naive.nonEmpty, "adversarial corpus must contain true matches")
    val got = Relational.fuzzyPairsOf(df, "nk", "k", "nm")
      .collect().map(_.toSeq).toSet
    assert(got === naive, "adversarial fuzzy pairs diverged from naive")
  }

  // ---- randomized completeness sweeps (seeded, deterministic) --------------

  test("prefix candidates are complete for random corpora at every threshold combo") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    // small vocabulary + duplicated-then-mutated docs force real overlap
    val vocab = (0 until 40).map(i => f"v$i%02d")
    val base = (0 until 60).map { id =>
      val sz = 6 + rnd.nextInt(10)
      (id.toLong, rnd.shuffle(vocab).take(sz).toArray)
    }
    val mutants = (0 until 30).map { i =>
      val (src, toks) = base(rnd.nextInt(base.size))
      val t = toks.toBuffer
      (0 until (1 + rnd.nextInt(2))).foreach { _ =>
        val v = vocab(rnd.nextInt(vocab.size))
        if (t.contains(v)) t -= v else t += v
      }
      (1000L + i, t.distinct.toArray)
    }
    val docs = (base ++ mutants)
      .map { case (id, t) => (id, "en", "s", t, t.length.toLong) }
      .toDF("doc_id", "lang", "source", "toks", "sz")
      .localCheckpoint()
    // brute-force oracle: exact overlap of every pair
    val all = docs.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Seq[String]]("toks").toSet))
    def truth(keep: (Set[String], Set[String]) => Boolean) = (for {
      (d1, t1) <- all; (d2, t2) <- all if d1 < d2 && keep(t1, t2)
    } yield (d1, d2)).toSet
    val combos = Seq(
      (Some((1L, 2L)), None, "J>=0.5"), (Some((4L, 5L)), None, "J>=0.8"),
      (None, Some((9L, 10L)), "C>=0.9"), (Some((1L, 2L)), Some((1L, 2L)), "generic"))
    for ((mj, mc, label) <- combos) {
      val cand = Text.pairCandidatesOf(docs, mj, mc).collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
      mj.foreach { case (n, d) =>
        val want = truth((a, b) =>
          a.intersect(b).size.toDouble / a.union(b).size >= n.toDouble / d)
        assert(want.subsetOf(cand), s"$label missed ${(want -- cand).take(5)}")
      }
      mc.foreach { case (n, d) =>
        val want = truth((a, b) =>
          a.intersect(b).size.toDouble / math.min(a.size, b.size) >= n.toDouble / d)
        assert(want.subsetOf(cand), s"$label containment missed ${(want -- cand).take(5)}")
      }
    }
  }

  test("fuzzy candidates are complete for random edit scripts") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val alpha = "abcdefg"
    def randStr(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val base = (0 until 50).map(i => (1L, i.toLong, "Acme#" + randStr(8)))
    // mutants: 0-2 random edits (sub/ins/del) of a random base name
    val mutants = (0 until 40).map { i =>
      var nm = base(rnd.nextInt(base.size))._3
      (0 until rnd.nextInt(3)).foreach { _ =>
        val p = rnd.nextInt(nm.length)
        rnd.nextInt(3) match {
          case 0 => nm = nm.updated(p, alpha(rnd.nextInt(alpha.length)))
          case 1 => nm = nm.substring(0, p) + alpha(rnd.nextInt(alpha.length)) + nm.substring(p)
          case _ if nm.length > 3 => nm = nm.substring(0, p) + nm.substring(p + 1)
          case _ => ()
        }
      }
      (1L, 500L + i, nm)
    }
    val df = (base ++ mutants).toDF("nk", "k", "nm")
    val naive = df.as("a")
      .join(df.as("b"), col("a.nk") === col("b.nk") && col("a.k") < col("b.k"))
      .withColumn("d", levenshtein(col("a.nm"), col("b.nm")).cast("long"))
      .filter(col("d") <= 2L)
      .select(col("a.nk").as("nationkey"), col("d"),
        col("a.nm").as("n1"), col("b.nm").as("n2"))
      .collect().map(_.toSeq).toSet
    assert(naive.nonEmpty, "random edit corpus must contain true matches")
    val got = Relational.fuzzyPairsOf(df, "nk", "k", "nm")
      .collect().map(_.toSeq).toSet
    assert(got === naive, "random-edit fuzzy pairs diverged from naive")
  }
}
