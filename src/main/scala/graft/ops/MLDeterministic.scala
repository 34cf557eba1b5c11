package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Det.{cents, pct}

/** Deterministic, oracle-able formulations of the reference's ML surface
  * (SURVEY.md §2.12): closed-form linear regression, multinomial Naive
  * Bayes, unrolled K-Means Lloyd iterations, Apriori pair mining. The
  * MLlib twins of these live in [[graft.ml.MllibTwins]].
  *
  * The MapReduce lineage is visible in the shape: every algorithm is a
  * sum-reduction over exact integers (sufficient statistics, vote counts,
  * lattice distances) followed by a fixed scalar epilogue — which is
  * exactly what makes them distributable AND hash-comparable.
  */
object MLDeterministic {

  /** Closed-form simple linear regression l_extendedprice_cents ~
    * l_quantity via exact integer sufficient statistics (one partial+final
    * aggregate — the canonical MR sum-reduction), then a fixed double
    * epilogue for slope/intercept/r².
    */
  def q_linreg_normal(spark: SparkSession, sf: String): DataFrame = {
    val sums = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("x"), cents(col("l_extendedprice")).as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        // y² up to 1e14/row: sum in decimal(38) (exact, like DuckDB's
        // HUGEINT) — a long would overflow beyond ~60k rows
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
    // identical double expression tree on both engines (D3). The exact
    // integer sums are cast to double FIRST: products like n·Σxy overflow
    // int64 at sf ≥ 0.1 (found by the sf0.1 stress preflight), and the
    // cast-then-multiply sequence is bit-identical across engines.
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double")
    val sxxD = col("sxx").cast("double")
    val syyD = col("syy").cast("double")
    val num = nD * sxyD - sxD * syD
    val denX = nD * sxxD - sxD * sxD
    sums.select(
      col("n"),
      (round(num / denX, 4) + lit(0.0)).as("slope"),
      (round((syD - (num / denX) * sxD) / nD, 4) + lit(0.0)).as("intercept"),
      (round((num * num) / (denX * (nD * syyD - syD * syD)), 4) + lit(0.0)).as("r2"))
  }

  /** Pairwise Pearson correlation matrix of the four lineitem measures
    * (quantity, price cents, discount pct, tax pct) from ONE pass of exact
    * integer sufficient statistics — 15 sums, then a fixed double epilogue
    * per pair. Cross-product sums ride in decimal(38,0) (DuckDB: HUGEINT);
    * price², at cents scale, overflows int64 beyond ~10⁵ rows.
    */
  def q_corr_matrix(spark: SparkSession, sf: String): DataFrame = {
    def dsum(x: Column, y: Column): Column = sum(x.cast("decimal(38,0)") * y)
    val s = Tables.lineitem(spark, sf)
      .select(
        col("l_quantity").cast("long").as("q"),
        cents(col("l_extendedprice")).as("p"),
        pct(col("l_discount")).as("d"),
        pct(col("l_tax")).as("t"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("s_q"), sum(col("p")).as("s_p"),
        sum(col("d")).as("s_d"), sum(col("t")).as("s_t"),
        dsum(col("q"), col("q")).as("s_qq"), dsum(col("p"), col("p")).as("s_pp"),
        dsum(col("d"), col("d")).as("s_dd"), dsum(col("t"), col("t")).as("s_tt"),
        dsum(col("q"), col("p")).as("s_qp"), dsum(col("q"), col("d")).as("s_qd"),
        dsum(col("q"), col("t")).as("s_qt"), dsum(col("p"), col("d")).as("s_pd"),
        dsum(col("p"), col("t")).as("s_pt"), dsum(col("d"), col("t")).as("s_dt"))
    // identical IEEE epilogue on both engines: every exact sum is cast to
    // double FIRST (see q_linreg_normal), then one fixed expression tree
    def corrOf(sxy: String, sx: String, sy: String, sxx: String, syy: String): Column = {
      val nD = col("n").cast("double")
      val num = nD * col(sxy).cast("double") - col(sx).cast("double") * col(sy).cast("double")
      val dx = nD * col(sxx).cast("double") - col(sx).cast("double") * col(sx).cast("double")
      val dy = nD * col(syy).cast("double") - col(sy).cast("double") * col(sy).cast("double")
      round(num / sqrt(dx * dy), 4) + lit(0.0)
    }
    s.select(
      corrOf("s_qp", "s_q", "s_p", "s_qq", "s_pp").as("qty_price"),
      corrOf("s_qd", "s_q", "s_d", "s_qq", "s_dd").as("qty_disc"),
      corrOf("s_qt", "s_q", "s_t", "s_qq", "s_tt").as("qty_tax"),
      corrOf("s_pd", "s_p", "s_d", "s_pp", "s_dd").as("price_disc"),
      corrOf("s_pt", "s_p", "s_t", "s_pp", "s_tt").as("price_tax"),
      corrOf("s_dt", "s_d", "s_t", "s_dd", "s_tt").as("disc_tax"))
      .unpivot(
        Array.empty[Column],
        Array(col("qty_price"), col("qty_disc"), col("qty_tax"),
          col("price_disc"), col("price_tax"), col("disc_tax")),
        "pair", "r")
      .orderBy("pair")
  }

  /** Spearman rank correlation (min-rank variant) of quantity vs price per
    * return flag: RANK() assigns identical integer ranks on both engines
    * (ties → min rank), then the Pearson epilogue runs on exact integer
    * rank sums — same one-pass sufficient-statistics shape as
    * [[q_corr_matrix]], rank products carried in decimal.
    */
  def q_corr_spearman(spark: SparkSession, sf: String): DataFrame = {
    val t = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("q"), cents(col("l_extendedprice")).as("p"))
      .withColumn("rq", rank().over(Window.partitionBy("flag").orderBy("q")).cast("long"))
      .withColumn("rp", rank().over(Window.partitionBy("flag").orderBy("p")).cast("long"))
    def dsum(x: Column, y: Column): Column = sum(x.cast("decimal(38,0)") * y)
    val s = t.groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("rq")).as("sq"), sum(col("rp")).as("sp"),
        dsum(col("rq"), col("rq")).as("sqq"), dsum(col("rp"), col("rp")).as("spp"),
        dsum(col("rq"), col("rp")).as("sqp"))
    val nD = col("n").cast("double")
    val num = nD * col("sqp").cast("double") - col("sq").cast("double") * col("sp").cast("double")
    val dx = nD * col("sqq").cast("double") - col("sq").cast("double") * col("sq").cast("double")
    val dy = nD * col("spp").cast("double") - col("sp").cast("double") * col("sp").cast("double")
    s.select(col("flag"), col("n"),
      (round(num / sqrt(dx * dy), 4) + lit(0.0)).as("rho"))
      .orderBy("flag")
  }

  /** Chi-square independence test of return flag × line status from the
    * exact contingency table: marginals via window re-sums of the cell
    * counts, each cell's (o−e)²/e term rounded to an e6 integer BEFORE the
    * (order-independent) sum, one fixed epilogue. The whole test is two
    * shuffles: the cell aggregate and the single-row collapse.
    */
  def q_chi_square(spark: SparkSession, sf: String): DataFrame = {
    val cellCounts = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("f"), col("l_linestatus").as("s"))
      .agg(count(lit(1)).as("o"))
    val obs = cellCounts
      .withColumn("rowtot", sum(col("o")).over(Window.partitionBy("f")))
      .withColumn("coltot", sum(col("o")).over(Window.partitionBy("s")))
      // grand total via a broadcast 1-row aggregate, not a global window
      .crossJoin(broadcast(cellCounts.agg(sum(col("o")).as("n"))))
    val e = col("rowtot").cast("double") * col("coltot").cast("double") / col("n").cast("double")
    val d = col("o").cast("double") - e
    val cells = obs.select(col("f"), col("s"), col("n"),
      round(d * d / e * 1e6).cast("long").as("term_e6"))
    cells.agg(
      max(col("n")).as("n"),
      countDistinct(col("f")).as("n_flags"),
      countDistinct(col("s")).as("n_statuses"),
      sum(col("term_e6")).as("s_e6"))
      .select(col("n"), col("n_flags"), col("n_statuses"),
        ((col("n_flags") - 1L) * (col("n_statuses") - 1L)).as("dof"),
        (round(col("s_e6").cast("double") / lit(1e6), 4) + lit(0.0)).as("chi2"))
  }

  private def docTokens(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), explode(split(lower(col("text")), " ")).as("word"))

  /** Naive Bayes model components as exact integer counts + e4-scaled
    * integer log-likelihoods: llh_e4 = ROUND(LN((c_wc+1)/(c_c+V))·1e4).
    * Integer scores make the downstream argmax summation-order-proof.
    */
  private def nbModel(spark: SparkSession, sf: String)
    : (DataFrame, DataFrame, DataFrame) = {
    val toks = docTokens(spark, sf)
    val wc = toks.groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c_wc"))
    // class totals and vocabulary are RE-aggregations of wc — deriving them
    // from the (lang, word) counts instead of re-exploding the corpus cuts
    // the model build from three corpus passes to one
    val cc = wc.groupBy(col("lang")).agg(sum(col("c_wc")).as("c_c"))
    val v = wc.agg(countDistinct(col("word")).as("v"))
    val likelihood = wc.join(cc, "lang").crossJoin(broadcast(v))
      .select(col("lang"), col("word"),
        round(log((col("c_wc") + 1).cast("double") / (col("c_c") + col("v"))) * 1e4)
          .cast("long").as("llh_e4"))
    val docsPerLang = Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_c"))
    val nDocs = Tables.documents(spark, sf).agg(count(lit(1)).as("n"))
    val prior = docsPerLang.crossJoin(broadcast(nDocs))
      .select(col("lang"),
        round(log(col("n_c").cast("double") / col("n")) * 1e4).cast("long").as("prior_e4"))
    // default (unseen-in-class) log-likelihood per class
    val default = cc.crossJoin(broadcast(v))
      .select(col("lang"),
        round(log(lit(1.0) / (col("c_c") + col("v"))) * 1e4).cast("long").as("def_e4"))
    (likelihood, prior, default)
  }

  /** NB training output: top-5 tokens per language by likelihood, plus one
    * prior row per language (rnk=0).
    */
  def q_naivebayes_train(spark: SparkSession, sf: String): DataFrame = {
    val (likelihood, prior, _) = nbModel(spark, sf)
    val w = Window.partitionBy("lang").orderBy(col("llh_e4").desc, col("word").asc)
    val top = likelihood
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("word").as("item"), col("llh_e4").as("logp_e4"), col("rnk"))
    val priors = prior.select(col("lang"), lit("__prior__").as("item"),
      col("prior_e4").as("logp_e4"), lit(0L).as("rnk"))
    top.unionByName(priors).orderBy("lang", "rnk", "item")
  }

  /** NB prediction: score every document against every class over its
    * DISTINCT tokens (set-of-words), unseen tokens falling back to the
    * class default; argmax with tie → lexicographically smaller language.
    * Scores are exact integer e4-log sums. Appends one summary row
    * (doc_id=-1) carrying the global correct-prediction count.
    */
  /** Per-document NB predictions (doc_id, predicted, actual, hit) — the
    * scoring pipeline shared by [[q_naivebayes_predict]] (which appends
    * the summary row) and [[q_eval_f1]] (which aggregates the confusion
    * matrix into per-class metrics).
    */
  private[ops] def nbPredict(spark: SparkSession, sf: String): DataFrame = {
    val (likelihood, prior, default) = nbModel(spark, sf)
    // pivot the model to word → one integer score column per language
    // (classes are few and fixed; the per-class default fills unseen
    // (class, word) cells) — scoring becomes ONE broadcast join + ONE
    // aggregation instead of a 5× row expansion with a window argmax
    // one tiny job to enumerate the classes, then explicit pivot values —
    // auto-discovery would run a distinct scan per pivot (3×)
    val langs = prior.select(col("lang")).collect().map(_.getString(0)).toSeq.sorted
    val wordScores = likelihood.groupBy(col("word")).pivot("lang", langs).agg(first(col("llh_e4")))
    val defRow = default.groupBy().pivot("lang", langs).agg(first(col("def_e4")))
      .select(langs.map(l => col(l).as(s"def_$l")): _*)
    val priorRow = prior.groupBy().pivot("lang", langs).agg(first(col("prior_e4")))
      .select(langs.map(l => col(l).as(s"prior_$l")): _*)
    val docWords = docTokens(spark, sf).select(col("doc_id"), col("word")).distinct()
    val sumCols = langs.map(l => sum(col(s"s_$l")).as(s"s_$l"))
    val scored = docWords
      .join(broadcast(wordScores), "word")
      .crossJoin(broadcast(defRow))
      .select(col("doc_id") +:
        langs.map(l => coalesce(col(l), col(s"def_$l")).as(s"s_$l")): _*)
      .groupBy(col("doc_id"))
      .agg(sumCols.head, sumCols.tail: _*)
      .crossJoin(broadcast(priorRow))
      .withColumn("scores",
        array(langs.map(l => col(s"s_$l") + col(s"prior_$l")): _*))
    // argmax over the fixed-width score vector; tie → smallest index =
    // lexicographically smallest language (columns are sorted)
    val pred = scored
      .withColumn("best", expr(
        s"array_max(transform(sequence(0, ${langs.size - 1}), i -> struct(scores[i] AS s, -i AS ni)))"))
      .select(col("doc_id"),
        element_at(array(langs.map(lit): _*), lit(1) - col("best.ni")).as("predicted"))
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang").as("actual")), "doc_id")
      .select(col("doc_id"), col("predicted"), col("actual"),
        when(col("predicted") === col("actual"), 1L).otherwise(0L).as("hit"))
    pred
  }

  def q_naivebayes_predict(spark: SparkSession, sf: String): DataFrame = {
    // per-doc rows + the grand-total summary row in ONE pass via grouping
    // sets (a union of pred with pred.agg would execute the scoring
    // pipeline twice)
    nbPredict(spark, sf)
      .groupingSets(
        Seq(Seq(col("doc_id"), col("predicted"), col("actual")), Seq.empty),
        col("doc_id"), col("predicted"), col("actual"))
      .agg(sum(col("hit")).as("hit"))
      .select(
        coalesce(col("doc_id"), lit(-1L)).as("doc_id"),
        coalesce(col("predicted"), lit("__summary__")).as("predicted"),
        coalesce(col("actual"), lit("__correct__")).as("actual"),
        col("hit"))
      .orderBy("doc_id")
  }

  /** Per-class precision / recall / F1 of the NB classifier — the model
    * evaluation pass every training pipeline runs after scoring. The
    * confusion matrix is one (actual, predicted) aggregate (≤ classes²
    * cells at any corpus size); metrics are exact e4 integer divisions
    * with −1 sentinels for undefined cells (a class never predicted).
    */
  def q_eval_f1(spark: SparkSession, sf: String): DataFrame = {
    val conf = nbPredict(spark, sf)
      .groupBy(col("actual"), col("predicted")).agg(count(lit(1)).as("n"))
    val byPred = conf.groupBy(col("predicted").as("class"))
      .agg(sum(when(col("actual") === col("predicted"), col("n")).otherwise(0L)).as("tp"),
        sum(when(col("actual") =!= col("predicted"), col("n")).otherwise(0L)).as("fp"))
    val byAct = conf.groupBy(col("actual").as("class"))
      .agg(sum(when(col("actual") =!= col("predicted"), col("n")).otherwise(0L)).as("fn"))
    byAct.join(byPred, Seq("class"), "full_outer")
      .select(col("class"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"))
      .select(col("class"), col("tp"), col("fp"), col("fn"),
        expr("CASE WHEN tp + fp = 0 THEN -1 ELSE tp * 10000 div (tp + fp) END").as("precision_e4"),
        expr("CASE WHEN tp + fn = 0 THEN -1 ELSE tp * 10000 div (tp + fn) END").as("recall_e4"),
        expr("CASE WHEN 2*tp + fp + fn = 0 THEN -1" +
          " ELSE 2 * tp * 10000 div (2*tp + fp + fn) END").as("f1_e4"))
      .orderBy("class")
  }

  /** Smoothed mean-target encoding of a categorical feature (p_brand →
    * expected retail price): enc = (Σ target + m·global_mean)/(n + m)
    * with m = 10, all in exact integer cents (the global mean is one
    * integer division, documented as floor). The classic leakage-free
    * categorical featurization — one aggregate per category plus one
    * broadcast global row, no matter the table size.
    */
  def q_target_encoding(spark: SparkSession, sf: String): DataFrame = {
    val parts = Tables.part(spark, sf)
      .select(col("p_brand"), cents(col("p_retailprice")).as("pc"))
    val global = parts.agg(sum(col("pc")).as("ts"), count(lit(1)).as("tn"))
      .select(expr("ts div tn").as("gmean"))
    parts.groupBy(col("p_brand")).agg(count(lit(1)).as("n"), sum(col("pc")).as("s"))
      .crossJoin(broadcast(global))
      .select(col("p_brand"), col("n"), col("s"),
        expr("(s + 10 * gmean) div (n + 10)").as("enc_cents"),
        col("gmean").as("global_mean_cents"))
      .orderBy("p_brand")
  }

  /** Farthest-first (k-center / Gonzalez) seeding, 3 unrolled rounds:
    * seed 0 = vector 0 [D5]; each next seed is the point maximizing its
    * min squared lattice distance to the chosen set (tie → lower id);
    * a final row reports the coverage radius (the worst-covered point).
    * Each round is one broadcast of a single seed row + one arg-max
    * aggregate — the deterministic init a K-Means/K-center run wants at
    * scale, touching the data k times with no shuffle growth.
    */
  def q_kcenter_seeds(spark: SparkSession, sf: String): DataFrame = {
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.q7(col("embedding")).as("qe"))
    def argmax(df: DataFrame, d: String) =
      df.agg(max(struct(col(d).as("d"), (-col("vec_id")).as("ni"), col("qe"))).as("m"))
        .select((-col("m.ni")).as("vid"), col("m.d").as("dd"), col("m.qe").as("sqe"))
    val s0 = all.filter(col("vec_id") === 0).select(col("qe").as("sqe"))
    val d1 = all.crossJoin(broadcast(s0))
      .select(col("vec_id"), col("qe"), Vectors.dist2E14(col("qe"), col("sqe")).as("dmin"))
    val p1 = argmax(d1, "dmin")
    val d2 = d1.crossJoin(broadcast(p1.select(col("sqe"))))
      .select(col("vec_id"), col("qe"),
        least(col("dmin"), Vectors.dist2E14(col("qe"), col("sqe"))).as("dmin"))
    val p2 = argmax(d2, "dmin")
    val d3 = d2.crossJoin(broadcast(p2.select(col("sqe"))))
      .select(col("vec_id"), col("qe"),
        least(col("dmin"), Vectors.dist2E14(col("qe"), col("sqe"))).as("dmin"))
    val p3 = argmax(d3, "dmin")
    def row(k: Long, p: DataFrame) = p.select(lit(k).as("k"), col("vid").as("vec_id"),
      (round(col("dd").cast("double") / lit(1e14), 6) + lit(0.0)).as("d2"))
    spark.range(1).select(lit(0L).as("k"), lit(0L).as("vec_id"), lit(0.0).as("d2"))
      .unionByName(row(1L, p1)).unionByName(row(2L, p2)).unionByName(row(3L, p3))
      .orderBy("k")
  }

  /** Cluster-quality index for the fixed 10-seed assignment of
    * [[q_kmeans_step]]: per cluster the size, cohesion (mean intra
    * squared distance), separation (min squared distance from this seed
    * to any other seed) and their ratio — the Davies-Bouldin-flavor
    * health check a clustering pipeline runs after every iteration.
    * Intra sums carry in decimal (Σd2 can pass 2⁶³); the 10×10 seed-pair
    * table is constant-sized at any corpus scale.
    */
  def q_cluster_quality(spark: SparkSession, sf: String): DataFrame = {
    val assigned = kmeansAssign(spark, sf)
    val intra = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("d2").cast("decimal(38,0)")).as("sd2"))
    val seeds = Tables.embeddings(spark, sf).filter(col("vec_id") <= 9)
      .select(col("vec_id").as("cluster"), Vectors.q7(col("embedding")).as("qe"))
    val sep = seeds.as("a")
      .join(broadcast(seeds.select(col("cluster").as("c2"), col("qe").as("qe2")).as("b")),
        col("a.cluster") =!= col("c2"))
      .select(col("a.cluster").as("cluster"),
        Vectors.dist2E14(col("a.qe"), col("qe2")).as("pd2"))
      .groupBy(col("cluster")).agg(min(col("pd2")).as("sep"))
    val cohesion = col("sd2").cast("double") / (col("n").cast("double") * lit(1e14))
    val separation = col("sep").cast("double") / lit(1e14)
    intra.join(sep, "cluster")
      .select(col("cluster"), col("n"),
        (round(cohesion, 4) + lit(0.0)).as("cohesion"),
        (round(separation, 4) + lit(0.0)).as("separation"),
        (round(cohesion / separation, 4) + lit(0.0)).as("ratio"))
      .orderBy("cluster")
  }

  /** Exact AUC of "embedding dim-0 predicts label ≤ 4" via the
    * Mann-Whitney U statistic over a FIXED score lattice: scores bucket
    * to e2 cells (shifted positive first — trunc-vs-floor on negatives
    * differs across engines), the per-bucket (pos, neg) histogram is
    * tiny and bounded by the value range at any corpus size, and
    * 2U = Σ_b pos_b·(2·negBelow_b + neg_b) counts discordant pairs
    * exactly (within-bucket ties at half credit). No global sort, no
    * N² — the rank statistic becomes one histogram + one bounded theta
    * re-sum.
    */
  def q_auc_rank(spark: SparkSession, sf: String): DataFrame = {
    val scored = Tables.embeddings(spark, sf)
      .select(when(col("label") <= 4, 1L).otherwise(0L).as("y"),
        element_at(Vectors.q7(col("embedding")), 1).as("x"))
      .select(col("y"), expr("(x + 1000000000) div 100000").as("b"))
    val hist = scored.groupBy(col("b"))
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val below = hist.as("a")
      .join(hist.select(col("b").as("b2"), col("nn").as("nn2")).as("x"),
        col("b2") < col("a.b"), "left_outer")
      .groupBy(col("a.b").as("b"), col("a.np").as("np"), col("a.nn").as("nn"))
      .agg(coalesce(sum(col("nn2")), lit(0L)).as("below"))
    below
      .agg(
        sum(col("np")).as("p"), sum(col("nn")).as("n"),
        sum(col("np") * (lit(2L) * col("below") + col("nn"))).as("u2"))
      .select(col("p"), col("n"),
        (round(col("u2").cast("double") /
          (lit(2.0) * col("p").cast("double") * col("n").cast("double")), 6)
          + lit(0.0)).as("auc"))
  }

  /** Cold-item coverage per brand (the recsys cold-start report): of the
    * parts ever sold, how many never co-occur with another part in any
    * order — those get no collaborative signal. n_catalog from the part
    * dim, n_sold / n_cooccur from the order-item table, cold share e4.
    */
  def q_coverage_cold_items(spark: SparkSession, sf: String): DataFrame = {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val basketSize = items.groupBy(col("ok")).agg(count(lit(1)).as("bsz"))
    val partStats = items.join(basketSize, "ok")
      .groupBy(col("pk"))
      .agg(max(when(col("bsz") >= 2, 1L).otherwise(0L)).as("cooccurs"))
    val p = Tables.part(spark, sf).select(col("p_partkey"), col("p_brand"))
    p.join(partStats, col("p_partkey") === col("pk"), "left_outer")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_catalog"),
        sum(when(col("pk").isNotNull, 1L).otherwise(0L)).as("n_sold"),
        sum(coalesce(col("cooccurs"), lit(0L))).as("n_cooccur"))
      .select(col("p_brand"), col("n_catalog"), col("n_sold"), col("n_cooccur"),
        expr("CASE WHEN n_sold = 0 THEN -1" +
          " ELSE (n_sold - n_cooccur) * 10000 div n_sold END").as("cold_share_e4"))
      .orderBy("p_brand")
  }

  /** Weight-of-evidence binning of quantity against the 'R' return-flag
    * target (the credit-scoring categorical encoding): quantity deciles
    * against broadcast percentile boundaries, per bin the good/bad
    * counts and WOE = ln((good·BAD)/(bad·GOOD)) on the e4 LN lattice —
    * NULL where a cell is empty (both engines agree on the sentinel).
    */
  def q_woe_binning(spark: SparkSession, sf: String): DataFrame = {
    val v = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("q"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("bad"))
    val bounds = v.agg(percentile(col("q"),
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("bs"))
    val binned = v.crossJoin(broadcast(bounds))
      .select(expr("1 + size(filter(bs, b -> q > b))").cast("long").as("bin"), col("bad"))
      .groupBy(col("bin"))
      .agg(sum(lit(1L) - col("bad")).as("good"), sum(col("bad")).as("bad"))
    val totals = binned.agg(sum(col("good")).as("tg"), sum(col("bad")).as("tb"))
    binned.crossJoin(broadcast(totals))
      .select(col("bin"), col("good"), col("bad"),
        when(col("good") > 0 && col("bad") > 0,
          round(log((col("good").cast("double") * col("tb").cast("double")) /
            (col("bad").cast("double") * col("tg").cast("double"))) * lit(1e4)).cast("long"))
          .as("woe_e4"))
      .orderBy("bin")
  }

  /** Per-group OLS (the per-segment model fit a feature pipeline runs
    * after pooled regression — the Simpson's-paradox check): slope /
    * intercept / r² of extendedprice ~ quantity per return flag, exact
    * integer sufficient statistics and the identical IEEE epilogue of
    * [[q_linreg_normal]]. Still one partial+final aggregate.
    */
  def q_grouped_regression(spark: SparkSession, sf: String): DataFrame = {
    val sums = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"), cents(col("l_extendedprice")).as("y"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * syD
    val denX = nD * col("sxx").cast("double") - sxD * sxD
    sums.select(col("flag"), col("n"),
      (round(num / denX, 4) + lit(0.0)).as("slope"),
      (round((syD - (num / denX) * sxD) / nD, 4) + lit(0.0)).as("intercept"),
      (round((num * num) / (denX * (nD * col("syy").cast("double") - syD * syD)), 4)
        + lit(0.0)).as("r2"))
      .orderBy("flag")
  }

  /** Precision/recall curve for the [[q_auc_rank]] scorer ("embedding
    * dim 0 predicts label ≤ 4") at five score-quantile thresholds:
    * predicted-positive = score ≥ threshold, exact confusion counts per
    * threshold, e4 metrics with −1 sentinels. The thresholds come from
    * one percentile aggregate; the scan then fans out ×5 against the
    * broadcast threshold row — never a per-threshold rescan.
    */
  def q_pr_curve(spark: SparkSession, sf: String): DataFrame = {
    val scored = Tables.embeddings(spark, sf)
      .select(when(col("label") <= 4, 1L).otherwise(0L).as("y"),
        element_at(Vectors.q7(col("embedding")), 1).as("x"))
    val thr = scored.agg(percentile(col("x"),
      array(Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(lit): _*)).as("ts"))
    scored.crossJoin(broadcast(thr))
      .select(col("y"), col("x"), posexplode(col("ts")).as(Seq("i", "t")))
      .groupBy((col("i") + 1).cast("long").as("threshold_idx"))
      .agg((round(max(col("t")), 4) + lit(0.0)).as("threshold"),
        sum(when(col("x") >= col("t") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("x") >= col("t") && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(col("x") < col("t") && col("y") === 1L, 1L).otherwise(0L)).as("fn"))
      .select(col("threshold_idx"), col("threshold"), col("tp"), col("fp"), col("fn"),
        expr("CASE WHEN tp + fp = 0 THEN -1 ELSE tp * 10000 div (tp + fp) END").as("precision_e4"),
        expr("CASE WHEN tp + fn = 0 THEN -1 ELSE tp * 10000 div (tp + fn) END").as("recall_e4"))
      .orderBy("threshold_idx")
  }

  /** Item-item co-occurrence lift (the collaborative-filtering "people
    * who bought X also bought Y" score): for part pairs co-ordered ≥ 2
    * times, lift = P(a,b)/(P(a)·P(b)) as an exact e4 integer —
    * `s12·N·10⁴ div (s1·s2)` over the distinct order-item table. Top-30
    * by (lift desc, pair). The pair space is per-order (bounded by basket
    * size); item supports are a broadcastable dimension at any scale.
    */
  def q_recsys_lift(spark: SparkSession, sf: String): DataFrame = {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .localCheckpoint()
    val n = items.select(col("ok")).distinct().agg(count(lit(1)).as("n_orders"))
    val support = items.groupBy(col("pk")).agg(count(lit(1)).as("s"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("s12"))
      .filter(col("s12") >= 2)
    pairs
      .join(broadcast(support.select(col("pk").as("p1"), col("s").as("s1"))), "p1")
      .join(broadcast(support.select(col("pk").as("p2"), col("s").as("s2"))), "p2")
      .crossJoin(broadcast(n))
      .select(col("p1"), col("p2"), col("s12"), col("s1"), col("s2"),
        expr("s12 * n_orders * 10000 div (s1 * s2)").as("lift_e4"))
      .orderBy(col("lift_e4").desc, col("p1").asc, col("p2").asc)
      .limit(30)
  }

  /** Ridge regression (closed form, 2 features, λ=1000, no intercept):
    * solve (XᵀX + λI)w = Xᵀy for y = extended-price cents over features
    * x1 = quantity, x2 = discount percent. One aggregate of six exact
    * integer sufficient statistics (the cross-moment sums in decimal —
    * long would overflow at fleet scale), then the 2×2 closed-form
    * inverse as one fixed IEEE epilogue. The canonical "normal equations
    * by sum-reduction" MapReduce pattern, one job at any data size.
    */
  def q_ridge_normal(spark: SparkSession, sf: String): DataFrame = {
    def dsum(x: Column, y: Column): Column = sum(x.cast("decimal(38,0)") * y)
    val lam = lit(1000.0)
    val s = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("x1"),
        pct(col("l_discount")).as("x2"),
        cents(col("l_extendedprice")).as("z"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("x1"), col("x1")).as("sxx"), dsum(col("x1"), col("x2")).as("sxy"),
        dsum(col("x2"), col("x2")).as("syy"), dsum(col("x1"), col("z")).as("sxz"),
        dsum(col("x2"), col("z")).as("syz"))
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    val syy = col("syy").cast("double"); val sxz = col("sxz").cast("double")
    val syz = col("syz").cast("double")
    val det = (sxx + lam) * (syy + lam) - sxy * sxy
    s.select(col("n"),
      (round(((syy + lam) * sxz - sxy * syz) / det, 6) + lit(0.0)).as("w1"),
      (round(((sxx + lam) * syz - sxy * sxz) / det, 6) + lit(0.0)).as("w2"))
  }

  /** One K-Means Lloyd iteration, k=10, seeds = vectors 0..9: assignment
    * by exact integer lattice distance (tie → lower seed), per-cluster
    * count and mean squared distance.
    */
  def q_kmeans_step(spark: SparkSession, sf: String): DataFrame = {
    val assigned = kmeansAssign(spark, sf)
    assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("d2")) / (count(lit(1)) * lit(1e14)), 4).as("mean_dist2"))
      .orderBy("cluster")
  }

  /** Iteration-1 assignment shared by step/iter2: (vec_id, cluster, d2).
    * argmin is `min(struct(d2, cluster))` — lexicographic struct ordering
    * gives the tie → lower cluster id rule inside a hash aggregate (partial
    * + final, no per-partition sort like a window would need).
    */
  private def kmeansAssign(spark: SparkSession, sf: String): DataFrame = {
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.q7(col("embedding")).as("qe"))
    val seeds = all.filter(col("vec_id") <= 9)
      .select(col("vec_id").as("cluster"), col("qe").as("seed_qe"))
    all.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cluster"), Vectors.dist2E14(col("qe"), col("seed_qe")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cluster"))).as("best"))
      .select(col("vec_id"), col("best.cluster").as("cluster"), col("best.d2").as("d2"))
  }

  /** Two unrolled Lloyd iterations: recompute centroids as per-dimension
    * means ROUND(,6) (then re-quantized to an e6 lattice), re-assign, emit
    * iteration-2 cluster sizes. Centroids live as (cluster, dim, value)
    * ROWS — per-dimension exact sums, no array aggregation, so the same
    * relational shape runs on both engines.
    */
  def q_kmeans_iter2(spark: SparkSession, sf: String): DataFrame = {
    val dims = Tables.embeddings(spark, sf)
      .select(col("vec_id"), posexplode(Vectors.q7(col("embedding"))).as(Seq("dim", "x_e7")))
    val assign1 = kmeansAssign(spark, sf).select(col("vec_id"), col("cluster"))
    // centroid per (cluster, dim): exact integer sum, one division, ROUND 6,
    // re-quantized ×1e6 → exact integer lattice again
    val centroids = dims.join(assign1, "vec_id")
      .groupBy(col("cluster"), col("dim"))
      .agg(round(round(sum(col("x_e7")) / (count(lit(1)) * lit(1e7)), 6) * 1e6)
        .cast("long").as("c_e6"))
    // iteration-2 squared distance: Σ(x_e7 − 10·c_e6)² — exact integers
    dims.join(broadcast(centroids), "dim")
      .groupBy(col("vec_id"), col("cluster"))
      .agg(sum((col("x_e7") - col("c_e6") * 10) * (col("x_e7") - col("c_e6") * 10)).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cluster"))).as("best"))
      .groupBy(col("best.cluster").as("cluster"))
      .agg(count(lit(1)).as("n"))
      .orderBy("cluster")
  }

  /** Apriori frequent pair mining: baskets = orders, items = distinct
    * l_partkey per order; pairs (p1<p2) with support ≥ 3, top-30. The
    * threshold is a flat 3 — support does NOT grow with scale factor here
    * (the item universe scales with the data, so max pair support stays ~3
    * at every SF; a scale-proportional threshold empties the output).
    * Pure integer counting — the classic MR pair-emission pattern as one
    * basket aggregate + one pair aggregate.
    */
  def q_apriori_pairs(spark: SparkSession, sf: String): DataFrame = {
    // collect each basket's distinct items once, emit ordered pairs with an
    // array HOF — one shuffle on basket + one on pair, instead of a
    // distinct + self-join (which re-shuffles the item table twice)
    val baskets = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("items"))
    baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
           transform(slice(items, i + 2, size(items)), y -> struct(x AS p1, y AS p2))))"""))
        .as("pair"))
      .groupBy(col("pair.p1").as("p1"), col("pair.p2").as("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 3L)
      .select(col("p1"), col("p2"), col("support"))
      .orderBy(col("support").desc, col("p1").asc, col("p2").asc)
      .limit(30)
  }

  /** Apriori level 3: frequent item TRIPLES per order basket, support ≥ 2,
    * top-20. Triples are generated inside the sorted basket array (three
    * nested HOF transforms over index slices — candidate count is bounded
    * by basket breadth³, data-independent), so like [[q_apriori_pairs]]
    * there is exactly one shuffle on the basket key and one on the triple.
    */
  def q_freq_triples(spark: SparkSession, sf: String): DataFrame = {
    val baskets = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("items"))
    baskets
      .select(explode(expr(
        """flatten(flatten(transform(items, (x, i) ->
           transform(slice(items, i + 2, size(items)), (y, j) ->
             transform(slice(items, i + j + 3, size(items)),
               z -> struct(x AS p1, y AS p2, z AS p3))))))"""))
        .as("t"))
      .groupBy(col("t.p1").as("p1"), col("t.p2").as("p2"), col("t.p3").as("p3"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2L)
      .orderBy(col("support").desc, col("p1").asc, col("p2").asc, col("p3").asc)
      .limit(20)
  }

  /** Sample-ratio-mismatch (SRM) check for the parity A/B assignment:
    * χ² of the two cohort sizes against 50/50 — the guardrail every
    * experiment readout runs FIRST (an SRM invalidates the experiment
    * regardless of the metric). One aggregate, one epilogue.
    */
  def q_srm_check(spark: SparkSession, sf: String): DataFrame = {
    val c = Tables.eventsWithTs(spark, sf)
      .select(col("user_id")).distinct()
      .groupBy((col("user_id") % 2).as("cohort"))
      .agg(count(lit(1)).as("n"))
    val p = c.agg(max(when(col("cohort") === 0, col("n"))).as("n0"),
      max(when(col("cohort") === 1, col("n"))).as("n1"))
    val tot = (col("n0") + col("n1")).cast("double")
    val e = tot / lit(2.0)
    val chi2 = (col("n0").cast("double") - e) * (col("n0").cast("double") - e) / e +
      (col("n1").cast("double") - e) * (col("n1").cast("double") - e) / e
    p.select(col("n0"), col("n1"),
      (round(chi2, 6) + lit(0.0)).as("chi2"),
      (chi2 > lit(3.841)).cast("long").as("srm_flag"))
  }

  /** Discount-depth effectiveness: per discount level (exact integer
    * percent) the line count, mean quantity (e4 floor) and revenue — does
    * a deeper discount actually move more units. One aggregate.
    */
  def q_discount_depth(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf)
      .groupBy(pct(col("l_discount")).as("discount_pct"))
      .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity").cast("long")).as("qty"),
        sum(cents(col("l_extendedprice"))).as("rev_cents"))
      .select(col("discount_pct"), col("n_lines"),
        expr("qty * 10000 div n_lines").as("mean_qty_e4"), col("rev_cents"))
      .orderBy("discount_pct")

  /** One-way ANOVA of embedding L2-norm across labels (e3-floored per-row
    * norms — the scale keeps the ×10⁶ between-group lattice inside int64 —
    * exact group stats, F epilogue): "does the embedding norm leak the
    * label", the representation-quality probe.
    */
  def q_norm_anova(spark: SparkSession, sf: String): DataFrame = {
    import graft.ops.{Vectors => V}
    val g = Tables.embeddings(spark, sf)
      .select(col("label").cast("long").as("label"),
        floor(sqrt(graft.functions.GraftFunctions
          .dotLong(V.q7(col("embedding")), V.q7(col("embedding"))).cast("double"))
          / lit(10000.0)).cast("long").as("x"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sg2"),
        expr("CAST(SUM(x) AS decimal(38,0)) * SUM(x) * 1000000 div COUNT(1)").as("t_e6"))
    val s = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("sg")).as("sx"), sum(col("sg2")).as("sxx"), sum(col("t_e6")).as("st_e6"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("st_e6").cast("double") / lit(1e6) -
      col("sx").cast("double") * col("sx").cast("double") / nD
    val ssw = col("sxx").cast("double") - col("st_e6").cast("double") / lit(1e6)
    s.select(col("k"), col("n"),
      (round((ssb / (kD - lit(1.0))) / (ssw / (nD - kD)), 4) + lit(0.0)).as("f_stat"))
  }

  /** Association rules for the top-10 co-purchase pairs: support,
    * directional confidences and lift, all exact e4 integer ratios from
    * basket counts (128-bit lift numerator). The step after Apriori that
    * actually ships to a recommender; one basket pass, one pair pass,
    * broadcast item supports.
    */
  def q_rule_confidence(spark: SparkSession, sf: String): DataFrame = {
    val baskets = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("items"))
      .localCheckpoint()
    val nB = baskets.agg(count(lit(1)).as("nb"))
    val itemSup = baskets.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("sup"))
    val pairSup = baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
           transform(slice(items, i + 2, size(items)), y -> struct(x AS p1, y AS p2))))"""))
        .as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= 2)
    pairSup
      .join(broadcast(itemSup.select(col("item").as("p1"), col("sup").as("sup_a"))), "p1")
      .join(broadcast(itemSup.select(col("item").as("p2"), col("sup").as("sup_b"))), "p2")
      .crossJoin(broadcast(nB))
      .select(col("p1"), col("p2"), col("sup_ab"), col("sup_a"), col("sup_b"),
        expr("sup_ab * 10000 div sup_a").as("conf_ab_e4"),
        expr("sup_ab * 10000 div sup_b").as("conf_ba_e4"),
        expr("CAST(CAST(sup_ab AS decimal(38,0)) * nb * 10000" +
          " div (CAST(sup_a AS decimal(38,0)) * sup_b) AS BIGINT)").as("lift_e4"))
      .orderBy(col("sup_ab").desc, col("p1").asc, col("p2").asc)
      .limit(10)
  }

  /** Medoid search over the first 50 vectors: the points minimizing total
    * distance to the rest of the block (e8-floored per-pair distances,
    * exact integer totals, top-3 ascending). The k-medoids seeding step,
    * as one bounded block pair join.
    */
  def q_medoid_sample(spark: SparkSession, sf: String): DataFrame = {
    import graft.ops.{Vectors => V}
    val block = Tables.embeddings(spark, sf).filter(col("vec_id") < 50)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        V.q7(col("embedding")).as("qe"))
    block.as("a")
      .join(block.select(col("vec_id").as("oid"), col("qe").as("o_qe")).as("b"),
        col("a.vec_id") =!= col("oid"))
      .select(col("a.vec_id").as("vec_id"), col("a.label").as("label"),
        graft.functions.GraftFunctions.dist2Long(col("a.qe"), col("o_qe")).as("d2"))
      .select(col("vec_id"), col("label"), expr("d2 div 1000000").as("d2_e8"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("d2_e8")).as("total_d2_e8"))
      .orderBy(col("total_d2_e8").asc, col("vec_id").asc)
      .limit(3)
  }

  /** Elbow (inertia) curve for k = 1..4: every vector assigned to the
    * nearest of the first k embeddings (fixed D5 seeds), inertia = Σ of
    * per-row e8-floored squared distances — exact integers at any corpus
    * size. One broadcast of ≤4 seed vectors, one scan per k fanned out of
    * the same assignment table; the model-selection readout before a
    * full k-means run.
    */
  def q_elbow_inertia(spark: SparkSession, sf: String): DataFrame = {
    import graft.ops.{Vectors => V}
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), V.q7(col("embedding")).as("qe"))
    val seeds = all.filter(col("vec_id") < 4)
      .select(col("vec_id").as("sid"), col("qe").as("s_qe"))
    val d = all.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("sid"),
        graft.functions.GraftFunctions.dist2Long(col("qe"), col("s_qe")).as("d2"))
    Seq(1L, 2L, 3L, 4L).map { k =>
      d.filter(col("sid") < k)
        .groupBy(col("vec_id"))
        .agg(min(col("d2")).as("best"))
        .agg(lit(k).as("k"), count(lit(1)).as("n"),
          sum(expr("best div 1000000")).as("inertia_e8"))
    }.reduce(_.unionByName(_)).orderBy("k")
  }

  /** Learning curve: OLS slope/R² of price~quantity on nested hash
    * subsets (10/20/40/80/100% by md5 of the full row key — duplicates
    * hash together, which only means they enter the same subset). The
    * "does more data still help" diagnostic; each point is the same
    * one-pass exact-sums regression on a filtered scan.
    */
  def q_learning_curve(spark: SparkSession, sf: String): DataFrame = {
    val h = graft.core.Det.hash32(concat_ws("_", col("l_orderkey"),
      col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_quantity")))
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("x"),
        cents(col("l_extendedprice")).as("y"), (h % 100).as("bucket"))
      .select(col("x"), col("y"), explode(expr("array(10, 20, 40, 80, 100)")).as("p"),
        col("bucket"))
      .filter(col("bucket") < col("p"))
    val sums = rows.groupBy(col("p").cast("long").as("pct"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val dx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val dy = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    sums.select(col("pct"), col("n"),
      (round(num / dx, 4) + lit(0.0)).as("slope"),
      (round(num * num / (dx * dy), 4) + lit(0.0)).as("r2"))
      .orderBy("pct")
  }

  /** Deterministic permutation test: the observed even/odd-user gap in
    * mean purchase value beside ten hash-permuted cohort assignments
    * (md5(user·16+replica) parity). Every replica is one filtered-scan
    * aggregate over the same per-user table; the observed row is replica
    * −1. Exceedance counting is the reader's one-liner.
    */
  def q_permutation_test(spark: SparkSession, sf: String): DataFrame = {
    val perUser = Tables.eventsWithTs(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("s"))
    val reps = perUser
      .select(col("user_id"), col("n"), col("s"),
        explode(expr("sequence(-1, 9)")).as("r"))
      .withColumn("cohort",
        when(col("r") === -1L, col("user_id") % 2)
          .otherwise(graft.core.Det.hash32(col("user_id") * 16 + col("r")) % 2))
    reps.groupBy(col("r").cast("long").as("replica"))
      .agg(
        sum(when(col("cohort") === 0, col("s")).otherwise(0L)).as("s0"),
        sum(when(col("cohort") === 0, col("n")).otherwise(0L)).as("n0"),
        sum(when(col("cohort") === 1, col("s")).otherwise(0L)).as("s1"),
        sum(when(col("cohort") === 1, col("n")).otherwise(0L)).as("n1"))
      .select(col("replica"), col("n0"), col("n1"),
        (round(col("s0").cast("double") / col("n0").cast("double") -
          col("s1").cast("double") / col("n1").cast("double"), 4) + lit(0.0))
          .as("mean_diff_cents"))
      .orderBy("replica")
  }

  /** ANOVA post-hoc pairwise z-scores between return flags on extended
    * price: per-pair mean difference over pooled standard error, straight
    * from the 3-row exact-stats aggregate (theta self-join on flag order).
    */
  def q_anova_posthoc(spark: SparkSession, sf: String): DataFrame = {
    val g = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"), cents(col("l_extendedprice")).as("v"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(expr("CAST(v AS decimal(38,0)) * v")).as("ss"))
    def m(p: String) = col(s"$p.s").cast("double") / col(s"$p.n").cast("double")
    def v(p: String) =
      (col(s"$p.ss").cast("double") -
        col(s"$p.s").cast("double") * col(s"$p.s").cast("double") / col(s"$p.n").cast("double")) /
        (col(s"$p.n").cast("double") - lit(1.0))
    g.as("a").join(g.as("b"), col("a.flag") < col("b.flag"))
      .select(col("a.flag").as("flag1"), col("b.flag").as("flag2"),
        col("a.n").as("n1"), col("b.n").as("n2"),
        (round((m("a") - m("b")) /
          sqrt(v("a") / col("a.n").cast("double") + v("b") / col("b.n").cast("double")), 4)
          + lit(0.0)).as("z"))
      .orderBy("flag1", "flag2")
  }

  /** Log-log price elasticity per part brand: regress y = ln(quantity) on
    * x = ln(unit price) — both rounded to e6 integer lattices per row, so
    * the sufficient statistics are order-free integer/decimal sums; the
    * OLS slope (= elasticity) is one IEEE epilogue over double-cast sums.
    * Same one-shuffle shape as [[q_grouped_regression]], plus the log
    * lattice that makes the slope a unit-free elasticity.
    */
  def q_price_elasticity(spark: SparkSession, sf: String): DataFrame = {
    val sums = Tables.lineitem(spark, sf)
      .join(broadcast(Tables.part(spark, sf)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        round(log(cents(col("l_extendedprice")).cast("double") /
          col("l_quantity").cast("double")) * lit(1e6)).cast("long").as("x"),
        round(log(col("l_quantity").cast("double")) * lit(1e6)).cast("long").as("y"))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * syD
    val den = nD * col("sxx").cast("double") - sxD * sxD
    sums.select(col("brand"), col("n"),
      (round(num / den, 6) + lit(0.0)).as("elasticity"),
      (round((syD - (num / den) * sxD) / nD / lit(1e6), 6) + lit(0.0))
        .as("intercept_ln"))
      .orderBy("brand")
  }

  /** Probability-calibration (reliability-diagram) bins: a deterministic
    * scoring function — soft-sign squash p = ½ + s/(2(1+|s|)) of the exact
    * e7 margin Σ(qe[1..8]) — is binned into 10 equal-width probability
    * buckets; per bin the count, floor-mean predicted probability, and
    * observed odd-label rate, all on e6 integer lattices (each row's p is
    * rounded e6 BEFORE the order-free integer sum). The squash is
    * algebraic (+,*,/,abs only), so both engines compute the identical
    * IEEE value — no libm exp() to drift. One scan, 10-row aggregate.
    */
  def q_calibration_bins(spark: SparkSession, sf: String): DataFrame = {
    val s = col("s_e7").cast("double") / lit(1e7)
    val p = lit(0.5) + s / (lit(2.0) * (lit(1.0) + abs(s)))
    Tables.embeddings(spark, sf)
      .select(col("label"),
        expr("aggregate(transform(slice(embedding, 1, 8)," +
          " v -> CAST(ROUND(CAST(v AS DOUBLE) * 1e7) AS BIGINT))," +
          " CAST(0 AS BIGINT), (a, x) -> a + x)").as("s_e7"))
      .select(col("label"), round(p * lit(1e6)).cast("long").as("p_e6"))
      .select(col("label"), col("p_e6"),
        least(lit(9L), expr("p_e6 div 100000")).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p_e6")).as("sp"),
        sum(when(col("label") % 2 === 1, 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"),
        expr("sp div n").as("mean_pred_e6"),
        expr("n_pos * 1000000 div n").as("pos_rate_e6"))
      .orderBy("bin")
  }

  /** Decile lift table — the classic scorecard readout: customers bucketed
    * into score deciles by the nine exact score percentiles (decile 1 =
    * top scores; broadcast-bounds bucketing, the same 100 TB shape as the
    * equi-depth histogram — no global NTILE sort anywhere), outcome =
    * lifetime spend above the global median. Per decile the positive rate
    * and cumulative lift as exact integer e6 ratios; the 10-row cumulative
    * is a theta self-join on the aggregate, not a partition-less window.
    */
  def q_decile_lift(spark: SparkSession, sf: String): DataFrame = {
    val spend = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("spend"))
    val med = spend.agg(percentile(col("spend"), lit(0.5)).as("m"))
    val scored = Tables.customer(spark, sf)
      .select(col("c_custkey"), cents(col("c_acctbal")).as("score"))
    val bounds = scored.agg(percentile(col("score"),
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("bounds"))
    val dec = scored
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .crossJoin(broadcast(med))
      .crossJoin(broadcast(bounds))
      .select(
        expr("10 - size(filter(bounds, b -> score > b))").cast("long").as("decile"),
        when(coalesce(col("spend"), lit(0L)).cast("double") > col("m"), 1L)
          .otherwise(0L).as("pos"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
    val tot = dec.agg(sum(col("n")).as("tot_n"), sum(col("n_pos")).as("tot_pos"))
    dec.as("a")
      .join(dec.select(col("decile").as("d2"), col("n").as("n2"),
        col("n_pos").as("p2")).as("b"), col("b.d2") <= col("a.decile"))
      .groupBy(col("a.decile").as("decile"), col("a.n").as("n"),
        col("a.n_pos").as("n_pos"))
      .agg(sum(col("b.n2")).as("cum_n"), sum(col("b.p2")).as("cum_pos"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("rate_e6"),
        expr("cum_pos * tot_n * 1000000 div (cum_n * tot_pos)").as("cum_lift_e6"))
      .orderBy("decile")
  }
}
