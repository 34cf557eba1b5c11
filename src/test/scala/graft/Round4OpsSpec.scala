package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Plan-shape + invariant gates for the round-4 additions: the scale
  * posture (broadcast small sides, hash-probe masking with NO self-join,
  * bounded theta sweeps) is part of each operator's contract.
  */
class Round4OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("matryoshka recall: recall grows with prefix width and caps at 1") {
    // the broadcast stage materializes inside the query's localCheckpoint,
    // so the outer plan can't be asserted — gate the invariant instead
    val rows = Vectors.q_matryoshka_recall(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("prefix_dims")).toSeq == Seq(8L, 16L, 32L))
    val rec = rows.map(_.getAs[Long]("recall_e6"))
    assert(rec(0) <= rec(1) + 100000 && rec(1) <= rec(2) + 100000,
      s"recall not roughly monotone in dims: ${rec.toSeq}")
    assert(rec.forall(r => r >= 0L && r <= 1000000L), rec.toSeq.toString)
  }

  test("kmedoids step: 3-row medoid table goes through a broadcast join") {
    val p = plan(Vectors.q_kmedoids_step(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
  }

  test("tukey fences: per-flag fence bounds broadcast back onto the lattice") {
    val p = plan(Analytics.q_tukey_fences(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("span corruption plan: hash probes only — the plan contains NO join at all") {
    val p = plan(TextPipeline.q_span_corruption_plan(spark, sf))
    assert(!p.contains("Join"), s"masking must not self-join:\n$p")
  }

  test("length/vocab sweeps: threshold lattices join via broadcast, never shuffle") {
    for (df <- Seq(TextPipeline.q_length_filter_sweep(spark, sf),
        TextPipeline.q_vocab_prune_sweep(spark, sf))) {
      val p = plan(df)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
    }
  }

  test("markov absorption: the <=25-cell transition matrix is broadcast in every step") {
    val p = plan(Analytics.q_markov_absorption(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("packing efficiency: padded sequences never beat the packed lower bound") {
    TextPipeline.q_packing_efficiency(spark, sf).collect().foreach { r =>
      val padded = r.getAs[Long]("seqs_padded")
      val lb = r.getAs[Long]("seqs_packed_lb")
      assert(padded >= lb, s"padded=$padded < lower bound=$lb")
      assert(r.getAs[Long]("pad_waste") >= 0L)
    }
  }

  test("span corruption: masked tokens bounded by 3x span starts and never below starts") {
    TextPipeline.q_span_corruption_plan(spark, sf).collect().foreach { r =>
      val spans = r.getAs[Long]("spans")
      val masked = r.getAs[Long]("masked")
      assert(masked >= spans && masked <= 3L * spans,
        s"spans=$spans masked=$masked outside [spans, 3*spans]")
    }
  }

  test("adjusted rand / NMI agree on the contingency margins") {
    val ari = Vectors.q_adjusted_rand(spark, sf).head()
    val nmi = Vectors.q_nmi_clusters(spark, sf).head()
    assert(ari.getAs[Long]("n") === nmi.getAs[Long]("n"))
    assert(ari.getAs[Long]("k_labels") === nmi.getAs[Long]("k_labels"))
    assert(ari.getAs[Long]("k_buckets") === nmi.getAs[Long]("k_buckets"))
    val nmiV = nmi.getAs[Double]("nmi")
    assert(nmiV >= -1e-9 && nmiV <= 1.0 + 1e-9, s"NMI out of range: $nmiV")
  }

  test("horvitz-thompson: strata partition the population and HT stays finite") {
    val rows = Sampling.q_horvitz_thompson(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_pop"))
      assert(r.getAs[Long]("ht_tokens") >= 0L)
    }
  }

  test("quartile dispersion: Q1 <= Q2 <= Q3 and QCD in [0, 1]") {
    val r = Analytics.q_quartile_dispersion(spark, sf).head()
    val (q1, q2, q3) = (r.getAs[Long]("q1"), r.getAs[Long]("q2"), r.getAs[Long]("q3"))
    assert(q1 <= q2 && q2 <= q3, s"$q1 <= $q2 <= $q3")
    val qcd = r.getAs[Double]("qcd")
    assert(qcd >= 0.0 && qcd <= 1.0, s"qcd=$qcd")
  }

  test("markov absorption: probabilities monotone in horizon and within [0, 1e6]") {
    Analytics.q_markov_absorption(spark, sf).collect().foreach { r =>
      val (p1, p2, p3) = (r.getAs[Long]("p1_e6"), r.getAs[Long]("a2_e6"),
        r.getAs[Long]("a3_e6"))
      assert(p1 <= p2 && p2 <= p3, s"absorption not monotone: $p1 $p2 $p3")
      assert(p3 <= 1000000L, s"p3=$p3 > 1")
    }
  }

  test("graph eccentricity: 5 hub seeds, hop-1 ring equals degree, ecc within bound") {
    val rows = GraphMl.q_graph_eccentricity(spark, sf).collect()
    assert(rows.length == 5, rows.length.toString)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hop1") == r.getAs[Long]("deg"),
        s"hop-1 ring must be exactly the neighbor set: $r")
      val e = r.getAs[Long]("ecc3")
      assert(e >= 1L && e <= 3L, s"ecc3=$e outside the 3-hop bound")
    }
  }

  test("diameter double sweep: lower bound dominates the first sweep's eccentricity") {
    val r = GraphMl.q_graph_diameter2sweep(spark, sf).collect().head
    val (e1, e2, lb) = (r.getAs[Long]("ecc1"), r.getAs[Long]("ecc2"),
      r.getAs[Long]("diameter_lb"))
    assert(lb == math.max(e1, e2), s"lb=$lb vs max($e1,$e2)")
    assert(r.getAs[Long]("n_reached1") >= 1L && r.getAs[Long]("n_reached2") >= 1L)
  }

  test("boruvka step: component arithmetic holds and every pick is a real merge") {
    val r = GraphMl.q_boruvka_step(spark, sf).collect().head
    val (n, picked, mutual, after) = (r.getAs[Long]("n_nodes"),
      r.getAs[Long]("n_picked"), r.getAs[Long]("n_mutual"),
      r.getAs[Long]("n_components_after"))
    assert(after == n - picked, s"$after != $n - $picked")
    assert(picked * 2 >= n, s"every node picks an edge: picked=$picked n=$n")
    assert(mutual >= 0L && mutual <= picked)
  }

  test("local bridges: degree product column is consistent and count rides along") {
    val rows = GraphMl.q_local_bridges(spark, sf).collect()
    assert(rows.length <= 10)
    val tot = rows.head.getAs[Long]("n_bridges_total")
    rows.foreach { r =>
      assert(r.getAs[Long]("degprod") ==
        r.getAs[Long]("deg_u") * r.getAs[Long]("deg_v"))
      assert(r.getAs[Long]("n_bridges_total") == tot)
      assert(tot >= rows.length.toLong)
    }
  }

  test("dsir weights: only non-target docs, scores strictly ordered with id tiebreak") {
    val rows = TextPipeline.q_dsir_weights(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[String]("lang") != "en"))
    val pairs = rows.map(r => (r.getAs[Long]("score_e6"), r.getAs[Long]("doc_id")))
    pairs.sliding(2).foreach { case Array((s1, d1), (s2, d2)) =>
      assert(s1 > s2 || (s1 == s2 && d1 < d2), s"order broken: ($s1,$d1) ($s2,$d2)")
    }
  }

  test("curriculum schedule: prefix chars reconstruct from the stage masses") {
    val rows = TextPipeline.q_curriculum_schedule(spark, sf).collect()
    var cum = 0L
    rows.sortBy(_.getAs[Long]("stage")).foreach { r =>
      assert(r.getAs[Long]("cum_chars_before") == cum, r.toString)
      cum += r.getAs[Long]("chars")
      assert(r.getAs[String]("first_docs").split(",").length
        == math.min(5L, r.getAs[Long]("n_docs")), r.toString)
    }
  }

  test("yule-walker AR(2): stationary fit with innovation variance in (0, 1]") {
    val r = Analytics.q_yule_walker_ar2(spark, sf).collect().head
    val (p1, p2) = (r.getAs[Double]("phi1"), r.getAs[Double]("phi2"))
    // stationarity triangle: |φ2| < 1, φ2 ± φ1 < 1
    assert(math.abs(p2) < 1.0 && p2 + p1 < 1.0 && p2 - p1 < 1.0, s"$p1 $p2")
    val iv = r.getAs[Double]("innovar_ratio")
    assert(iv > 0.0 && iv <= 1.0, s"innovar_ratio=$iv")
  }

  test("hampel filter: MAD never exceeds the widest deviation and flags are 0/1") {
    val rows = Analytics.q_hampel_filter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_win") >= 4L && r.getAs[Long]("n_win") <= 7L, r.toString)
      assert(r.getAs[Long]("mad_cents") >= 0L)
      assert(Set(0L, 1L).contains(r.getAs[Long]("is_outlier")))
    }
  }

  test("price indexes: Fisher is the geometric mean of Laspeyres and Paasche") {
    val r = Analytics.q_price_indexes(spark, sf).collect().head
    val (l, p, f) = (r.getAs[Long]("laspeyres_e6"), r.getAs[Long]("paasche_e6"),
      r.getAs[Long]("fisher_e6"))
    assert(math.abs(f - math.sqrt(l.toDouble * p.toDouble)) < 2.0, s"$l $p $f")
    assert(r.getAs[Long]("n_matched") >= 1L)
  }

  test("chained laspeyres: ln chain telescopes the per-month ln links") {
    val rows = Analytics.q_chained_laspeyres(spark, sf).collect()
      .sortBy(_.getAs[Long]("m"))
    assert(rows.nonEmpty)
    // each month's chain minus the previous chain ≈ the month's own ln link
    // (e6 lattice; rounding of the e9→e6 truncation allows ±1)
    rows.sliding(2).foreach { case Array(a, b) =>
      val step = b.getAs[Long]("chained_ln_e6") - a.getAs[Long]("chained_ln_e6")
      val link = math.round(math.log(b.getAs[Long]("link_e6").toDouble / 1e6) * 1e6)
      assert(math.abs(step - link) <= 2L, s"step=$step link=$link")
    case _ => ()
    }
  }

  test("als user step: item factors broadcast; solved factors are finite") {
    val df = MLDeterministic.q_als_user_step(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    df.collect().foreach { r =>
      assert(!r.getAs[Double]("u1").isNaN && !r.getAs[Double]("u2").isNaN, r.toString)
      assert(r.getAs[Long]("n_brands") >= 1L)
    }
  }

  test("slope one: deviations are antisymmetric-consistent and support-ordered") {
    val rows = MLDeterministic.q_slope_one(spark, sf).collect()
    assert(rows.length == 10)
    val supports = rows.map(_.getAs[Long]("n_corated"))
    assert(supports.sameElements(supports.sortBy(-_)), supports.toSeq.toString)
    rows.foreach(r => assert(r.getAs[String]("brand_i") < r.getAs[String]("brand_j")))
  }

  test("l-diversity: entropy never exceeds ln(l) and the flag matches l") {
    Analytics.q_l_diversity(spark, sf).collect().foreach { r =>
      val l = r.getAs[Long]("l_distinct")
      val h = r.getAs[Long]("entropy_e6").toDouble / 1e6
      assert(h <= math.log(l.toDouble) + 1e-4, s"h=$h > ln($l)")
      assert(r.getAs[Long]("ok_l3") == (if (l >= 3) 1L else 0L))
    }
  }

  test("forecast reconcile: top-down allocations sum to roughly the direct total") {
    val rows = Analytics.q_forecast_reconcile(spark, sf).collect()
    assert(rows.nonEmpty)
    val td = rows.map(_.getAs[Long]("td_fc_cents")).sum
    // e6-share truncation loses at most 1e-6 of the total per nation
    assert(td >= 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("bu_abs_err") ==
        math.abs(r.getAs[Long]("actual_cents") - r.getAs[Long]("bu_fc_cents")))
    }
  }

  test("jones-plassmann: the selected set is independent by construction") {
    val r = GraphMl.q_jones_plassmann(spark, sf).collect().head
    assert(r.getAs[Long]("n_conflicts") == 0L, r.toString)
    assert(r.getAs[Long]("n_colored") >= 1L)
    assert(r.getAs[Long]("n_colored") <= r.getAs[Long]("n_nodes"))
  }

  test("spectral bisection: partition sizes cover the graph, cuts within edge count") {
    val r = GraphMl.q_spectral_bisection_step(spark, sf).collect().head
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") >= 1L)
    assert(r.getAs[Long]("cut_before") >= 0L && r.getAs[Long]("cut_after") >= 0L)
  }

  test("densest subgraph peel: removal arithmetic holds and edges only shrink") {
    val r = GraphMl.q_densest_subgraph_peel(spark, sf).collect().head
    assert(r.getAs[Long]("n_removed") == r.getAs[Long]("n0") - r.getAs[Long]("n1"))
    assert(r.getAs[Long]("m1") <= r.getAs[Long]("m0"))
    assert(r.getAs[Long]("rho1_e6") >= 0L)
  }

  test("lb_keogh: the bound is nonnegative and exceed days are counted days") {
    val r = Analytics.q_lbkeogh_bound(spark, sf).collect().head
    assert(r.getAs[Long]("lb_dollars2") >= 0L)
    assert(r.getAs[Long]("n_exceed") <= r.getAs[Long]("n_days"))
    assert(r.getAs[Long]("n_nowindow") <= r.getAs[Long]("n_days"))
  }

  test("friendship paradox: neighbor mean dominates the plain mean (Feld)") {
    val r = GraphMl.q_friendship_paradox(spark, sf).collect().head
    assert(r.getAs[Long]("mean_neighbor_deg_e4") >= r.getAs[Long]("mean_deg_e4"),
      r.toString)
    assert(r.getAs[Double]("paradox_ratio") >= 1.0 - 1e-9)
  }

  test("attribute assortativity: r is a proper correlation in [-1, 1]") {
    val r = GraphMl.q_attribute_assortativity(spark, sf).collect().head
    val a = r.getAs[Double]("assortativity_r")
    assert(a >= -1.0 && a <= 1.0, a.toString)
    assert(r.getAs[Long]("trace") <= r.getAs[Long]("n_directed_edges"))
  }

  test("error budget burn: cumulative counts are monotone and remaining <= 1e6") {
    val rows = Analytics.q_error_budget_burn(spark, sf).collect()
      .sortBy(_.getAs[Long]("day"))
    var (pn, pe) = (0L, 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("cum_n") >= pn && r.getAs[Long]("cum_err") >= pe)
      pn = r.getAs[Long]("cum_n"); pe = r.getAs[Long]("cum_err")
      assert(r.getAs[Long]("budget_remaining_e6") <= 1000000L)
    }
  }

  test("adstock correlation: both correlations are in [-1, 1]") {
    val r = Analytics.q_adstock_correlation(spark, sf).collect().head
    for (c <- Seq(r.getAs[Double]("corr_raw"), r.getAs[Double]("corr_adstock")))
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, c.toString)
  }

  test("recurrence quantification: shares are proper fractions of the pair space") {
    val r = Analytics.q_recurrence_quantification(spark, sf).collect().head
    assert(r.getAs[Long]("n_rec") <= r.getAs[Long]("n_pairs"))
    assert(r.getAs[Long]("n_diag") <= r.getAs[Long]("n_rec"))
    assert(r.getAs[Long]("rr_e6") <= 1000000L && r.getAs[Long]("det_e6") <= 1000000L)
  }

  test("cornish-fisher: CF quantile moves toward the empirical one vs normal") {
    val r = Analytics.q_cornish_fisher(spark, sf).collect().head
    // not a theorem, but on any unimodal daily-revenue series the third/fourth
    // moment correction must stay finite and the normal/CF quantiles bracket
    // a sane range around the empirical quantile
    for (c <- Seq("q95_normal", "q95_cf"))
      assert(!r.getAs[Double](c).isNaN && r.getAs[Double](c) > 0.0, c)
    assert(r.getAs[Long]("q95_emp") > 0L)
  }

  test("pinball loss: two tau rows, p90 prediction dominates p50") {
    val rows = Analytics.q_pinball_loss(spark, sf).collect()
      .sortBy(_.getAs[Long]("tau_e2"))
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("tau_e2") == 50L && rows(1).getAs[Long]("tau_e2") == 90L)
    assert(rows(1).getAs[Long]("q_pred_cents") >= rows(0).getAs[Long]("q_pred_cents"))
    rows.foreach(r => assert(r.getAs[Long]("loss_e2") >= 0L))
  }

  test("closest pair 2d: candidates go through a hash join on the cell key") {
    val df = Vectors.q_closest_pair_2d(spark, sf)
    val r = df.collect().head
    assert(r.getAs[Long]("d2_e14") >= 0L)
    assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
    assert(r.getAs[Long]("n_candidates") >= 1L)
  }

  test("zorder locality: z buckets are tighter than hash buckets") {
    val rows = Vectors.q_zorder_bucket_tightness(spark, sf).collect()
      .map(r => r.getAs[String]("scheme") -> r.getAs[Long]("avg_d2_e4")).toMap
    assert(rows("zorder") < rows("hash"),
      s"Z-order must improve locality: $rows")
  }

  test("rle benefit: runs bounded by rows, ratio at least 1x") {
    Relational.q_rle_benefit(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_runs") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("rows_per_run_e4") >= 10000L)
    }
  }

  test("probabilistic counting lineage: estimates bracket the exact count sanely") {
    Sketches.q_linear_counting(spark, sf).collect().foreach { r =>
      val est = r.getAs[Long]("est")
      if (est >= 0) // unsaturated
        assert(est >= r.getAs[Long]("n_hit"), s"LC est below bitmap occupancy: $r")
      else assert(r.getAs[Long]("n_hit") == 1024L)
    }
    Sketches.q_fm_sketch(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("max_rho") >= 0L && r.getAs[Long]("max_rho") <= 32L)
      assert(r.getAs[Long]("est") >= 1L)
    }
    Sketches.q_pcsa(spark, sf).collect().foreach { r =>
      val (est, ex) = (r.getAs[Long]("est"), r.getAs[Long]("n_exact"))
      // the error band only applies in PCSA's valid regime n >> m; below
      // that the documented small-range bias floors the estimate near m/φ
      if (ex >= 5 * 64)
        assert(est >= ex / 3 && est <= ex * 3, s"PCSA off: est=$est exact=$ex")
      else assert(est >= 1L)
    }
  }

  test("process bottleneck: transitions are well-supported with sane gaps") {
    Analytics.q_process_bottleneck(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n") >= 5L)
      assert(r.getAs[Long]("mean_gap_us") >= 0L)
      assert(r.getAs[Long]("is_rework") ==
        (if (r.getAs[String]("from_type") == r.getAs[String]("to_type")) 1L else 0L))
    }
  }

  test("graph null model + percolation: coefficients and thresholds are proper") {
    val c = Analytics.q_clustering_null_model(spark, sf).collect().head
    assert(c.getAs[Double]("c_global") >= 0.0 && c.getAs[Double]("c_global") <= 1.0)
    assert(c.getAs[Double]("c_random") > 0.0)
    val p = Analytics.q_percolation_threshold(spark, sf).collect().head
    assert(p.getAs[Double]("kappa") > 0.0)
    assert(p.getAs[Double]("p_critical") > 0.0 && p.getAs[Double]("p_critical") <= 1.0)
  }

  test("yannakakis: reduction is monotone and the join never exceeds reduced orders") {
    val rows = Relational.q_yannakakis_reduction(spark, sf).collect()
      .map(r => r.getAs[String]("relation") -> r).toMap
    for ((_, r) <- rows if r.getAs[String]("relation") != "__join_result__") {
      assert(r.getAs[Long]("rows_down") <= r.getAs[Long]("rows_raw"))
      assert(r.getAs[Long]("rows_up") <= r.getAs[Long]("rows_down"))
    }
    assert(rows("__join_result__").getAs[Long]("rows_raw") ==
      rows("orders").getAs[Long]("rows_down"))
  }

  test("fd discovery: key-based FDs hold, attribute FDs report violations") {
    val m = Relational.q_fd_discovery(spark, sf).collect()
      .map(r => r.getAs[String]("lhs") -> r).toMap
    assert(m("customer.c_custkey").getAs[Long]("holds") == 1L)
    assert(m("orders.o_orderkey").getAs[Long]("holds") == 1L)
    assert(m("part.p_partkey").getAs[Long]("holds") == 1L)
    m.values.foreach(r => assert(r.getAs[Long]("extra_rhs_values") >= 0L))
  }

  test("factorized join count: the semiring identity holds on both joins") {
    Relational.q_factorized_join_count(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("identity_holds") == 1L, r.toString)
    }
  }

  test("condorcet: copeland bounded by opponents, at most one condorcet winner") {
    val rows = Analytics.q_condorcet_copeland(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, l) = (r.getAs[Long]("majority_wins"), r.getAs[Long]("majority_losses"))
      assert(r.getAs[Long]("copeland_score") == w - l, r.toString)
    }
    assert(rows.map(_.getAs[Long]("is_condorcet_winner")).sum <= 1L)
  }

  test("rank fusion: rrf scores positive and rank spread well-ordered") {
    Analytics.q_rrf_fusion(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("rrf_e9") > 0L)
      assert(r.getAs[Long]("best_rank") <= r.getAs[Long]("worst_rank"))
    }
  }

  test("kemeny distance: discordant pairs within the pair universe") {
    Analytics.q_kemeny_distance(spark, sf).collect().foreach { r =>
      val (d, n) = (r.getAs[Long]("discordant"), r.getAs[Long]("n_pairs"))
      assert(d >= 0L && d <= n, r.toString)
      assert(r.getAs[Long]("kemeny_dist_e6") <= 1000000L)
    }
  }

  test("bradley-terry: strengths positive, iteration-2 ranks a permutation") {
    val got = Analytics.q_bradley_terry_step(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Long]("w2_e3") > 0L, r.toString))
    val r2 = got.map(_.getAs[Long]("rank_iter2")).toSeq
    assert(r2 == r2.sorted && r2.distinct.size == r2.size, r2.toString)
  }

  test("shannon code bound: per-symbol ceil-log2 dominates the entropy term") {
    val rows = Relational.q_shannon_code_bound(spark, sf).collect()
    assert(rows.nonEmpty)
    var meanLen = 0L; var entropy = 0.0
    rows.foreach { r =>
      val contrib = r.getAs[Long]("contribution_bits_e6")
      val term = r.getAs[Double]("entropy_term")
      assert(contrib + 1 >= math.round(term * 1e6), r.toString)
      meanLen += contrib; entropy += term
    }
    // H <= L < H+1 (Shannon code optimality band), at e6 slack for lattices
    assert(meanLen >= math.round(entropy * 1e6) - rows.length)
    assert(meanLen < math.round((entropy + 1.0) * 1e6) + rows.length)
  }

  test("delta bits: widths in [0,64] and gap count = events minus users") {
    val rows = Relational.q_delta_bits_audit(spark, sf).collect()
    rows.foreach { r =>
      val w = r.getAs[Long]("width_bits")
      assert(w >= 0L && w <= 64L)
      assert(r.getAs[Long]("saved_bits") == (64L - w) * r.getAs[Long]("n_gaps"))
    }
    val ev = graft.core.Tables.table(spark, sf, "events")
    val expected = ev.count() -
      ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == expected)
  }

  test("dict encoding: index bits are exact ceil-log2 and dict always wins here") {
    Relational.q_dict_encoding_audit(spark, sf).collect().foreach { r =>
      val d = r.getAs[Long]("n_distinct")
      val want = if (d <= 1) 0L
        else (64 - java.lang.Long.numberOfLeadingZeros(d - 1)).toLong
      assert(r.getAs[Long]("index_bits") == want, r.toString)
      assert(r.getAs[Long]("dict_bits") < r.getAs[Long]("raw_bits"), r.toString)
      assert(r.getAs[Long]("savings_e4") > 0L, r.toString)
    }
  }

  test("agm bound: the triangle join never exceeds m^1.5") {
    val r = Analytics.q_agm_bound(spark, sf).collect().head
    assert(r.getAs[Long]("triangle_join_actual") <= r.getAs[Long]("agm_bound"),
      r.toString)
    assert(r.getAs[Long]("tightness_e6") <= 1000000L)
  }

  test("avi selectivity: marginals reconstruct n and q-errors >= 1") {
    val rows = Relational.q_avi_selectivity(spark, sf).collect()
    assert(rows.length >= 6)
    val n = rows.map(_.getAs[Long]("actual_rows")).sum
    val statuses = rows.map(_.getAs[String]("o_orderstatus")).distinct
    val nFromMarginal = rows.groupBy(_.getAs[String]("o_orderstatus"))
      .map(_._2.head.getAs[Long]("n_status")).sum
    assert(n == nFromMarginal, s"$n != $nFromMarginal over $statuses")
    rows.foreach(r => assert(r.getAs[Long]("q_error_e4") >= 10000L, r.toString))
  }

  test("histogram selectivity: estimates within one bucket of actual") {
    Relational.q_histogram_selectivity(spark, sf).collect().foreach { r =>
      // equi-width interpolation error is bounded by the two edge buckets
      assert(r.getAs[Long]("est_rows") >= 0L)
      assert(r.getAs[Long]("q_error_e4") < 100000L,
        s"estimate off by >10x — histogram broken: $r")
    }
  }

  test("smoothing family: WB/JM/backoff probabilities in (0,1], seen beats unseen ML") {
    for (df <- Seq(Text.q_witten_bell(spark, sf), Text.q_jelinek_mercer(spark, sf))) {
      val ps = df.collect().map(_.getDouble(3))
      assert(ps.forall(p => p > 0.0 && p <= 1.0), ps.toSeq.toString)
      assert(ps.toSeq == ps.toSeq.sortBy(-_), "not ordered by probability")
    }
    val sb = Text.q_stupid_backoff(spark, sf).collect()
    assert(sb.exists(_.getAs[Long]("seen_bigram") == 1L))
    sb.foreach(r => assert(r.getAs[Double]("s_backoff") > 0.0, r.toString))
  }

  test("prefixspan pairs: support bounded by both type populations") {
    Events.q_prefixspan_pairs(spark, sf).collect().foreach { r =>
      val s = r.getAs[Long]("support_users")
      assert(s <= r.getAs[Long]("users_a") && s <= r.getAs[Long]("users_b"),
        r.toString)
      assert(r.getAs[Long]("confidence_e4") <= 10000L)
    }
  }

  test("gsp window: 24h-constrained support never exceeds the any-gap support") {
    Events.q_gsp_windowed_pairs(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("support_24h") <= r.getAs[Long]("support_any_gap"),
        r.toString)
      val loss = r.getAs[Long]("window_loss_e4")
      assert(loss >= 0L && loss <= 10000L)
    }
  }

  test("contrast sequences: rates are e4 shares and contrast is their gap") {
    Events.q_contrast_sequences(spark, sf).collect().foreach { r =>
      val (h, l) = (r.getAs[Long]("rate_high_e4"), r.getAs[Long]("rate_low_e4"))
      assert(h >= 0L && h <= 10000L && l >= 0L && l <= 10000L)
      assert(r.getAs[Long]("contrast_e4") == math.abs(h - l))
    }
  }

  test("count-min: estimates always overcount and respect the e*N/w bound") {
    Sketches.q_count_min_sketch(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_cnt"), r.toString)
      assert(r.getAs[Long]("within_bound") == 1L, r.toString)
    }
  }

  test("space-saving: guarantee band grows with k") {
    val rows = Sketches.q_spacesaving_guarantee(spark, sf).collect()
      .sortBy(_.getAs[Long]("k"))
    val g = rows.map(_.getAs[Long]("n_guaranteed"))
    assert(g.sameElements(g.sorted), g.toSeq.toString)
    rows.foreach(r => assert(r.getAs[Long]("guaranteed_share_e4") <= 10000L))
  }

  test("lossy counting: the three bands partition the item universe") {
    Sketches.q_lossy_counting_bands(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_guaranteed_in") >= 0L)
      assert(r.getAs[Long]("n_maybe") >= 0L, r.toString)
      assert(r.getAs[Long]("n_guaranteed_out") >= 0L)
      assert(r.getAs[Long]("bucket_width") * r.getAs[Long]("m") >= 2500L)
    }
  }

  test("HRU view selection: top pre-materialized, two distinct greedy picks") {
    val rows = Relational.q_view_selection_hru(spark, sf).collect()
    assert(rows.length == 8, rows.length.toString)
    val byRound = rows.groupBy(_.getAs[Long]("picked_round"))
    assert(byRound(0L).map(_.getAs[Long]("mask")).toSeq == Seq(7L))
    assert(byRound(1L).length == 1 && byRound(2L).length == 1)
    val apex = rows.find(_.getAs[Long]("mask") == 0L).get
    assert(apex.getAs[Long]("n_rows") == 1L)
    rows.foreach { r =>
      assert(r.getAs[Long]("benefit_r1") >= 0L && r.getAs[Long]("benefit_r2") >= 0L)
    }
    // round-2 benefit of the round-1 pick is reported as 0 (it's materialized)
    assert(byRound(1L).head.getAs[Long]("benefit_r2") == 0L)
  }

  test("bitmap runs: banded run counts equal a brute-force global scan") {
    val rows = Relational.q_bitmap_index_audit(spark, sf).collect()
    val n = rows.head.getAs[Long]("n_rows")
    assert(rows.map(_.getAs[Long]("cnt")).sum == n)
    // brute-force: count value changes over the fully-ordered column
    import spark.implicits._
    val vs = graft.core.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderstatus").as[(Long, String)]
      .collect().sortBy(_._1).map(_._2)
    val brute = vs.indices.groupBy(vs)
      .map { case (v, idx) => v -> idx.count(i => i == 0 || vs(i - 1) != v) }
    rows.foreach { r =>
      val v = r.getAs[String]("o_orderstatus")
      assert(r.getAs[Long]("n_runs") == brute(v).toLong, s"$v: $r vs ${brute(v)}")
      assert(r.getAs[Long]("n_runs") <= r.getAs[Long]("cnt"))
    }
  }

  test("fagin TA: stops early with a valid threshold certificate") {
    val rows = Relational.q_fagin_ta_rounds(spark, sf).collect()
      .sortBy(_.getAs[Long]("depth"))
    assert(rows.nonEmpty)
    // thresholds are non-increasing in depth; n_seen non-decreasing
    val thr = rows.map(_.getAs[Long]("threshold_e6"))
    assert(thr.zip(thr.tail).forall { case (a, b) => a >= b }, thr.toSeq.toString)
    val seen = rows.map(_.getAs[Long]("n_seen"))
    assert(seen.zip(seen.tail).forall { case (a, b) => a <= b })
    // only the last emitted round stops, and it carries the certificate
    assert(rows.init.forall(_.getAs[Long]("stopped") == 0L))
    val last = rows.last
    if (last.getAs[Long]("stopped") == 1L)
      assert(last.getAs[Long]("kth_score_e6") >= last.getAs[Long]("threshold_e6"))
  }

  test("t-closeness: EMD bounded by 1e6 and zero for a class matching global") {
    val rows = Analytics.q_t_closeness(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    rows.foreach { r =>
      val emd = r.getAs[Long]("emd_e6")
      assert(emd >= 0L && emd <= 1000000L, r.toString)
      assert((r.getAs[Long]("violates_t15") == 1L) == (emd > 150000L))
    }
  }

  test("discernibility metric: DM shrinks and min EC grows up the lattice") {
    val rows = Analytics.q_discernibility_metric(spark, sf).collect()
      .sortBy(_.getAs[String]("level"))
    assert(rows.map(_.getAs[String]("level")).toSeq ==
      Seq("g0_nat_seg_band", "g1_nat_seg", "g2_nat", "g3_top"))
    val minEc = rows.map(_.getAs[Long]("min_ec"))
    assert(minEc.zip(minEc.tail).forall { case (a, b) => a <= b }, minEc.toSeq.toString)
    val nEc = rows.map(_.getAs[Long]("n_ec"))
    assert(nEc.zip(nEc.tail).forall { case (a, b) => a >= b })
    assert(rows.last.getAs[Long]("n_ec") == 1L)
    assert(rows.last.getAs[Long]("n_suppressed") == 0L)
  }

  test("NCP: penalty grows with band width and with nation generalization") {
    val rows = Analytics.q_ncp_generalization(spark, sf).collect()
    assert(rows.length == 6)
    val byGen = rows.groupBy(_.getAs[Long]("generalize_nation"))
    byGen.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("w_cents"))
      val ncp = sorted.map(_.getAs[Long]("avg_num_ncp_e6"))
      assert(ncp.zip(ncp.tail).forall { case (a, b) => a <= b }, ncp.toSeq.toString)
    }
    rows.foreach { r =>
      val cat = r.getAs[Long]("avg_cat_ncp_e6")
      if (r.getAs[Long]("generalize_nation") == 0L) assert(cat == 0L)
      else assert(cat > 0L && cat <= 1000000L, r.toString)
    }
  }

  test("fellegi-sunter: full pattern lattice, monotone score in agreements") {
    val rows = MLDeterministic.q_fellegi_sunter(spark, sf).collect()
    assert(rows.length == 8)
    val byPat = rows.map(r => (r.getAs[Long]("a1"), r.getAs[Long]("a2"),
      r.getAs[Long]("a3")) -> r.getAs[Long]("score_e6")).toMap
    // flipping any field from disagree to agree raises the score
    for (p @ (a1, a2, a3) <- byPat.keys) {
      if (a1 == 0) assert(byPat((1L, a2, a3)) > byPat(p))
      if (a2 == 0) assert(byPat((a1, 1L, a3)) > byPat(p))
      if (a3 == 0) assert(byPat((a1, a2, 1L)) > byPat(p))
    }
    // all-agree is a match, all-disagree is a non-match
    assert(rows.find(r => r.getAs[Long]("a1") == 1 && r.getAs[Long]("a2") == 1
      && r.getAs[Long]("a3") == 1).get.getAs[Long]("decision") == 1L)
    assert(rows.find(r => r.getAs[Long]("a1") == 0 && r.getAs[Long]("a2") == 0
      && r.getAs[Long]("a3") == 0).get.getAs[Long]("decision") == -1L)
  }

  test("EM linkage step: posteriors move m up and u stays near chance") {
    val rows = MLDeterministic.q_em_linkage_step(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (u0, m1, u1) = (r.getAs[Long]("u0_e6"), r.getAs[Long]("m1_e6"),
        r.getAs[Long]("u1_e6"))
      // non-strict: at tiny SF a rare field may have zero agreeing pairs,
      // collapsing both re-estimates to 0
      assert(m1 >= u1, s"m should not fall below u after one step: $r")
      assert(u0 >= 0L && u0 <= 1000000L && u1 >= 0L && u1 <= 1000000L)
      val l = r.getAs[Long]("lambda1_e6")
      assert(l >= 0L && l <= 1000000L, r.toString)
    }
  }

  test("linkage threshold sweep: match counts fall monotonically") {
    val rows = MLDeterministic.q_linkage_threshold_sweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("t_e6"))
    assert(rows.length == 9)
    val m = rows.map(_.getAs[Long]("n_match"))
    assert(m.zip(m.tail).forall { case (a, b) => a >= b }, m.toSeq.toString)
    assert(rows.forall(r => r.getAs[Long]("match_share_e6") <= 1000000L))
  }

  test("max-min fairness: allocations sum to capacity, never exceed demand") {
    val rows = Analytics.q_maxmin_fairness(spark, sf).collect()
    assert(rows.length == 5)
    val totalDem = rows.map(_.getAs[Long]("demand_cents")).sum
    val totalAlloc = rows.map(_.getAs[Long]("alloc_cents")).sum
    assert(totalAlloc == totalDem * 6 / 10, s"$totalAlloc vs ${totalDem * 6 / 10}")
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_cents") <= r.getAs[Long]("demand_cents"), r.toString)
      if (r.getAs[Long]("satisfied") == 1L)
        assert(r.getAs[Long]("alloc_cents") == r.getAs[Long]("demand_cents"))
    }
  }

  test("apportionment: both methods hand out exactly 20 seats") {
    val dh = Analytics.q_dhondt_apportionment(spark, sf).collect()
    val ha = Analytics.q_hamilton_apportionment(spark, sf).collect()
    assert(dh.map(_.getAs[Long]("seats")).sum == 20L)
    assert(ha.map(_.getAs[Long]("seats")).sum == 20L)
    // Hamilton always stays inside quota
    ha.foreach { r =>
      val fl = r.getAs[Long]("floor_quota")
      assert(r.getAs[Long]("seats") == fl || r.getAs[Long]("seats") == fl + 1L)
    }
    // D'Hondt never violates LOWER quota (Jefferson property)
    dh.foreach { r =>
      assert(r.getAs[Long]("seats") >= r.getAs[Long]("lower_quota"), r.toString)
    }
  }

  test("isotonic fit: output is monotone and preserves order of magnitude") {
    val rows = Analytics.q_isotonic_fit(spark, sf).collect()
      .sortBy(_.getAs[Long]("month_idx"))
    assert(rows.length >= 12)
    val iso = rows.map(_.getAs[Long]("iso_e4"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      "isotonic fit must be non-decreasing")
    // fit stays inside the observed range
    val obs = rows.map(_.getAs[Long]("obs_e4"))
    iso.foreach(v => assert(v >= obs.min && v <= obs.max))
    // at least one pooled month exists iff the raw series has violations
    val rawViolations = obs.zip(obs.tail).count { case (a, b) => b < a }
    if (rawViolations > 0) assert(rows.exists(_.getAs[Long]("pooled") == 1L))
  }

  test("isotonic calibration: monotone rates bounded by [0, 1e6]") {
    val rows = Analytics.q_isotonic_calibration(spark, sf).collect()
      .sortBy(_.getAs[Long]("band"))
    val iso = rows.map(_.getAs[Long]("iso_rate_e6"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    iso.foreach(v => assert(v >= 0L && v <= 1000000L))
  }

  test("monotone violations: counts are consistent with the pair total") {
    val r = Analytics.q_monotone_violations(spark, sf).collect().head
    assert(r.getAs[Long]("n_violations") <= r.getAs[Long]("n_pairs"))
    assert(r.getAs[Long]("violation_share_e4") <= 10000L)
    if (r.getAs[Long]("n_violations") == 0L)
      assert(r.getAs[Long]("down_mass_e4") == 0L)
  }

  test("rendezvous hashing: every key placed, roughly balanced") {
    val rows = Relational.q_rendezvous_hashing(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      // within 5x of ideal on the tiny fixture; tightens with scale
      assert(r.getAs[Long]("share_e6") < 625000L, r.toString)
    }
  }

  test("hrw failover: only node 3's keys move, totals conserved") {
    val rows = Relational.q_hrw_failover(spark, sf).collect()
    val n3 = rows.find(_.getAs[Long]("node") == 3L).get
    assert(n3.getAs[Long]("n_after") == 0L)
    val others = rows.filter(_.getAs[Long]("node") != 3L)
    // no surviving node loses keys (minimal disruption)
    others.foreach(r => assert(r.getAs[Long]("delta") >= 0L, r.toString))
    // moved keys are exactly node 3's former load
    assert(others.map(_.getAs[Long]("delta")).sum == n3.getAs[Long]("n_before"))
    // every key still lands somewhere: totals match before and after
    assert(rows.map(_.getAs[Long]("n_before")).sum ==
      rows.map(_.getAs[Long]("n_after")).sum)
  }

  test("shard move cost: HRW moves far fewer keys than mod-N on scale-out") {
    val rows = Relational.q_shard_move_cost(spark, sf).collect()
    val hrw = rows.find(_.getAs[String]("scheme") == "hrw").get
    val modn = rows.find(_.getAs[String]("scheme") == "mod_n").get
    assert(hrw.getAs[Long]("n_keys") == modn.getAs[Long]("n_keys"))
    assert(hrw.getAs[Long]("moved_share_e6") < modn.getAs[Long]("moved_share_e6"))
    // HRW ~1/9, mod-N ~8/9 — allow wide tolerance at fixture scale
    assert(hrw.getAs[Long]("moved_share_e6") < 400000L, hrw.toString)
    assert(modn.getAs[Long]("moved_share_e6") > 600000L, modn.toString)
  }

  test("johnson rule: optimal sequence beats baseline, both above bound") {
    val rows = Analytics.q_johnson_two_machine(spark, sf).collect()
    val j = rows.find(_.getAs[String]("schedule") == "johnson").get
    val a = rows.find(_.getAs[String]("schedule") == "alphabetical").get
    assert(j.getAs[Long]("makespan") <= a.getAs[Long]("makespan"))
    rows.foreach(r =>
      assert(r.getAs[Long]("makespan") >= r.getAs[Long]("lower_bound"), r.toString))
  }

  test("SPT: shortest-processing-time minimizes total completion") {
    val rows = Analytics.q_spt_completion(spark, sf).collect()
    val s = rows.find(_.getAs[String]("schedule") == "spt").get
    val b = rows.find(_.getAs[String]("schedule") == "by_key").get
    assert(s.getAs[Long]("total_completion") <= b.getAs[Long]("total_completion"))
  }

  test("makespan bounds: lower bound shrinks with machines, UB ordering holds") {
    val rows = Analytics.q_makespan_bounds(spark, sf).collect()
      .sortBy(_.getAs[Long]("m"))
    val lbs = rows.map(_.getAs[Long]("opt_lower_bound"))
    assert(lbs.zip(lbs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("lpt_guarantee_ub") >= r.getAs[Long]("opt_lower_bound"))
      assert(r.getAs[Long]("opt_lower_bound") >= r.getAs[Long]("p_max"))
    }
  }

  test("german tank: UMVU estimate within 20% of truth, MLE never overshoots") {
    val rows = Sketches.q_german_tank(spark, sf).collect()
    assert(rows.length == 3)
    val umvu = rows.find(_.getAs[String]("estimator") == "umvu_max_gap").get
    // 20%: orderkeys are sparse (non-serial), so the serial-number model
    // undershoots by the top gap; tightens as the sample grows
    assert(umvu.getAs[Long]("err_e4") < 2000L, umvu.toString)
    val mle = rows.find(_.getAs[String]("estimator") == "mle_max").get
    assert(mle.getAs[Long]("estimate") <= mle.getAs[Long]("true_max"))
  }

  test("coupon collector: completion draws bounded by the event count") {
    val r = Sketches.q_coupon_collector(spark, sf).collect().head
    val draws = r.getAs[Long]("draws_to_complete")
    assert(draws >= r.getAs[Long]("k_types"))
    assert(draws <= r.getAs[Long]("n_events"))
    assert(r.getAs[Long]("expected_draws_e6") >=
      r.getAs[Long]("k_types") * 1000000L)
  }

  test("birthday collisions: actual pairs near the pairwise expectation") {
    val r = Sketches.q_birthday_collisions(spark, sf).collect().head
    assert(r.getAs[Long]("actual_occupied") <= r.getAs[Long]("m_buckets"))
    assert(r.getAs[Long]("actual_occupied") <= r.getAs[Long]("n_keys"))
    val (act, exp) = (r.getAs[Long]("actual_pairs"), r.getAs[Long]("expected_pairs"))
    // within 3x either way at fixture scale (small-sample noise)
    assert(act <= (exp + 1) * 3 && exp <= (act + 1) * 3, s"act=$act exp=$exp")
  }

  test("logistic fit: positive growth rate on a cumulative series") {
    val r = MLDeterministic.q_logistic_growth_fit(spark, sf).collect().head
    assert(r.getAs[Long]("slope_e6") > 0L, r.toString)
    assert(r.getAs[Long]("n_months") >= 12L)
    assert(r.getAs[Long]("k_capacity") > 0L)
  }

  test("gompertz fit: z = ln(ln(K/N)) falls over time (negative slope)") {
    val r = MLDeterministic.q_gompertz_fit(spark, sf).collect().head
    assert(r.getAs[Long]("slope_e6") < 0L, r.toString)
  }

  test("bass diffusion: imitation dominates innovation on a growing base") {
    val r = MLDeterministic.q_bass_diffusion_ols(spark, sf).collect().head
    // a > 0 (innovation inflow exists), market root positive
    assert(r.getAs[Long]("a_e4") > 0L, r.toString)
    assert(r.getAs[Long]("m_scaled_e2") > 0L, r.toString)
  }

  test("ski rental: break-even rule honors the 2-competitive bound") {
    val rows = Events.q_ski_rental(spark, sf).collect()
    val be = rows.find(_.getAs[String]("strategy") == "breakeven_rule").get
    assert(be.getAs[Long]("ratio_vs_opt_e4") <= 20000L, be.toString)
    rows.foreach(r =>
      assert(r.getAs[Long]("total_cost") >= r.getAs[Long]("opt_total"), r.toString))
  }

  test("secretary rule: success share in a plausible band around 1/e") {
    val r = Events.q_secretary_rule(spark, sf).collect().head
    assert(r.getAs[Long]("n_success") <= r.getAs[Long]("n_users"))
    val s = r.getAs[Long]("success_share_e4")
    // wide band at fixture scale; the theorem gives 0.3679 asymptotically
    assert(s > 1000L && s < 8000L, r.toString)
  }

  test("prophet threshold: picked total at least half the prophet's") {
    val r = Events.q_prophet_threshold(spark, sf).collect().head
    assert(r.getAs[Long]("ratio_e4") >= 5000L, r.toString)
    assert(r.getAs[Long]("picked_total") <= r.getAs[Long]("prophet_total"))
  }

  test("robust scale: Sn, Qn and consistent MAD agree within 3x of SD") {
    val sn = Analytics.q_sn_estimator(spark, sf).collect().head
    val qn = Analytics.q_qn_estimator(spark, sf).collect().head
    val mc = Analytics.q_mad_consistency(spark, sf).collect().head
    val sd = mc.getAs[Long]("sd_cents")
    assert(sd > 0L)
    for (v <- Seq(sn.getAs[Long]("sn_cents"), qn.getAs[Long]("qn_cents"),
      mc.getAs[Long]("mad_consistent_cents"))) {
      assert(v > 0L)
      assert(v < sd * 3 && sd < v * 3, s"scale $v too far from sd $sd")
    }
    // Qn's k stays inside the gap count C(n,2)
    val (n, k) = (qn.getAs[Long]("n_months"), qn.getAs[Long]("k"))
    assert(k >= 1L && k <= n * (n - 1) / 2)
  }

  test("DiD: double difference equals the recomputed group means") {
    val r = Analytics.q_diff_in_diff(spark, sf).collect().head
    val did = (r.getAs[Long]("t_post") - r.getAs[Long]("t_pre")) -
      (r.getAs[Long]("c_post") - r.getAs[Long]("c_pre"))
    assert(r.getAs[Long]("did_cents") == did)
  }

  test("event study: tau=-1 coefficient is exactly zero") {
    val rows = Analytics.q_event_study(spark, sf).collect()
    val base = rows.find(_.getAs[Long]("tau") == -1L).get
    assert(base.getAs[Long]("coef_cents") == 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("coef_cents") ==
        r.getAs[Long]("gap_cents") - base.getAs[Long]("gap_cents"))
    }
  }

  test("wald IV: group counts partition the customer base") {
    val r = Analytics.q_wald_iv(spark, sf).collect().head
    assert(r.getAs[Long]("n1") > 0L && r.getAs[Long]("n0") > 0L)
    assert(r.getAs[Long]("mean_x_z1_e4") > 0L)
  }

  test("auctions: second price never beats first price") {
    val rows = Analytics.q_auction_revenue(spark, sf).collect()
    val f = rows.find(_.getAs[String]("mechanism") == "first_price").get
    val s = rows.find(_.getAs[String]("mechanism") == "second_price").get
    assert(s.getAs[Long]("revenue_cents") <= f.getAs[Long]("revenue_cents"))
    assert(f.getAs[Long]("share_of_first_e4") == 10000L)
  }

  test("reserve sweep: sold count falls as the reserve rises") {
    val rows = Analytics.q_reserve_price_sweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("reserve_pct"))
    val sold = rows.map(_.getAs[Long]("n_sold"))
    assert(sold.zip(sold.tail).forall { case (a, b) => a >= b }, sold.toSeq.toString)
    rows.foreach(r => assert(r.getAs[Long]("n_sold") <= r.getAs[Long]("n_auctions")))
  }

  test("revenue equivalence: shaded first-price lands near second-price") {
    val r = Analytics.q_revenue_equivalence(spark, sf).collect().head
    val ratio = r.getAs[Long]("ratio_e4")
    // the theorem is exact only in expectation under uniform values;
    // real bid data should still land within a broad band
    assert(ratio > 5000L && ratio < 20000L, r.toString)
  }

  test("portfolio: variances positive, frontier convex with a flagged min") {
    val mv = Analytics.q_minvar_portfolio(spark, sf).collect().head
    assert(mv.getAs[Long]("var_a_scaled") > 0L && mv.getAs[Long]("var_b_scaled") > 0L)
    // |cov| <= sqrt(varA*varB) (Cauchy-Schwarz)
    val (va, vb, c) = (mv.getAs[Long]("var_a_scaled"),
      mv.getAs[Long]("var_b_scaled"), mv.getAs[Long]("cov_scaled"))
    assert(c.toDouble * c <= va.toDouble * vb * 1.000001, mv.toString)
    val fr = Analytics.q_efficient_frontier(spark, sf).collect()
    assert(fr.length == 5 && fr.count(_.getAs[Long]("is_min") == 1L) >= 1)
    fr.foreach(r => assert(r.getAs[Long]("var_num") >= 0L))
  }

  test("capm: value-weighted average beta equals one in spirit") {
    val rows = Analytics.q_capm_beta(spark, sf).collect()
    assert(rows.length == 5)
    // each segment is a modest slice of the market: betas land in a sane band
    rows.foreach { r =>
      val b = r.getAs[Long]("beta_e6")
      assert(b > -3000000L && b < 5000000L, r.toString)
    }
  }

  test("shapley: efficiency holds and every player gets at least solo value") {
    val rows = Analytics.q_shapley_coverage(spark, sf).collect()
    assert(rows.length == 3)
    val grand = rows.head.getAs[Long]("grand_value")
    assert(rows.map(_.getAs[Long]("shapley_x6")).sum == grand * 6L)
    // submodularity: each player's average marginal never beats its solo value
    rows.foreach { r =>
      assert(r.getAs[Long]("shapley_x6") >= 0L, r.toString)
      assert(r.getAs[Long]("shapley_x6") <= r.getAs[Long]("solo_value") * 6L,
        r.toString)
    }
  }

  test("anticore: submodular-game Shapley never over-allocates a coalition") {
    val rows = Analytics.q_core_stability(spark, sf).collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(r.getAs[Long]("satisfied") == 1L, r.toString))
    val abc = rows.find(_.getAs[String]("coalition") == "ABC").get
    assert(abc.getAs[Long]("slack_x6") == 0L)
  }

  test("banzhaf: powers positive and bounded by four grand values") {
    val rows = Analytics.q_banzhaf_power(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val b = r.getAs[Long]("banzhaf_x4")
      assert(b > 0L, r.toString)
    }
  }

  test("universal hashing: four draws all near the universality bound") {
    val rows = Sketches.q_universal_hash_audit(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      // any single draw can deviate, but not catastrophically
      assert(r.getAs[Long]("ratio_e4") < 50000L, r.toString)
      assert(r.getAs[Long]("collisions") >= 0L)
    }
  }

  test("fibonacci hashing: multiplier never collides worse than plain mod") {
    val rows = Sketches.q_fibonacci_hashing(spark, sf).collect()
    val fib = rows.find(_.getAs[String]("scheme") == "fibonacci").get
    val pm = rows.find(_.getAs[String]("scheme") == "plain_mod").get
    assert(fib.getAs[Long]("n") == pm.getAs[Long]("n"))
    assert(fib.getAs[Long]("collisions") <= pm.getAs[Long]("collisions") * 2,
      s"fib=${fib.getAs[Long]("collisions")} pm=${pm.getAs[Long]("collisions")}")
  }

  test("mod bias: counts conserved and imbalance well-defined") {
    val rows = Sketches.q_mod_prime_bias(spark, sf).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("occupied") <= r.getAs[Long]("m"))
      assert(r.getAs[Long]("max_load") >= r.getAs[Long]("min_load"))
    }
  }

  test("threshold cascade: active set grows monotonically from 5 seeds") {
    val rows = GraphMl.q_threshold_cascade(spark, sf).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 4)
    assert(rows.head.getAs[Long]("n_active") == 5L)
    val act = rows.map(_.getAs[Long]("n_active"))
    assert(act.zip(act.tail).forall { case (a, b) => b >= a })
    rows.tail.foreach(r => assert(r.getAs[Long]("n_new") >= 0L))
  }

  test("cascade seeds: both strategies cover at least their own seeds") {
    val rows = GraphMl.q_cascade_seed_compare(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("active_r2") >= 5L, r.toString)
      assert(r.getAs[Long]("coverage_e4") <= 10000L)
    }
  }

  test("SIS mean-field: states stay in [0,1e6] and epidemic dies iff subcritical") {
    val r = GraphMl.q_sis_meanfield(spark, sf).collect().head
    val xs = Seq("x0_e6", "x1_e6", "x2_e6", "x3_e6", "x4_e6")
      .map(r.getAs[Long])
    xs.foreach(x => assert(x >= 0L && x <= 1000000L))
    if (r.getAs[Long]("above_threshold") == 1L)
      assert(xs.last >= xs.head, s"supercritical epidemic should not die: $xs")
  }

  test("kish: effective n never exceeds actual n, deff at least 1") {
    val r = Sampling.q_kish_neff(spark, sf).collect().head
    assert(r.getAs[Long]("n_eff_e2") <= r.getAs[Long]("n_customers") * 100L)
    assert(r.getAs[Long]("deff_weighting_e4") >= 10000L)
  }

  test("raking: one cycle lands column margins and shrinks weights sanely") {
    val rows = Sampling.q_raking_step(spark, sf).collect()
    assert(rows.length == 25, rows.length.toString)
    rows.foreach { r =>
      assert(r.getAs[Long]("w_after_cycle_e3") >= 0L)
      assert(r.getAs[Long]("row_resid_e3") >= 0L)
    }
    // total mass after the cycle stays within 1% of the customer total
    val total = rows.map(_.getAs[Long]("w_after_cycle_e3")).sum
    val n = rows.map(_.getAs[Long]("n_customers")).sum
    assert(math.abs(total - n * 1000L) <= n * 10L, s"total=$total n=$n")
  }

  test("nonresponse: rates bounded and bias consistent with the means") {
    val rows = Sampling.q_nonresponse_bias(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("response_rate_e4") <= 10000L)
      assert(r.getAs[Long]("n_resp") <= r.getAs[Long]("n_frame"))
      assert(r.getAs[Long]("abs_bias_cents") ==
        math.abs(r.getAs[Long]("resp_mean_cents") - r.getAs[Long]("frame_mean_cents")))
    }
  }

  test("gumbel PWM: positive scale, return levels rise with horizon") {
    val fit = Analytics.q_gumbel_pwm_fit(spark, sf).collect().head
    assert(fit.getAs[Long]("sigma_e2") > 0L, fit.toString)
    val rl = Analytics.q_return_levels(spark, sf).collect()
      .sortBy(_.getAs[Long]("horizon_blocks"))
    val lv = rl.map(_.getAs[Long]("return_level_e2"))
    assert(lv.zip(lv.tail).forall { case (a, b) => a < b }, lv.toSeq.toString)
    // the 10-block level sits above the location parameter
    assert(lv.head > fit.getAs[Long]("mu_e2"))
  }

  test("GEV shape: finite shape with a coherent Gumbel verdict") {
    val r = Analytics.q_gev_shape_pwm(spark, sf).collect().head
    val k = r.getAs[Long]("k_shape_e6")
    assert(k > -1000000L && k < 1000000L, r.toString)
    assert((r.getAs[Long]("gumbel_adequate") == 1L) == (math.abs(k) < 100000L))
  }

  test("split conformal: empirical coverage honors the finite-sample bound") {
    val r = MLDeterministic.q_split_conformal(spark, sf).collect().head
    // the guarantee is >= 1-alpha in expectation; allow slack at tiny SF
    assert(r.getAs[Long]("coverage_e4") >= 8000L, r.toString)
    assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_test"))
    assert(r.getAs[Long]("qhat_cents") > 0L)
  }

  test("conformal sweep: tighter alpha widens the interval monotonically") {
    val rows = MLDeterministic.q_conformal_alpha_sweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("alpha_e2"))
    assert(rows.length == 3)
    // alpha 5 < 10 < 20 sorted ascending → qhat must descend
    val qh = rows.map(_.getAs[Long]("qhat_cents"))
    assert(qh.zip(qh.tail).forall { case (a, b) => a >= b }, qh.toSeq.toString)
    rows.foreach(r => assert(r.getAs[Long]("coverage_e4") <= 10000L))
  }

  test("conformal groups: per-segment coverage varies around the target") {
    val rows = MLDeterministic.q_conformal_group_coverage(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("qhat_cents")).distinct.length == 1)
    rows.foreach(r => assert(r.getAs[Long]("coverage_e4") <= 10000L))
  }

  test("logit shares: predictions form a probability vector") {
    val rows = Analytics.q_logit_shares(spark, sf).collect()
    assert(rows.length == 5)
    val pred = rows.map(_.getAs[Long]("pred_share_e6")).sum
    assert(math.abs(pred - 1000000L) <= 5L, pred.toString)
    rows.foreach(r => assert(r.getAs[Long]("pred_share_e6") > 0L))
  }

  test("logit elasticities: own negative, cross positive, IIA pattern") {
    val rows = Analytics.q_logit_elasticities(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("own_elasticity_e6") < 0L, r.toString)
      assert(r.getAs[Long]("cross_effect_e6") > 0L, r.toString)
    }
    val ls = Analytics.q_logsum_surplus(spark, sf).collect().head
    // ln of a 5-term sum of exp(~-1) values lands near ln(5) - 1
    val v = ls.getAs[Long]("logsum_e6")
    assert(v > -2000000L && v < 2000000L, v.toString)
  }

  test("chain ladder: link ratios >= 1 and reserves nonnegative") {
    val f = Analytics.q_chain_ladder_factors(spark, sf).collect()
    assert(f.map(_.getAs[Long]("dev_age")).toSeq == Seq(0L, 1L, 2L))
    // cumulative paid can only grow with age, so every link ratio >= 1
    f.foreach(r => assert(r.getAs[Long]("factor_e6") >= 1000000L, r.toString))
    val res = Analytics.q_chain_ladder_reserve(spark, sf).collect()
    res.foreach { r =>
      assert(r.getAs[Long]("reserve_cents") >= 0L, r.toString)
      assert(r.getAs[Long]("ultimate_cents") >= r.getAs[Long]("latest_cents"))
      // a fully developed origin projects exactly itself
      if (r.getAs[Long]("latest_age") == 3L)
        assert(r.getAs[Long]("reserve_cents") == 0L, r.toString)
    }
  }

  test("BF ultimate: immature origins blend toward the premium prior") {
    val rows = Analytics.q_bf_ultimate(spark, sf).collect()
    rows.foreach { r =>
      val pct = r.getAs[Long]("pct_developed_e6")
      assert(pct > 0L && pct <= 1000000L, r.toString)
      // BF never projects below what is already paid at 100% development
      if (pct == 1000000L)
        assert(r.getAs[Long]("bf_ultimate_cents") ==
          r.getAs[Long]("cl_ultimate_cents"), r.toString)
    }
    assert(rows.map(_.getAs[Long]("elr_e6")).distinct.length == 1)
  }

  test("bond math: par/premium/discount pricing and positive risk measures") {
    val px = Analytics.q_bond_pricing(spark, sf).collect()
    assert(px.nonEmpty && px.length <= 25)
    px.foreach { r =>
      val (c, y, p) = (r.getAs[Long]("coupon_bps"), r.getAs[Long]("y_bps"),
        r.getAs[Long]("price_e6"))
      // price sits on the correct side of par iff coupon vs yield
      if (c > y) assert(p > 100000000L, r.toString)
      if (c < y) assert(p < 100000000L, r.toString)
      assert(r.getAs[Long]("premium_flag") == (if (c > y) 1L else 0L))
    }
    val dur = Analytics.q_bond_duration(spark, sf).collect()
    dur.foreach { r =>
      val mac = r.getAs[Long]("macaulay_e6")
      assert(mac > 0L && mac <= r.getAs[Long]("maturity_y") * 1000000L,
        r.toString) // Macaulay duration of a coupon bond never exceeds T
      assert(r.getAs[Long]("modified_e6") < mac)
      assert(r.getAs[Long]("dv01_e6") > 0L)
    }
    Analytics.q_bond_convexity(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("convexity_e6") > 0L, r.toString)
      assert(r.getAs[Long]("price_down_e6") > r.getAs[Long]("price_up_e6"))
    }
  }

  test("cache analytics: LRU curve is monotone and banded seq has no global window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    val lru = Events.q_lru_hit_curve(spark, sf)
    val globals = lru.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w }
    assert(globals.isEmpty, "banded global sequence leaked a global window")
    val rows = lru.collect()
    assert(rows.map(_.getAs[Long]("cache_size")).toSeq ==
      Seq(16L, 64L, 256L, 1024L, 4096L))
    val rates = rows.map(_.getAs[Long]("hit_rate_e6"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
      s"hit rate must grow with cache size: ${rates.toSeq}")
    assert(rows.map(_.getAs[Long]("compulsory_misses")).distinct.length == 1)
  }

  test("reuse distance histogram covers every non-first access exactly once") {
    val h = Events.q_reuse_distance(spark, sf).collect()
    h.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 20L)
      assert(r.getAs[Long]("d_min") >= (if (b == 0L) 1L else 1L << b))
      if (b < 20L) assert(r.getAs[Long]("d_max") < (1L << (b + 1)))
    }
    val ws = Events.q_working_set_curve(spark, sf).collect()
    assert(ws.length == 3)
    // widening the window can only grow the per-window working set
    val means = ws.map(_.getAs[Long]("mean_ws_e6"))
    assert(means(0) <= means(1) && means(1) <= means(2), means.toSeq.toString)
  }

  test("life table: survivorship is monotone and qx/ex well-formed") {
    val lt = Analytics.q_life_table(spark, sf).collect()
    assert(lt.nonEmpty)
    val lx = lt.map(_.getAs[Long]("lx"))
    assert(lx.zip(lx.tail).forall { case (a, b) => a >= b },
      s"lx must be non-increasing: ${lx.toSeq}")
    lt.foreach { r =>
      val q = r.getAs[Long]("qx_e6")
      assert(q >= 0L && q <= 1000000L, r.toString)
      assert(r.getAs[Long]("ex_e6") >= 0L, r.toString)
    }
    // the oldest observed age dies with certainty (qx = 1) since lx = dx
    assert(lt.last.getAs[Long]("qx_e6") == 1000000L)
    // lexis deaths must sum to total users
    val deaths = Analytics.q_lexis_surface(spark, sf).collect()
      .map(_.getAs[Long]("deaths")).sum
    assert(deaths == lt.map(_.getAs[Long]("deaths")).sum)
    Analytics.q_mortality_gradient(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("mx_e6") > 0L && r.getAs[Long]("mx_next_e6") > 0L)
    }
  }

  test("NW-corner plan is a feasible balanced transportation solution") {
    val plan = Analytics.q_transport_plan_nw(spark, sf).collect()
    assert(plan.nonEmpty)
    plan.foreach(r => assert(r.getAs[Long]("alloc") > 0L))
    // row sums of the plan equal the supplies; column sums the demands
    val bySrc = plan.groupBy(_.getAs[Long]("src"))
      .view.mapValues(_.map(_.getAs[Long]("alloc")).sum).toMap
    val byDst = plan.groupBy(_.getAs[Long]("dst"))
      .view.mapValues(_.map(_.getAs[Long]("alloc")).sum).toMap
    assert(bySrc.values.sum == byDst.values.sum)
    // NW plan has at most m + n - 1 basic cells
    assert(plan.length <= bySrc.size + byDst.size - 1, plan.length.toString)
    val gap = Analytics.q_transport_cost_gap(spark, sf).collect().head
    assert(gap.getAs[Long]("actual_cost") >= gap.getAs[Long]("lb_cost"))
    assert(gap.getAs[Long]("nw_cost") >= gap.getAs[Long]("lb_cost"))
    Analytics.q_vogel_penalties(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("penalty") >= 0L)
      assert(r.getAs[Long]("second_cost") >= r.getAs[Long]("best_cost"))
    }
  }

  test("Black-Scholes: no-arbitrage bounds, parity holds, implied vol recovers bump") {
    val px = Analytics.q_black_scholes_grid(spark, sf).collect()
    assert(px.nonEmpty)
    px.foreach { r =>
      val (s, k) = (r.getAs[Long]("s_cents") * 10000L,
        r.getAs[Long]("k_cents") * 10000L)
      val (c, p) = (r.getAs[Long]("call_e6"), r.getAs[Long]("put_e6"))
      assert(c >= 0L && p >= 0L, r.toString)
      assert(c <= s, s"call above spot: $r")           // C <= S
      assert(p <= k, s"put above strike: $r")          // P <= K
      // intrinsic lower bound: C >= S - K e^{-r} >= S - K
      assert(c >= s - k, s"call under intrinsic: $r")
    }
    Analytics.q_put_call_parity(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getAs[Long]("parity_gap_e9")) <= 10L,
        s"parity violated: $r")
    }
    Analytics.q_implied_vol_grid(spark, sf).collect().foreach { r =>
      // grid step is 125 e4; recovered vol within one step of the bump
      assert(math.abs(r.getAs[Long]("grid_bias_e4")) <= 125L, r.toString)
    }
  }

  test("scorecard: PDO scaling round-trips and distribution accounts everyone") {
    val pts = Analytics.q_scorecard_points(spark, sf).collect()
    assert(pts.nonEmpty)
    // higher empirical odds must never score lower (monotone PDO map)
    val sorted = pts.sortBy(_.getAs[Long]("ln_odds_e6"))
    val p = sorted.map(_.getAs[Long]("points"))
    assert(p.zip(p.tail).forall { case (a, b) => a <= b }, p.toSeq.toString)
    Analytics.q_scorecard_alignment(spark, sf).collect().foreach { r =>
      // inverting integer points reintroduces at most half-a-point of
      // ln-odds: 0.5 / factor = 0.5 ln2 / 20 ≈ 0.0173
      assert(r.getAs[Long]("gap_e6") <= 17400L, r.toString)
    }
    val dist = Analytics.q_scorecard_distribution(spark, sf).collect()
    val binsN = pts.map(r => r.getAs[Long]("n_good") + r.getAs[Long]("n_bad")).sum
    assert(dist.map(_.getAs[Long]("n")).sum == binsN)
    dist.foreach(r => assert(r.getAs[Long]("bad_rate_e6") <= 1000000L))
  }

  test("Gutenberg-Richter: positive b-values and a monotone GR curve") {
    val gr = Analytics.q_gutenberg_richter(spark, sf).collect()
    assert(gr.length == 5)
    gr.foreach { r =>
      assert(r.getAs[Long]("b_value_e6") > 0L, r.toString)
      assert(r.getAs[Long]("mean_above_cents") >= r.getAs[Long]("cutoff_cents"))
    }
    val curve = Analytics.q_magnitude_completeness(spark, sf).collect()
    val cum = curve.map(_.getAs[Long]("cum_n"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a >= b },
      s"N(>=m) must fall with m: ${cum.toSeq}")
    assert(cum.head == curve.map(_.getAs[Long]("n")).sum)
    Analytics.q_omori_decay(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_after") > 0L || r.getAs[Long]("rate_e6") == 0L)
      assert(r.getAs[Long]("width_s") > 0L)
    }
  }

  test("AIPW: doubly-robust identity holds and weights are coherent") {
    val ate = Analytics.q_aipw_ate(spark, sf).collect().head
    // with exact saturated propensity, AIPW == g-formula analytically
    assert(ate.getAs[Long]("dr_gap_e6") <= 10L, ate.toString)
    assert(ate.getAs[Long]("aipw_cents_e4") == ate.getAs[Long]("gformula_cents_e4"))
    val diag = Analytics.q_ipw_diagnostics(spark, sf).collect()
    assert(diag.length == 5)
    diag.foreach { r =>
      val e = r.getAs[Long]("e_e6")
      assert(e > 0L && e < 1000000L, r.toString)
      // harmonic identity: 1/e + 1/(1-e) >= 4, with equality at e = 1/2
      assert(r.getAs[Long]("w1_e6") + r.getAs[Long]("w0_e6") >= 4000000L - 4L)
    }
    val pos = Analytics.q_overlap_positivity(spark, sf).collect()
    assert(math.abs(pos.map(_.getAs[Long]("ato_share_e6")).sum - 1000000L) <= 5L)
    pos.foreach(r => assert(r.getAs[Long]("min_arm_e6") <= 500000L))
  }

  test("token bucket: Lindley backlog audit is coherent and sweep is monotone") {
    val audit = Events.q_token_bucket_audit(spark, sf).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Long]("peak_tokens_e6") >= 0L)
      assert(r.getAs[Long]("n_violations") <= r.getAs[Long]("n_events"))
      if (r.getAs[Long]("n_violations") > 0L)
        assert(r.getAs[Long]("first_violation_at") >= 1L, r.toString)
    }
    val sum = Events.q_rate_limit_summary(spark, sf).collect().head
    assert(sum.getAs[Long]("n_events") ==
      audit.map(_.getAs[Long]("n_events")).sum)
    assert(sum.getAs[Long]("n_violations") ==
      audit.map(_.getAs[Long]("n_violations")).sum)
    // a slower refill (larger period) can only create MORE violations
    val sweep = Events.q_gcra_conformance_sweep(spark, sf).collect()
    val v = sweep.map(_.getAs[Long]("n_violations"))
    assert(v.zip(v.tail).forall { case (a, b) => a <= b }, v.toSeq.toString)
  }

  test("reliability: block availability dominates p and Birnbaum ranks blocks") {
    val blocks = Analytics.q_reliability_block(spark, sf).collect()
    assert(blocks.length == 5)
    blocks.foreach { r =>
      // a parallel block is at least as available as one component
      assert(r.getAs[Long]("avail_e9") >= r.getAs[Long]("p_e6") * 1000L - 1000L)
      assert(r.getAs[Long]("n_up") <= r.getAs[Long]("n_sup"))
    }
    val bud = Analytics.q_availability_budget(spark, sf).collect().head
    assert(bud.getAs[Long]("sys_avail_e9") <= 1000000000L)
    assert(bud.getAs[Long]("downtime_min_yr_e2") >= 0L)
    Analytics.q_birnbaum_importance(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("birnbaum_e9") >= r.getAs[Long]("risk_contrib_e9"))
    }
  }

  test("Hall sweep covers all 31 subsets and the matching bound is coherent") {
    val defs = Analytics.q_hall_deficiency(spark, sf).collect()
    assert(defs.length == 31)
    defs.foreach { r =>
      assert(r.getAs[Long]("subset_size") ==
        java.lang.Long.bitCount(r.getAs[Long]("s_mask")).toLong)
      assert(r.getAs[Long]("deficiency") >= 0L)
    }
    val mb = Analytics.q_matching_bound(spark, sf).collect().head
    assert(mb.getAs[Long]("n_subsets") == 31L)
    assert(mb.getAs[Long]("matching_bound") ==
      5L - defs.map(_.getAs[Long]("deficiency")).max)
    val adj = Analytics.q_lane_adjacency(spark, sf).collect()
    adj.foreach(r => assert(
      java.lang.Long.bitCount(r.getAs[Long]("nbr_mask")).toLong ==
        r.getAs[Long]("degree")))
  }

  test("Bayesian A/B: posterior mean between prior and MLE, decision coherent") {
    val post = Analytics.q_bayes_ab_posterior(spark, sf).collect()
    assert(post.length == 2)
    post.foreach { r =>
      assert(r.getAs[Long]("alpha") == r.getAs[Long]("n_conv") + 1L)
      val m = r.getAs[Long]("mean_e6")
      assert(m > 0L && m < 1000000L)
      assert(r.getAs[Long]("var_e12") > 0L)
    }
    val dec = Analytics.q_bayes_ab_decision(spark, sf).collect().head
    val p = dec.getAs[Long]("p_b_beats_a_e6")
    assert(p >= 0L && p <= 1000000L)
    // P(B>A) > 1/2 iff uplift positive
    assert((p >= 500000L) == (dec.getAs[Long]("uplift_e6") >= 0L))
    Analytics.q_bayes_credible_bounds(spark, sf).collect().foreach { r =>
      // lo/hi/width are rounded independently — agree to 1 ulp of e6
      assert(math.abs(r.getAs[Long]("hi_e6") - r.getAs[Long]("lo_e6") -
        r.getAs[Long]("width_e6")) <= 1L, r.toString)
    }
  }

  test("phase dispersion: theta in range, best period is the grid argmin") {
    val pd = Analytics.q_phase_dispersion(spark, sf).collect()
    assert(pd.length == 10)
    pd.foreach { r =>
      val th = r.getAs[Long]("theta_e6")
      assert(th > 0L && th <= 1100000L, r.toString) // θ ≲ 1 up to noise
    }
    val best = Analytics.q_best_period(spark, sf).collect().head
    assert(best.getAs[Long]("theta_e6") ==
      pd.map(_.getAs[Long]("theta_e6")).min)
    val prof = Analytics.q_phase_profile(spark, sf).collect()
    assert(prof.map(_.getAs[Long]("share_e6")).sum >= 999990L)
  }

  test("random walk: ballot share, ranges, and arcsine deciles are coherent") {
    val ballot = Analytics.q_walk_ballot(spark, sf).collect().head
    assert(ballot.getAs[Long]("never_behind") <= ballot.getAs[Long]("n_users"))
    assert(ballot.getAs[Long]("deepest_deficit") <= 0L)
    val ranges = Analytics.q_walk_range(spark, sf).collect()
    assert(ranges.map(_.getAs[Long]("n_users")).sum ==
      ballot.getAs[Long]("n_users"))
    val dec = Analytics.q_walk_last_zero(spark, sf).collect()
    dec.foreach(r => assert(r.getAs[Long]("decile") >= 0L &&
      r.getAs[Long]("decile") <= 9L))
    assert(dec.map(_.getAs[Long]("n_users")).sum ==
      ballot.getAs[Long]("n_users"))
  }

  test("FCA: closures are extensive/idempotent and concepts count closed sets") {
    val sweep = Analytics.q_fca_closure_sweep(spark, sf).collect()
    assert(sweep.length == 32)
    val closureOf = sweep.map(r =>
      r.getAs[Long]("b_mask") -> r.getAs[Long]("closure_mask")).toMap
    sweep.foreach { r =>
      val (b, c) = (r.getAs[Long]("b_mask"), r.getAs[Long]("closure_mask"))
      assert((b & c) == b, s"closure must contain the set: $r") // extensive
      assert(closureOf(c) == c, s"closure must be idempotent: $r")
      assert((r.getAs[Long]("is_closed") == 1L) == (b == c))
    }
    val cc = Analytics.q_fca_concept_count(spark, sf).collect().head
    assert(cc.getAs[Long]("n_concepts") ==
      sweep.map(_.getAs[Long]("closure_mask")).distinct.length.toLong)
    assert(cc.getAs[Long]("top_extent") >= cc.getAs[Long]("bottom_extent"))
  }

  test("Jackson network: traffic solution dominates external rates, rho <= 1/2") {
    val arr = Analytics.q_jackson_arrivals(spark, sf).collect()
    assert(arr.length == 5)
    arr.foreach { r =>
      // internal routing only ADDS load: lambda >= gamma, visit ratio >= 1
      assert(r.getAs[Long]("lambda_hr_e6") >= r.getAs[Long]("gamma_hr_e6") - 1L,
        r.toString)
      if (r.getAs[Long]("gamma_hr_e6") > 0L) // guarded to 0 when gamma = 0
        assert(r.getAs[Long]("visit_ratio_e6") >= 999999L, r.toString)
    }
    val util = Analytics.q_jackson_utilization(spark, sf).collect()
    util.foreach { r =>
      // mu = 2 x peak lambda, so every station sits at rho <= 1/2
      assert(r.getAs[Long]("rho_e6") <= 500001L, r.toString)
      assert(r.getAs[Long]("wait_min_e6") > 0L)
    }
    val bn = Analytics.q_jackson_bottleneck(spark, sf).collect().head
    val maxL = arr.map(_.getAs[Long]("lambda_hr_e6")).max
    assert(bn.getAs[Long]("bottleneck_lambda_e6") == maxL)
    assert(bn.getAs[Long]("network_resp_min_e6") > 0L)
  }

  test("microstructure: spreads nonnegative, Amihud positive, Kyle defined") {
    val roll = Analytics.q_roll_spread(spark, sf).collect()
    assert(roll.length == 5)
    roll.foreach { r =>
      assert(r.getAs[Long]("roll_spread_cents") >= 0L)
      assert(r.getAs[Long]("days_defined") <= r.getAs[Long]("n_days"))
    }
    Analytics.q_amihud_illiquidity(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("amihud_e9") > 0L, r.toString)
      assert(r.getAs[Long]("worst_day_e9") >= r.getAs[Long]("amihud_e9"))
    }
    assert(Analytics.q_kyle_lambda(spark, sf).collect().length == 5)
  }

  test("DP composition: effective bound is the min, curve monotone in delta") {
    val comp = Analytics.q_dp_composition(spark, sf).collect().head
    // the accountant takes the better bound: min(basic, advanced)
    assert(comp.getAs[Long]("effective_eps_e6") <=
      comp.getAs[Long]("basic_eps_e3") * 1000L, comp.toString)
    assert(comp.getAs[Long]("effective_eps_e6") <=
      comp.getAs[Long]("advanced_eps_e6"), comp.toString)
    // signed gap consistent with the two bounds
    assert((comp.getAs[Long]("advanced_minus_basic_e6") >= 0L) ==
      (comp.getAs[Long]("advanced_eps_e6") >=
        comp.getAs[Long]("basic_eps_e3") * 1000L - 1L))
    val split = Analytics.q_dp_budget_split(spark, sf).collect()
    assert(math.abs(split.map(_.getAs[Long]("share_e6")).sum - 1000000L) <= 5L)
    val curve = Analytics.q_dp_delta_tradeoff(spark, sf).collect()
    val eps = curve.map(_.getAs[Long]("advanced_eps_e6"))
    // smaller delta (larger exponent) costs more epsilon
    assert(eps.zip(eps.tail).forall { case (a, b) => a <= b }, eps.toSeq.toString)
  }

  test("Leontief: Cramer solve reproduces observed output, multipliers >= 1") {
    val coef = Analytics.q_leontief_coefficients(spark, sf).collect()
    assert(coef.length == 25)
    coef.foreach { r =>
      assert(r.getAs[Long]("a_e6") >= 0L)
      // Hawkins-Simon: every input-share column sum strictly below 1
      assert(r.getAs[Long]("colsum_e6") < 1000000L, r.toString)
    }
    val solve = Analytics.q_leontief_solve(spark, sf).collect()
    assert(solve.length == 5)
    solve.foreach { r =>
      // x = Ax + f holds by construction, so the 120-term Cramer solve
      // must reproduce the observed gross output to float precision
      assert(r.getAs[Long]("rel_gap_e6") <= 1L, r.toString)
      assert(r.getAs[Long]("solved_output_cents") > 0L)
    }
    Analytics.q_leontief_multipliers(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("multiplier_e6") >= 1000000L, r.toString)
    }
  }

  test("KDE: density integrates to ~1, narrower bandwidth is rougher") {
    val grid = Analytics.q_kde_grid(spark, sf).collect()
    assert(grid.length == 16)
    grid.foreach(r => assert(r.getAs[Long]("density_e12") >= 0L))
    val sweep = Analytics.q_kde_bandwidth_sweep(spark, sf).collect()
    assert(sweep.length == 3)
    sweep.foreach { r =>
      // trapezoid mass on a 16-point grid lands loosely around 1
      val m = r.getAs[Long]("mass_e6")
      assert(m > 500000L && m < 1600000L, r.toString)
    }
    // on a FIXED 16-point grid narrow kernels can fall between grid
    // points, so roughness is not strictly monotone — gate positivity
    // and that the h values themselves double as declared
    sweep.foreach(r => assert(r.getAs[Long]("roughness_e18") > 0L))
    val hs = sweep.map(_.getAs[Long]("h_cents_e2"))
    assert(math.abs(hs(1) - 2L * hs(0)) <= 2L && math.abs(hs(2) - 2L * hs(1)) <= 2L,
      hs.toSeq.toString)
    val modes = Analytics.q_kde_modes(spark, sf).collect().head
    val k = modes.getAs[Long]("argmax_k")
    assert(k >= 0L && k <= 15L)
    assert(modes.getAs[Long]("peak_mass_e6") ==
      grid.map(_.getAs[Long]("kernel_mass_e6")).max)
  }

  test("butterflies: motif identities and distribution totals agree") {
    val bc = Analytics.q_butterfly_count(spark, sf).collect().head
    assert(bc.getAs[Long]("butterflies") >= 0L)
    // distinct co-supply pairs can't exceed wedge count (with multiplicity)
    assert(bc.getAs[Long]("n_pairs") <= bc.getAs[Long]("wedges"))
    val cc = bc.getAs[Long]("bipartite_cc_e6")
    assert(cc >= 0L && cc <= 1000000L, bc.toString)
    val wd = Analytics.q_wedge_distribution(spark, sf).collect()
    assert(wd.map(_.getAs[Long]("wedges")).sum == bc.getAs[Long]("wedges"))
    // per-supplier ledger double-counts each pair's butterflies once per side
    val sup = Analytics.q_butterfly_suppliers(spark, sf).collect()
    assert(sup.map(_.getAs[Long]("butterflies")).sum ==
      2L * bc.getAs[Long]("butterflies"))
  }

  test("real-time: utilization consistent, DBF slack matches, bounds ordered") {
    val edf = Analytics.q_edf_utilization(spark, sf).collect()
    assert(edf.length == 5)
    edf.foreach { r =>
      assert(r.getAs[Long]("period_us") > 0L && r.getAs[Long]("wcet_us") >= 0L)
      assert(r.getAs[Long]("u_e6") <= r.getAs[Long]("u_total_e6"))
    }
    val dbf = Analytics.q_demand_bound_audit(spark, sf).collect()
    assert(dbf.length == 8)
    dbf.foreach { r =>
      assert(r.getAs[Long]("horizon_us") - r.getAs[Long]("demand_us") ==
        r.getAs[Long]("slack_us"))
      assert((r.getAs[Long]("dbf_ok") == 1L) == (r.getAs[Long]("slack_us") >= 0L))
    }
    val rm = Analytics.q_rm_bound(spark, sf).collect().head
    // Liu-Layland for n=5 is ~743492
    assert(math.abs(rm.getAs[Long]("ll_bound_e6") - 743492L) <= 2L)
    // LL pass implies hyperbolic pass (hyperbolic strictly dominates)
    if (rm.getAs[Long]("rm_ll_pass") == 1L)
      assert(rm.getAs[Long]("rm_hyperbolic_pass") == 1L)
  }

  test("Hamming(7,4): perfect single-error correction and textbook spectrum") {
    val audit = Analytics.q_hamming74_audit(spark, sf).collect()
    assert(audit.length == 8)
    audit.foreach { r =>
      // the syndrome exactly locates every injected error position
      assert(r.getAs[Long]("syndrome_hits") == r.getAs[Long]("n"), r.toString)
      assert(r.getAs[Long]("correct_rate_e6") == 1000000L, r.toString)
    }
    val wt = Analytics.q_hamming_weight_enumerator(spark, sf).collect()
      .map(r => r.getAs[Long]("weight") -> r.getAs[Long]("n_codewords")).toMap
    assert(wt == Map(0L -> 1L, 3L -> 7L, 4L -> 7L, 7L -> 1L), wt.toString)
    val md = Analytics.q_hamming_min_distance(spark, sf).collect().head
    assert(md.getAs[Long]("min_distance") == 3L)
    assert(md.getAs[Long]("max_distance") == 7L)
    assert(md.getAs[Long]("n_pairs") == 120L)
  }

  test("splines: CR midpoint near linear, limiter preserves monotone slopes") {
    val cr = Analytics.q_catmull_rom_interp(spark, sf).collect()
    assert(cr.nonEmpty)
    cr.foreach { r =>
      // exact x16 identity: rounded midpoint within 1 cent of cr_x16/16
      val mid = r.getAs[Long]("cr_mid_cents")
      assert(math.abs(mid * 16L - r.getAs[Long]("cr_x16")) <= 8L, r.toString)
    }
    val mh = Analytics.q_monotone_hermite(spark, sf).collect()
    mh.foreach { r =>
      val lim = r.getAs[Long]("limited_x2")
      val (dp, dn) = (r.getAs[Long]("d_prev"), r.getAs[Long]("d_next"))
      if (dp.signum * dn.signum <= 0) assert(lim == 0L, r.toString)
      else assert(math.abs(lim) <= 6L * math.min(math.abs(dp), math.abs(dn)),
        r.toString)
    }
    val audit = Analytics.q_spline_overshoot_audit(spark, sf).collect().head
    assert(audit.getAs[Long]("n_segments") == cr.length.toLong)
    assert(audit.getAs[Long]("overshoot_segments") <=
      audit.getAs[Long]("n_segments"))
  }

  test("Hardy-Weinberg: independent-bit locus sits near equilibrium") {
    val hw = Analytics.q_hardy_weinberg(spark, sf).collect()
    assert(hw.length == 5)
    hw.foreach { r =>
      assert(r.getAs[Long]("n0") + r.getAs[Long]("n1") + r.getAs[Long]("n2") ==
        r.getAs[Long]("n"))
      assert(r.getAs[Long]("chi2_e6") >= 0L)
    }
    val af = Analytics.q_allele_frequencies(spark, sf).collect()
    af.foreach { r =>
      assert(r.getAs[Long]("p_e6") + r.getAs[Long]("q_e6") >= 999999L)
      assert(r.getAs[Long]("he_e6") <= 500000L) // 2pq <= 1/2
    }
    Analytics.q_inbreeding_coefficient(spark, sf).collect().foreach { r =>
      // calibration: F of an independent locus stays small
      assert(math.abs(r.getAs[Long]("f_e6")) < 300000L, r.toString)
    }
  }

  test("forensic digits: distributions account for every order") {
    val nOrders = graft.core.Tables.orders(spark, sf).count()
    val b2 = Analytics.q_benford_second_digit(spark, sf).collect()
    assert(b2.map(_.getAs[Long]("n_obs")).sum == nOrders)
    assert(math.abs(b2.map(_.getAs[Long]("benford_p_e6")).sum - 1000000L) <= 5L)
    val ld = Analytics.q_last_digit_uniform(spark, sf).collect()
    assert(ld.map(_.getAs[Long]("n_obs")).sum == nOrders)
    val dp = Analytics.q_digit_pair_independence(spark, sf).collect()
    assert(dp.map(_.getAs[Long]("n_obs")).sum == nOrders)
    dp.foreach(r => assert(r.getAs[Long]("d1") >= 1L && r.getAs[Long]("d1") <= 9L))
  }

  test("Mack variance: sigma2 nonnegative, CI brackets f, residuals centered") {
    val sig = Analytics.q_mack_sigma(spark, sf).collect()
    assert(sig.nonEmpty)
    sig.foreach { r =>
      assert(r.getAs[Long]("sigma2_cents_e2") >= 0L)
      assert(r.getAs[Long]("f_e6") >= 1000000L) // cumulative => f >= 1
    }
    Analytics.q_dev_factor_ci(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("lo_e6") <= r.getAs[Long]("f_e6"))
      assert(r.getAs[Long]("f_e6") <= r.getAs[Long]("hi_e6"))
    }
    val res = Analytics.q_mack_residuals(spark, sf).collect()
    assert(res.nonEmpty)
    // volume-weighted residual mean is ~0 by construction of f; the
    // plain mean stays small relative to the unit scale
    val mean = res.map(_.getAs[Long]("residual_e6")).sum / res.length
    assert(math.abs(mean) < 2000000L, mean.toString)
  }

  test("reservoir bottom-k: sample never exceeds k=32 or the population") {
    Sampling.q_reservoir_bottomk(spark, sf).collect().foreach { r =>
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Long]("k"))
      assert(k <= 32L && k <= n, s"k=$k n=$n")
      assert(math.abs(r.getAs[Long]("rel_err_e4")) < 5000L,
        s"bottom-32 estimate off by >50%: $r")
    }
  }
}
