package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Physical-plan assertions for the round-2 operators: the scale posture
  * (broadcast vs shuffle, nested-loop only for tiny build sides, no
  * needless exchanges) is part of each operator's contract, not an
  * accident of the optimizer's mood.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("range-bin join: 5-row tier table goes through BroadcastNestedLoopJoin") {
    val p = plan(Joins.q_join_range_bin(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("contamination: benchmark shingle set is broadcast, corpus never self-joins") {
    val p = plan(TextPipeline.q_contamination(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
  }

  test("LM scoring: bigram model is broadcast onto the corpus side") {
    val p = plan(TextPipeline.q_lm_score(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("min-max scaling: per-dim bounds broadcast onto the explode") {
    val p = plan(Sampling.q_minmax_scale(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("anomaly detection: per-type stats broadcast back onto the scan") {
    val p = plan(Sampling.q_anomaly_zscore(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("full outer join over pre-aggregated key-unique sides") {
    val p = plan(Joins.q_join_full_outer(spark, sf))
    assert(p.contains("FullOuter"), p)
  }

  test("hash split asks for no shuffle before the final aggregate") {
    // the split assignment is a pure per-row map: exactly one exchange
    // (for the groupBy), nothing upstream of it
    val p = plan(Sampling.q_sample_hash_split(spark, sf))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected <=3 exchanges (agg + sort + reuse), got $exchanges:\n$p")
  }

  test("kmeans round: assignment is projection-only, one aggregate exchange, no explode") {
    // round-7 contract for the Lloyd loop: centroids are driver-held
    // literals, so a round's plan is scan → project(argmin over k native
    // dist2 calls) → graft_vec_sum aggregate — exactly ONE exchange (the
    // k-group aggregate), no join, no posexplode Generate, per round
    import org.apache.spark.sql.functions.col
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), ops.Vectors.q7(col("embedding")).as("qe"))
    val cent: Seq[(Long, Array[Long])] =
      (0L to 9L).map(c => c -> Array.tabulate(64)(i => c * 1000L + i))
    val p = plan(ops.MLDeterministic.kmeansRoundAgg(vecs, cent))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 exchange per Lloyd round, got $exchanges:\n$p")
    assert(!p.contains("Generate"), s"posexplode resurfaced in the Lloyd round:\n$p")
    assert(!p.contains("Join"), s"join resurfaced in the Lloyd round:\n$p")
  }

  test("centroid ladders: one graft_vec_sum exchange, no posexplode Generate") {
    // round-8 contract for the per-label centroid builders (confusion /
    // margin / DB / CH / kmeans_iter2 recompute): ONE k-group aggregate
    // over whole quantized arrays — no (label, dim) explode, no second
    // re-assembly aggregate
    import org.apache.spark.sql.functions.{col, lit}
    val p = plan(ops.Vectors.centroidOf(
      graft.core.Tables.embeddings(spark, sf)
        .select(col("label").cast("long").as("clabel"),
          org.apache.spark.sql.functions.slice(
            ops.Vectors.q7(col("embedding")), 1, 8).as("v8")), "c_qe"))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$p")
    assert(!p.contains("Generate"), s"posexplode resurfaced in the centroid build:\n$p")
    val p2 = plan(ops.MLDeterministic.q_kmeans_iter2(spark, sf))
    assert(!p2.contains("Generate"), s"posexplode resurfaced in q_kmeans_iter2:\n$p2")
  }

  test("pii redaction: regexes stay in one whole-stage codegen pass") {
    // AQE prints codegen spans only in the FINAL plan — execute first
    val df = Scalars.q_pii_redact(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen spans print as "*(n)" stage markers in the final plan
    assert(p.contains("*(1)"), p)
  }

  test("funnel stages shrink: each stage count <= previous") {
    val r = Events.q_funnel(spark, sf).head()
    val (n0, n1, n2, n3) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3, s"$n0 >= $n1 >= $n2 >= $n3")
    assert(n1 > 0, "funnel is degenerate at smoke scale")
  }

  test("retention cohort day-0 count equals cohort size") {
    val rows = Events.q_retention(spark, sf).collect()
    // every user appears in their own cohort at offset 0
    val day0 = rows.filter(_.getAs[Long]("offset") == 0L).map(_.getAs[Long]("n_users")).sum
    val users = graft.core.Tables.eventsWithTs(spark, sf)
      .select("user_id").distinct().count()
    assert(day0 === users)
  }

  test("connected components: every near-dup pair lands in one component") {
    val comp = Text.q_dedup_components(spark, sf).collect()
      .map(r => (r.getAs[Long]("comp"), r.getAs[Long]("n_docs"))).toMap
    val nMembers = comp.values.sum
    assert(comp.keySet.forall(c => comp(c) >= 2), "component of size < 2")
    assert(nMembers > comp.size, "no non-trivial component at smoke scale")
  }

  test("log-odds terms: language totals broadcast onto the term table") {
    val p = plan(Text.q_log_odds_terms(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("winnowing: candidate pair join is keyed, never a cross product") {
    val p = plan(TextPipeline.q_winnowing_fingerprint(spark, sf))
    assert(!p.contains("CartesianProduct"), s"unkeyed pair join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"unkeyed pair join:\n$p")
  }

  test("no query plans a global (partition-less) window") {
    // an empty partitionSpec moves ALL rows to one task — a 100 TB
    // red flag; every window in the inventory must carry a partition key
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    // q_dedup_components / q_kmeans_converged run their whole convergence
    // loops at plan CONSTRUCTION; their constituent stages are ordinary
    // keyed windows / aggregates, so exempt them rather than pay the loop
    // cost to inspect the final (window-free) plan
    val actionAtConstruction = Set("q_dedup_components", "q_kmeans_converged")
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => actionAtConstruction(name) }
      .flatMap { case (name, fn) =>
        val n = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case w: LogicalWindow if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) Some(s"$name($n)") else None
      }
    assert(offenders.isEmpty, s"global windows in: ${offenders.mkString(", ")}")
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    // the production skew path the ops rely on (Joins.scala scale notes):
    // a key holding most of one side must be split by AQE's skew-join
    // rule, not melt one task. Pin that the feature actually fires on
    // this build with a deliberately 90%-one-key join.
    import org.apache.spark.sql.functions._
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(c.get(k)).toOption)
    try {
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val skewed = spark.range(0, 300000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 50000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = skewed.join(dim, "k")
      // collect() (not count(), which builds a SEPARATE execution) so the
      // adaptive plan below is the one that actually ran. 270k rows carry
      // k=7, plus the 5k multiples of 10 below 50000 (the dim's range)
      assert(joined.collect().length === 275000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") &&
          finalPlan.contains("AQEShuffleRead skewed"),
        s"AQE skew-join did not fire — no skewed shuffle read in:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("salted join result is identical to the plain join") {
    val salted = Joins.q_join_salted(spark, sf).collect().map(_.toString).sorted
    val plain = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_lines"),
        org.apache.spark.sql.functions.sum(
          graft.core.Det.cents(org.apache.spark.sql.functions.col("l_extendedprice")) *
            (org.apache.spark.sql.functions.lit(100L) -
              graft.core.Det.pct(org.apache.spark.sql.functions.col("l_discount"))))
          .as("rev_e4"))
      .orderBy("o_orderpriority")
      .collect().map(_.toString).sorted
    assert(salted.toSeq === plain.toSeq)
  }

  test("tfidf cosine: dot runs in the native postings-dot codegen expression") {
    // the public op checkpoints the 20 rows before its completeness
    // certificate, hiding the pair stage behind Scan ExistingRDD — inspect
    // the un-checkpointed pipeline instead
    val df = Retrieval.tfidfCosineTopForPlan(spark, sf)
    val p = plan(df)
    assert(p.contains("graft_postings_dot"),
      s"expected the native two-pointer merge, not a HOF/map lookup:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs product leaked in:\n$p")
  }

  test("fuzzy match: candidates come from keyed gram joins, never a block product") {
    val df = Relational.q_fuzzy_match(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy match must never plan an unkeyed pair product:\n$p")
    assert(p.contains("levenshtein"), s"exact verify missing:\n$p")
  }

  test("near-dup candidates: prefix joins are keyed equi-joins on (block, word)") {
    for (df <- Seq(Text.q_neardup_jaccard(spark, sf),
                   Text.q_neardup_containment(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"near-dup candidate stage must stay keyed:\n$p")
    }
  }

  test("exact kNN: rank filters plan a partial WindowGroupLimit before the shuffle") {
    // the row_number-over-(qid)-then-filter idiom must trigger Spark's
    // InferWindowGroupLimit so each map task keeps only its local top-k of
    // the O(block²) pair stream — without it the full pair fan-out shuffles
    // (not q_lof_outliers/q_dbscan_labels: they localCheckpoint the kNN
    // stage, so the final plan starts at Scan ExistingRDD and the window
    // stage ran at construction)
    for (df <- Seq(Vectors.q_knn_hubness(spark, sf),
                   Vectors.q_label_noise(spark, sf))) {
      val p = plan(df)
      assert(p.contains("WindowGroupLimit"),
        s"expected a partial top-k (WindowGroupLimit) under the rank window:\n$p")
    }
    // mutual-NN goes further: its argmin is min(struct(d2, id)), which
    // partial-aggregates map-side — the pair stream itself never shuffles
    val p = plan(Vectors.q_mutual_nn(spark, sf))
    assert(p.contains("partial_min") || p.contains("min(struct"),
      s"expected a partial-aggregated argmin, not a windowed rank:\n$p")
  }

  test("grid pair ops: none of the seven round-6 rewrites plans BNLJ or a data product") {
    // these seven planned BroadcastNestedLoopJoin / CartesianProduct through
    // round 5 (non-equi self-join conditions force BNLJ: the build side must
    // fit in every executor and one task owns the whole product); the
    // gridDirectedD2 / gridLegs rewrite turns each into a hash equi-join on
    // (gi, gj) with g(g+1)/2 uniform memory-bounded tasks
    val ops: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q_knn_hubness" -> Vectors.q_knn_hubness(spark, sf),
      "q_mutual_nn" -> Vectors.q_mutual_nn(spark, sf),
      "q_lof_outliers" -> Vectors.q_lof_outliers(spark, sf),
      "q_dbscan_labels" -> Vectors.q_dbscan_labels(spark, sf),
      "q_single_linkage_step" -> Vectors.q_single_linkage_step(spark, sf),
      "q_label_noise" -> Vectors.q_label_noise(spark, sf),
      "q_intrinsic_dimension" -> Vectors.q_intrinsic_dimension(spark, sf))
    for ((name, df) <- ops) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name still plans BroadcastNestedLoopJoin:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$name still plans CartesianProduct:\n$p")
    }
  }
}
