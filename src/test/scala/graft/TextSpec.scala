package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Text, TextPipeline}

/** Text / pipeline operator semantics on tiny inline corpora (cases the
  * fixtures lack: duplicate texts, near-identical docs, empty-ish docs).
  */
class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  private def tinyDocs = {
    import spark.implicits._
    Seq(
      (0L, "fast query fast scan", "en", "s0", 20L),
      (1L, "fast query fast scan", "en", "s0", 20L),   // exact dup of 0
      (2L, "fast query fast merge", "en", "s0", 21L),  // near dup of 0
      (3L, "slow table big join sort", "de", "s1", 24L),
      (4L, "the a of to in", "de", "s1", 14L)          // all stopwords
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("wordcount top-1 on fixture is deterministic across runs") {
    val a = Text.q_wordcount(spark, sf).collect().toSeq
    val b = Text.q_wordcount(spark, sf).collect().toSeq
    assert(a === b)
    assert(a.head.getAs[Long]("n") >= a.last.getAs[Long]("n"))
  }

  test("exact dedup finds duplicate groups and is idempotent") {
    tinyDocs.createOrReplaceTempView("t_docs")
    val fp = tinyDocs.select(md5(col("text").cast("binary")).as("f"), col("doc_id"))
    val groups = fp.groupBy("f").count().filter(col("count") > 1).collect()
    assert(groups.length === 1 && groups.head.getAs[Long]("count") === 2)
    // idempotence: deduping a deduped corpus changes nothing
    val once = tinyDocs.dropDuplicates("text")
    assert(once.dropDuplicates("text").count() === once.count())
  }

  test("jaccard near-dup flags the near pair but not the far pair") {
    import spark.implicits._
    val toks = tinyDocs.select(col("doc_id"), col("lang"), col("source"),
      explode(array_distinct(split(lower(col("text")), " "))).as("w"))
    val inter = toks.as("a").join(toks.as("b"),
      $"a.lang" === $"b.lang" && $"a.source" === $"b.source" &&
      $"a.w" === $"b.w" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2")).count()
    val sz = toks.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val jac = inter.collect().map { r =>
      val (d1, d2, i) = (r.getLong(0), r.getLong(1), r.getLong(2))
      (d1, d2) -> i.toDouble / (sz(d1) + sz(d2) - i)
    }.toMap
    assert(jac((0L, 1L)) === 1.0)          // exact dup
    assert(jac((0L, 2L)) === 0.5)          // {fast,query,scan}∩{fast,query,merge}=2 of 4
    assert(!jac.contains((0L, 3L)))        // different block
  }

  test("simhash of identical docs is identical; hamming to near-dup is small") {
    val pairs = TextPipeline.q_dedup_simhash(spark, sf).collect()
    // every reported pair must satisfy the verified hamming bound
    assert(pairs.forall(_.getAs[Long]("hamming") <= 3))
  }

  test("minhash-lsh candidates are verified by exact jaccard >= 0.5") {
    val rows = TextPipeline.q_dedup_minhash_lsh(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("j") >= 0.5))
  }

  test("quality score: all-stopword doc scores below mixed-content doc") {
    tinyDocs.createOrReplaceTempView("documents_tiny")
    val scored = tinyDocs
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tok"),
        size(array_distinct(col("t"))).cast("long").as("distinct_tok"),
        size(filter(col("t"), t => t.isin("the", "a", "of", "to", "in")))
          .cast("long").as("stop_hits"))
      .withColumn("q",
        lit(0.4) * (lit(1.0) - col("stop_hits") / col("n_tok")) +
        lit(0.3) * (col("distinct_tok") / col("n_tok")) +
        lit(0.3) * least(lit(1.0), col("n_tok") / lit(50.0)))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("q")).toMap
    assert(scored(4L) < scored(0L))
  }

  test("rolling-hash fingerprint equals for dup texts, differs otherwise") {
    val fps = TextPipeline.q_doc_fingerprint(spark, sf).collect()
    // fixture-level sanity: n_same counts group sizes consistently
    val byFp = fps.groupBy(_.getAs[Long]("fingerprint"))
    byFp.foreach { case (_, rows) =>
      assert(rows.forall(_.getAs[Long]("n_same") === rows.length))
    }
  }

  test("tfidf scores are non-negative and limited to top-20") {
    val rows = Text.q_tfidf(spark, sf).collect()
    assert(rows.length <= 20)
    assert(rows.forall(_.getAs[Double]("tfidf") >= 0.0))
  }

  test("zipf fit: slope negative (frequency decreases with rank)") {
    val r = Text.q_zipf_fit(spark, sf).head()
    // the test fixture's vocabulary can be under 100 types
    assert(r.getAs[Long]("n_points") >= 10L && r.getAs[Long]("n_points") <= 100L)
    assert(r.getAs[Double]("zipf_slope") < 0.0)
  }

  test("vocab growth: cumulative columns are monotone, last bucket = corpus totals") {
    val rows = graft.ops.TextPipeline.q_vocab_growth(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("cum_tokens")).sliding(2).forall(p => p.head <= p.last))
    assert(rows.map(_.getAs[Long]("cum_types")).sliding(2).forall(p => p.head <= p.last))
    val totalTokens = graft.core.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " "))).count()
    assert(rows.last.getAs[Long]("cum_tokens") === totalTokens)
  }

  test("corpus report: docs conserved and ttr bounded") {
    val rows = graft.ops.TextPipeline.q_corpus_report(spark, sf).collect()
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === graft.core.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("ttr_e4") <= 10000L)
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("dup_docs") >= 2L * r.getAs[Long]("dup_groups")
        || r.getAs[Long]("dup_groups") === 0L)
    }
  }

  test("feature hashing: buckets in [0,32) and counts conserved per lang") {
    val rows = graft.ops.TextPipeline.q_feature_hashing(spark, sf).collect()
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0L && b < 32L })
    val perLang = rows.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("total_count")).sum).toMap
    val truth = graft.core.Tables.documents(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("lang"))
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("text")), " "))).as("n"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap
    assert(perLang === truth)
  }
}
