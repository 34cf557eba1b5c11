package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text analysis / LLM-data-pipeline operators over `documents`
  * (SURVEY.md §2.9): wordcount, n-grams, tf-idf, exact + near dedup,
  * lexicon sentiment, corpus profiling.
  *
  * Tokenization contract: `split(lower(text), ' ')` — the fixture text is
  * single-spaced lowercase, and the oracle uses the same split.
  *
  * Scale posture: everything is explode → hash-aggregate (the classic
  * map/combine/reduce shape, codegen'd); the only quadratic operator,
  * near-dup Jaccard, is blocked by (lang, source) and joined on
  * (block, token) so the cross product never materializes globally.
  */
object Text {

  private def tokens(c: Column): Column = split(lower(c), " ")

  private def docTokens(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(tokens(col("text"))).as("word"))

  /** The canonical MapReduce operator: global word counts, top-50. */
  def q_wordcount(spark: SparkSession, sf: String): DataFrame =
    docTokens(spark, sf)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(50)

  /** Per-language word counts, top-10 per language via window rank. */
  def q_word_per_lang(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("word").asc)
    docTokens(spark, sf)
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .orderBy("lang", "rnk", "word")
  }

  /** Bigram counts from consecutive tokens (array HOF — no self-join). */
  def q_ngram_bigrams(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(tokens(col("text")).as("toks"))
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(30)

  /** TF-IDF: tf = in-doc term count, idf = LN(N / (1 + df)); top-20.
    * df comes from a window over the tf aggregate (same shuffle key as a
    * re-aggregation+join, but one pass over one explode instead of two).
    */
  def q_tfidf(spark: SparkSession, sf: String): DataFrame = {
    val n = Tables.documents(spark, sf).agg(count(lit(1)).as("n_docs"))
    val tf = docTokens(spark, sf)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"), col("tf"),
        round(col("tf") * log(col("n_docs") / (col("df") + 1)), 4).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id").asc, col("word").asc)
      .limit(20)
  }

  /** Exact dedup via md5 fingerprint groups, plus a total-distinct summary
    * row so the output is non-trivial even with zero duplicate texts.
    */
  def q_dedup_exact(spark: SparkSession, sf: String): DataFrame = {
    val fp = Tables.documents(spark, sf)
      .select(md5(col("text").cast("binary")).as("fingerprint"), col("doc_id"))
    val dupes = fp.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc_id"))
      .filter(col("n") > 1)
    val total = fp.agg(
      lit("__total_distinct__").as("fingerprint"),
      countDistinct(col("fingerprint")).as("n"),
      lit(-1L).as("min_doc_id"))
    dupes.unionByName(total).orderBy("fingerprint")
  }

  /** Near-duplicate pairs by token-set Jaccard >= 0.8, blocked by
    * (lang, source). |A∩B| comes from a (block, token) equi-join of the
    * distinct token sets; |A∪B| = |A| + |B| − |A∩B|. One shuffle on the
    * block+token key — the pair space stays per-block.
    */
  def q_neardup_jaccard(spark: SparkSession, sf: String): DataFrame = {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(tokens(col("text")))).as("word"))
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = toks.as("a")
      .join(toks.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
        col("a.word") === col("b.word") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.lang").as("lang"), col("a.source").as("source"),
        col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= 0.8)
      .select(col("lang"), col("source"), col("d1"), col("d2"),
        round(col("jaccard"), 4).as("j"))
      .orderBy("lang", "source", "d1", "d2")
  }

  /** Lexicon sentiment (fixed 2+2 word lexicon). Per-language output keeps
    * all arithmetic integral until one final division: hit counts and token
    * totals are exact longs; the score ratio is a single IEEE division.
    */
  def q_sentiment_lexicon(spark: SparkSession, sf: String): DataFrame = {
    val scored = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .select(
        col("lang"),
        size(col("toks")).cast("long").as("n_tok"),
        size(filter(col("toks"), t => t.isin("fast", "big"))).cast("long").as("pos"),
        size(filter(col("toks"), t => t.isin("slow", "small"))).cast("long").as("neg"))
    scored.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pos") > col("neg"), 1L).otherwise(0L)).as("pos_docs"),
        sum(when(col("neg") > col("pos"), 1L).otherwise(0L)).as("neg_docs"),
        (sum(col("pos") - col("neg")) / sum(col("n_tok"))).as("score_ratio"))
      .orderBy("lang")
  }

  /** Corpus profiling per (lang, source). */
  def q_text_stats(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        round(sum(col("n_tok")) / count(lit(1)), 4).as("avg_tokens"))
      .orderBy("lang", "source")
}
