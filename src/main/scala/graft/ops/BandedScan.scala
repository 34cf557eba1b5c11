package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level banded prefix scan — the scale-safe replacement for the
  * cumulative value-lattice theta join (`b.v <= a.v`).
  *
  * The plain lattice join is O(V²) in the number of distinct values V:
  * correct, but quadratic in the value domain, so a 100× wider price
  * range blows it up 10,000×. A single global window is banned too
  * (empty partitionSpec ⇒ every row in one task). The banded scan is
  * the best of both:
  *
  *   1. assign each value a band `v div bandWidth` (monotone in v);
  *   2. running sum WITHIN each (group, band) via a keyed window —
  *      parallel across bands, ≤ bandWidth rows per task;
  *   3. add the total of all EARLIER bands via a theta join on the
  *      tiny per-group band table (V/bandWidth rows, broadcastable).
  *
  * Total work O(V·bandWidth + (V/bandWidth)²) per group — with
  * bandWidth ≈ √V this is O(V^1.5) worst case and embarrassingly
  * parallel, vs O(V²) on one big join. Every window stays keyed, so
  * the PlanShapeSpec global-window ban holds by construction.
  */
object BandedScan {

  /** Adds `cumCol` = Σ of `xCol` over all rows with the same group
    * keys and `vCol` ≤ this row's (inclusive running sum). Rows must
    * be unique per (groupCols, vCol) — i.e. `df` is a value lattice.
    * `vCol` must be an integral column; negative values are fine
    * (truncating div keeps band assignment monotone). For the strict
    * (`<`) variant subtract the row's own measure from the result.
    */
  def cumSum(df: DataFrame, groupCols: Seq[String], vCol: String,
             xCol: String, cumCol: String, bandWidth: Long = 256L): DataFrame =
    cumSums(df, groupCols, vCol, Seq(xCol -> cumCol), bandWidth)

  /** Multi-measure variant: one scan adds an inclusive running sum per
    * (measure column → output column) pair.
    */
  def cumSums(df: DataFrame, groupCols: Seq[String], vCol: String,
              measures: Seq[(String, String)],
              bandWidth: Long = 256L): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(measures.nonEmpty, "need at least one measure")
    val band = "__band"
    val banded = df.withColumn(band, expr(s"$vCol div $bandWidth"))
    val keyCols = groupCols :+ band

    val wIn = Window.partitionBy(keyCols.map(col): _*).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBand = measures.zipWithIndex.foldLeft(banded) {
      case (d, ((x, _), i)) => d.withColumn(s"__incum_$i", sum(col(x)).over(wIn))
    }

    val btotAggs = measures.zipWithIndex.map {
      case ((x, _), i) => sum(col(x)).as(s"__btot_$i")
    }
    val bandTot = banded.groupBy(keyCols.map(col): _*)
      .agg(btotAggs.head, btotAggs.tail: _*)
    val rhs = bandTot.select(
      groupCols.map(c => col(c).as(s"__g_$c")) ++
        (col(band).as("__band2") +:
          measures.indices.map(i => col(s"__btot_$i"))): _*)
    val eqKeys: Option[Column] =
      groupCols.map(c => col(c) === col(s"__g_$c")).reduceOption(_ && _)
    val cond = eqKeys.map(_ && col("__band2") < col(band))
      .getOrElse(col("__band2") < col(band))
    // band table is O(V/bandWidth) rows — broadcast it so the prefix
    // join never shuffles the (equally tiny) left side by a theta key.
    val prevAggs = measures.indices.map(i =>
      sum(col(s"__btot_$i")).as(s"__prev_$i"))
    val prev = bandTot.select(keyCols.map(col): _*).as("a")
      .join(broadcast(rhs).as("b"), cond, "left")
      .groupBy(keyCols.map(col): _*)
      .agg(prevAggs.head, prevAggs.tail: _*)

    val joined = inBand.join(prev, keyCols)
    val withCums = measures.zipWithIndex.foldLeft(joined) {
      case (d, ((_, cumCol), i)) =>
        d.withColumn(cumCol,
          col(s"__incum_$i") + coalesce(col(s"__prev_$i"), lit(0L)))
    }
    val drops = Seq(band) ++
      measures.indices.flatMap(i => Seq(s"__incum_$i", s"__prev_$i"))
    withCums.drop(drops: _*)
  }
}
