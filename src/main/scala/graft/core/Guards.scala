package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Runtime scale guards in the spirit of the TF-IDF completeness
  * certificate (Retrieval.scala): invariants the fixtures satisfy by
  * construction but a 100× corpus might not, asserted IN the dataflow so
  * a violation fails loudly instead of melting an executor.
  *
  * The basket-pair pattern (`collect_set` per group → in-row triangular
  * pair/triple transform → explode) is the apriori discipline: fan-out is
  * bounded by per-group breadth² (³), never |V|². That bound is only a
  * bound if breadth itself is bounded — one pathological group (a
  * customer spanning 10⁵ suppliers, a basket holding 10⁵ items) would
  * put breadth² pair rows behind a single exploded row in ONE task.
  * [[boundedBasket]] pins the documented breadth cap at run time: under
  * the cap the column passes through unchanged (hashes identical), over
  * it the task fails with a message naming the op, the breadth, and the
  * remedies (raise the cap deliberately, or route whale groups through
  * `Vectors.gridLegs`).
  */
object Guards {

  /** Pair explodes (breadth² fan-out): 1024² /2 ≈ 0.5 M pair structs ≈
    * tens of MB behind one exploded row — the largest single-task
    * allocation the engine will silently accept. */
  val PairBreadthCap = 1024L

  /** Triple explodes (breadth³ fan-out): 256³ /6 ≈ 2.8 M triple structs —
    * same single-task budget as the pair cap. */
  val TripleBreadthCap = 256L

  /** `items` unchanged while `size(items) ≤ cap`; raises a runtime error
    * naming `op` otherwise. */
  def boundedBasket(items: Column, cap: Long, op: String): Column =
    when(size(items).cast("long") <= lit(cap), items)
      .otherwise(raise_error(concat(
        lit(s"$op: basket breadth "), size(items).cast("string"),
        lit(s" exceeds the documented $cap cap — a whale group would " +
          "materialize its full pair/triple fan-out behind one exploded " +
          "row in one task; raise the cap deliberately or route groups " +
          "this wide through the triangular grid (Vectors.gridLegs)"))))
}
