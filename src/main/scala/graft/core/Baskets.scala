package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangular in-basket fan-out as CHAINED GENERATORS instead of one
  * interpreted nested-transform expression.
  *
  * The apriori pair/triple pattern (`collect_set` per group → in-row
  * triangular combinations → keyed aggregate) was previously expressed as
  * `explode(flatten(transform(items, (x, i) -> transform(slice(...), y ->
  * struct(x, y)))))` — semantically right, but higher-order functions run
  * on the INTERPRETED expression path: every pair allocates a boxed
  * struct inside a per-basket GenericArrayData that is then flattened
  * (copied) and exploded. At ~12.5 M generated pairs per sf0.1 graph
  * query that allocation is the dominant cost of the whole operator.
  *
  * The chained-generator form (`posexplode(items)` → `explode(slice(items,
  * i + 2, size(items)))`) emits the SAME row multiset — upper-triangular
  * combinations of the sorted basket — but every step is a
  * codegen-capable generator over primitive columns, so the pairs stream
  * out of one WholeStageCodegen span straight into the downstream partial
  * hash aggregate with zero boxed allocations. Callers keep applying
  * [[Guards.boundedBasket]] upstream, so breadth is still capped before
  * any fan-out.
  */
object Baskets {

  /** CONTRACT (enforced): the input must carry an array column `items`;
    * every other column is dropped (current consumers aggregate over the
    * bare combinations). Callers must pass items SORTED + DEDUPED (the
    * triangular slice enumerates positions, so a duplicate element emits
    * duplicate combinations) and [[Guards.boundedBasket]]-capped. The
    * schema half of the contract fails loudly here instead of producing
    * wrong/missing output downstream. */
  private def itemsArray(baskets: DataFrame): DataFrame = {
    val field = baskets.schema.fields.find(_.name == "items").getOrElse(
      throw new IllegalArgumentException(
        s"Baskets: input must carry an array column 'items'; got " +
          baskets.schema.fieldNames.mkString("[", ", ", "]")))
    require(field.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
      s"Baskets: 'items' must be an array column, got ${field.dataType}")
    baskets
  }

  /** All pairs (u, v) with u strictly before v in the basket array, one
    * row per pair. */
  def pairs(baskets: DataFrame, u: String, v: String): DataFrame =
    itemsArray(baskets)
      .select(posexplode(col("items")).as(Seq("_i", "_x")), col("items"))
      .select(col("_x").as(u),
        explode(slice(col("items"), col("_i") + lit(2), size(col("items")))).as(v))

  /** All triples (a, b, c) in array order, one row per triple — the same
    * chain with one more generator; `_j` is the 0-based position of b
    * inside a's tail slice, so c's tail starts at 1-based `_i + _j + 3`. */
  def triples(baskets: DataFrame, a: String, b: String, c: String): DataFrame =
    itemsArray(baskets)
      .select(posexplode(col("items")).as(Seq("_i", "_x")), col("items"))
      .select(col("_x").as(a), col("_i"),
        posexplode(slice(col("items"), col("_i") + lit(2), size(col("items"))))
          .as(Seq("_j", "_y")),
        col("items"))
      .select(col(a), col("_y").as(b),
        explode(slice(col("items"), col("_i") + col("_j") + lit(3),
          size(col("items")))).as(c))
}
