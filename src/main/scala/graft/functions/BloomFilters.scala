package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.{functions => F}

/** Column-level surface over Spark's built-in bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same pair the
  * optimizer injects for runtime filtering, but NOT registered in the SQL
  * function registry, hence the [[GraftSqlBridge]] wrapping).
  *
  * Use case at 100 TB: semi-join prefiltering. Build a bloom over the
  * filtered dimension's join key (kilobytes, one aggregate), ship it to the
  * fact scan as a literal, and drop ~all non-matching fact rows BEFORE the
  * shuffle — the exact join afterwards only confirms the ≤fpp false
  * positives. Blooms have no false negatives, so correctness is unchanged;
  * the shuffle shrinks by the dim's selectivity. The same shape prefilters
  * dedup candidate joins (new-batch keys vs corpus bloom).
  */
object BloomFilters {

  /** Aggregate column building a serialized bloom filter over
    * `xxhash64(key)`. `numBits` bounds the filter size (bits / items ≈ 10
    * gives ~1% fpp).
    */
  def bloomAgg(spark: SparkSession, key: Column, expectedItems: Long,
      numBits: Long): Column =
    GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(spark, F.xxhash64(key)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a driver-collected bloom (a literal on the
    * executor side — codegen-friendly, evaluated inside the scan stage so
    * it prunes before any exchange).
    */
  def mightContain(spark: SparkSession, bloom: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      GraftSqlBridge.expression(spark, F.lit(bloom)),
      GraftSqlBridge.expression(spark, F.xxhash64(key))))
}
