package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** Column wrappers over Spark's own bloom-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the engine's
  * runtime-filter expressions, which are not SQL-registered but are
  * ordinary Catalyst expressions). Both sides hash with `xxhash64`
  * (seed 42), the same hash family the engine's injected runtime
  * filters use; `bloomMightContain` embeds the serialized sketch as a
  * foldable literal, so the probe stays inside whole-stage codegen
  * with the deserialized filter held as a codegen reference object.
  */
object BloomFuncs {

  /** Aggregate a column of xxhash64 values into a serialized bloom
    * filter (binary). `estItems` sizes the sketch; `numBits` is the
    * filter width (8 bits/item ≈ 2% false-positive rate).
    */
  def bloomAgg(hashed: Column, estItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(hashed),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Probe a driver-collected sketch with a column of xxhash64 values.
    * No false negatives; false positives are whatever `numBits` bought.
    */
  def bloomMightContain(bloomBytes: Array[Byte], hashed: Column): Column =
    Bridge.column(BloomFilterMightContain(Literal(bloomBytes),
      Bridge.expression(hashed)))
}
