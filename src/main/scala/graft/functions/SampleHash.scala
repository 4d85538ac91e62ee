package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's reproducible sampling hash — one definition shared by
  * every operator that makes a deterministic selection (stratified
  * sampling, mix rebalancing, leakage-free splits), so the
  * cross-operator reproducibility guarantee can't drift site by site.
  * The key is reduced mod 1000003 before the Knuth multiply so the
  * product never overflows ANSI bigint; DuckDB oracles mirror the
  * same arithmetic as `((key % 1000003) * 2654435761) % mod`.
  */
object SampleHash {
  def bucket(key: Column, mod: Long): Column =
    pmod(pmod(key, lit(1000003L)) * 2654435761L, lit(mod))
}
