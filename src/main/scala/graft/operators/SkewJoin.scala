package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §2b joins; the 100 TB
  * posture's "salting for skew, AQE for runtime re-plan").
  *
  * Two complementary tools:
  *  - AQE's skew-join split handles skew TRANSPARENTLY when it can see
  *    it (sort-merge joins, post-shuffle sizes) — nothing to call, it is
  *    on by default and SkewJoinSpec proves the plan splits.
  *  - [[saltedEquiJoin]] is the explicit fallback for cases AQE cannot
  *    rescue (e.g. a hot build side that must broadcast-fail, or
  *    aggregations keyed on a hot key): the left (big, skewed) side gets
  *    a deterministic salt derived from row identity, the right side is
  *    replicated once per salt, and the join key becomes (key, salt) —
  *    one hot key fans out over `salts` reducers. Replication cost:
  *    |right| × salts rows, so keep the right side the smaller one.
  */
object SkewJoin {

  /** Join types for which salting is semantics-preserving. Right/full
    * outer are NOT: the right side is replicated `salts` times before
    * the join, so every unmatched right row would surface `salts` times
    * instead of once — silently wrong results (ADVICE r2). */
  private val saltableJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Equi-join `left.key == right.key` with the hot-key fan-out above.
    * `saltSource` must name a left column with per-row variation (any
    * id/payload column) — the salt is `pmod(hash(saltSource), salts)`,
    * deterministic so retries and the oracle see identical output.
    * joinType is restricted to [[saltableJoinTypes]]; for right/full
    * outer, swap the sides (salt the right) or fall back to AQE. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     saltSource: String, salts: Int = 16,
                     joinType: String = "inner"): DataFrame = {
    require(saltableJoinTypes(joinType.toLowerCase),
      s"saltedEquiJoin: joinType '$joinType' would duplicate unmatched " +
        s"right rows $salts times; allowed: $saltableJoinTypes")
    val saltedLeft = left
      .withColumn("_salt", pmod(hash(col(saltSource)), lit(salts)))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
