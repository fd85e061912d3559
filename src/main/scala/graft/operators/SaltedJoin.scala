package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salting for a skewed shuffle equi-join — the plan-level
  * guarantee for join keys you KNOW are hot (AQE's skew-join split is
  * the runtime safety net for the ones you don't; the q87 head/tail
  * split is the broadcast alternative when the hot side's payload per
  * key fits executor memory).
  *
  * Mechanics: every PROBE row gets a salt in [0, factor) derived from
  * a high-cardinality expression, widening each join key to
  * (key, salt) so one hot key's rows spread over `factor` reducers
  * instead of piling into one. The BUILD side is fanned out
  * `factor`× (one copy per salt value), so every probe row still
  * finds its match: the result set provably equals the unsalted
  * join — the property the q94 oracle checks.
  *
  * Cost model: build-side bytes × factor extra shuffle volume buys a
  * `factor`× cut in the hottest reducer's input. Worth it exactly
  * when build ≪ probe (dimension-ish but above the broadcast
  * threshold) and the probe key distribution is Zipf — the 100 TB
  * join this operator models.
  */
object SaltedJoin {

  val SaltCol = "__salt"

  /** Inner equi-join of `probe` and `build` on `keys`, salted
    * `factor` ways. `saltOn` must be a probe-side expression with
    * cardinality ≫ factor (a unique id is ideal); the salt VALUE never
    * affects the result, only which reducer a row lands on. */
  def inner(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltOn: Column, factor: Int): DataFrame = {
    require(factor >= 2, s"salting with factor $factor is a no-op")
    // A pre-existing __salt column would be silently REPLACED by the
    // synthetic salt (withColumn semantics), making the join key on
    // salt values instead of user data and dropping the user's column
    // from the output — fail loudly instead.
    require(!probe.columns.contains(SaltCol) && !build.columns.contains(SaltCol),
      s"input already has a '$SaltCol' column — rename it before salting")
    val salted = probe.withColumn(SaltCol, pmod(hash(saltOn), lit(factor)))
    val fanned = build.withColumn(SaltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(fanned, keys :+ SaltCol).drop(SaltCol)
  }
}
