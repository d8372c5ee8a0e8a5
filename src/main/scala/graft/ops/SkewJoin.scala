package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for hot-key equi-joins: salt the big side
  * into `salt` sub-keys and replicate the small side across all of
  * them, so one pathological key (a null-ish default, a bot user, an
  * empty document) spreads over `salt` reducers instead of melting
  * one. AQE's skew-join splitting handles moderate skew
  * automatically; this is the explicit tool for the extreme cases a
  * 100 TB pipeline hits (single key ≫ one executor's memory) or for
  * engines/configs where AQE is off.
  *
  * Result-equivalent to `big.join(small, key)`: each big row carries
  * exactly one salt value, and every (key, salt) pair exists exactly
  * once per small-side row after replication — proven in
  * SkewJoinSpec against the plain join.
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0)
    // fresh helper-column name: withColumn would silently OVERWRITE a
    // user column named __salt, corrupting data before the drop
    val taken = (big.columns ++ small.columns).toSet
    val saltCol = Iterator.from(0).map(i => s"__salt$i")
      .find(!taken.contains(_)).get
    // per-row salt: any assignment works for correctness (each big
    // row just needs ONE salt); modular ids spread rows evenly
    val bigS = big.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val smallS = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    bigS.join(smallS,
        bigS(key) === smallS(key) && bigS(saltCol) === smallS(saltCol))
      .drop(smallS(key)).drop(bigS(saltCol)).drop(smallS(saltCol))
  }
}
