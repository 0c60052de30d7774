package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-management join helpers.
  *
  * AQE's skew-join split handles most runtime skew; explicit salting is for
  * the pathological case AQE cannot fix — one key holding a dominant share
  * of the big side in a shuffle join, where a single reducer partition
  * becomes the whole job's critical path.
  */
object Joins {

  /** Deterministically salted inner equi-join on `key`, equal to
    * `big.join(small, key)` row-for-row: the big side takes a salt derived
    * from its full row content (no rand() — replays and retries stay
    * stable), the small side is replicated `salt` ways, and the shuffle key
    * becomes (key, salt) so one hot key fans out across `salt` reducers.
    *
    * The replication multiplies the small side ×salt — use for genuinely
    * asymmetric joins (big skewed fact ⋈ modest dimension too large to
    * broadcast). `key` must be the only column name the two sides share. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
