package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.3 scale note; the manual
  * complement to AQE's runtime skew-join split, for when skew is known
  * ahead of time — e.g. the null-island geoid or a celebrity user_id).
  *
  * The large side gets a deterministic salt in [0, salts); the small
  * side is exploded `salts`-fold so every (key, salt) pair finds its
  * match. One skewed key's rows then spread over `salts` reducers
  * instead of one. Salt comes from hashing the large side's OTHER
  * columns — deterministic (no rand(), SURVEY §2.C rule 6) yet spread
  * within each key group.
  */
object SkewJoin {

  def saltedInnerJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltSource: Column): DataFrame = {
    val salted = large.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
    val exploded = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
