package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §5): AQE's skew-join splitting
  * handles most cases at runtime; explicit salting is the tool for
  * the pathological hot-key shuffle joins AQE can't split (e.g. a
  * single key holding >1 partition of rows on BOTH sides is
  * un-splittable without changing the join).
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against a `small` side.
    *
    * The big side sprays each row into one of `salts` sub-keys using a
    * deterministic hash of the whole row; the small side is replicated
    * `salts` times. The join key space becomes (key, salt), breaking a
    * hot key into `salts` shuffle partitions. Row-for-row equivalent
    * to `big.join(small, key)`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val saltedSmall = small
      .withColumn("_salt", explode(lit((0 until salts).toArray)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-N heavy keys of `df` on `key` with their counts — the
    * diagnostic that decides between AQE, salting, and broadcast.
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
