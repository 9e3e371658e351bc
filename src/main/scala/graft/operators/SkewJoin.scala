package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join split handles most
  * skew at runtime; salting is the explicit fallback when one key is so
  * hot a single stream side must be fanned out deterministically (or when
  * a non-AQE engine path needs it).
  *
  * Shape: the skewed (big) side gets a random salt in [0, factor); the
  * small side is exploded `factor`× so every (key, salt) bucket finds its
  * match. The shuffle key becomes (key, salt) — the hot key's rows spread
  * over `factor` reducers instead of one.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * factor).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }
}
