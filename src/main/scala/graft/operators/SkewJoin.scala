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
    // Deterministic salt — a pure hash of the full row, never rand():
    // a retried map task must re-derive IDENTICAL salts, or rows migrate
    // between (key, salt) reducers mid-shuffle and a partial stage retry
    // loses/duplicates them (Spark's classic nondeterministic-shuffle
    // hazard). Hashing the whole row (not just the keys — the hot key
    // hashing to one salt would defeat the spread) keeps the fan-out
    // uniform wherever any payload column varies.
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(factor)))
    // shuffle_hash: a salted join exists BECAUSE the join must shuffle —
    // if the small side were broadcastable there'd be no skew problem —
    // so pin the strategy and keep (key, salt) as the shuffle key.
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1)))).hint("shuffle_hash")
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }
}
