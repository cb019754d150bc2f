package org.apache.spark.ml.feature

/** Package-scoped accessor for [[MinHashLSHModel]]'s fitted hash-family
  * coefficients (they are `private[ml]` in Spark). Read-only, used to
  * dump the model half of nq_minhash_mllib for the DuckDB oracle: with
  * the (a, b) pairs as data, the signature computation
  * `min((1 + idx) · a + b mod HASH_PRIME)` is exact BIGINT arithmetic
  * both engines can run (Spark's own formula, public source:
  * org/apache/spark/ml/feature/MinHashLSH.scala).
  */
object GraftLshAccess {
  /** (a, b) per hash table, in table order. */
  def coefficients(m: MinHashLSHModel): Array[(Int, Int)] =
    m.randCoefficients

  /** The modulus of the MinHash family (MinHashLSH.HASH_PRIME). */
  val HashPrime: Long = MinHashLSH.HASH_PRIME.toLong
}
