package graft.plans

import org.apache.spark.sql.Column

/** graft-facing API for the custom Catalyst vector expressions (K4).
  * Implementations live in org.apache.spark.sql.graftexpr (bridge package —
  * the expression base types they extend are private[sql]).
  */
object VectorExpressions {
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.VectorExpressions.dot_product(a, b)

  def squared_distance(a: Column, b: Column): Column =
    org.apache.spark.sql.graftexpr.VectorExpressions.squared_distance(a, b)

  def squared_norm(a: Column): Column =
    org.apache.spark.sql.graftexpr.VectorExpressions.squared_norm(a)
}

/** graft-facing API for the custom Catalyst text expressions (same bridge
  * rationale as [[VectorExpressions]]). */
object TextExpressions {
  /** 32-bit bigram simhash — see org.apache.spark.sql.graftexpr.SimhashBigrams. */
  def simhash_bigrams(text: Column): Column =
    org.apache.spark.sql.graftexpr.TextExpressions.simhash_bigrams(text)
}
