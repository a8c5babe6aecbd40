package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large⋈large equi-joins.
  *
  * A hot key (one customer with 10% of all events, the "of the and"
  * shingle) concentrates its entire shuffle partition on one task. AQE's
  * skew-join split handles the sort-merge case automatically; salting is
  * the explicit form for when AQE can't — e.g. a skewed key feeding a
  * stateful/windowed op, or a build side small enough to replicate but
  * too big to broadcast.
  *
  * `saltedJoin` spreads each skewed-side key over `salts` sub-keys
  * (deterministic salt hashed from the whole row — no RNG, so retries
  * and recomputations agree) and replicates the other side `salts`×.
  * Result is row-identical to the plain equi-join; the shuffle key
  * becomes (key, salt), so a hot key occupies `salts` tasks instead of
  * one. Replication cost: other side × salts — choose the SMALLER side
  * as `other` and keep `salts` ~ the skew factor.
  *
  * Aggregation skew needs no salting here: Spark's hash aggregation is
  * already two-phase (partial map-side combine), so a hot group's rows
  * collapse before the shuffle — only order-sensitive buffers
  * (collect_list) skew, and this codebase avoids those (see q39).
  *
  * Limitation: the salt is a hash of the whole row, so IDENTICAL
  * duplicate rows all map to one salt — skew caused by exact duplicates
  * is not spread. That is deliberate: any per-row disambiguator that
  * would spread them (rand(), monotonically_increasing_id) is
  * nondeterministic across task retries, which breaks exactly-once
  * recomputation. Exact duplicates should be collapsed to (row, count)
  * upstream (the dedup tier exists for this) before a salted join.
  */
object Salt {

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!skewed.columns.contains("__salt") && !other.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it on the input")
    val saltedLeft = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicatedRight = other.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }
}
