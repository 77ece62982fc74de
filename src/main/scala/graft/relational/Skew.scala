package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt-replicate for hot keys.
  *
  * A shuffle join hashes rows to `n` partitions by key, so one hot key (a
  * celebrity user, a null-ish default, a power-law head) lands its entire
  * row set on ONE task — the straggler that decides job wall-clock at
  * 100 TB. AQE's skew-join handles the sort-merge case after the fact;
  * this helper is the explicit form, usable with any join the optimizer
  * can't rewrite (and the standard technique when the small side fits in
  * memory only S-replicated, not broadcast):
  *
  *  - the BIG side gets a salt in [0, S): its hot key now spreads over S
  *    tasks. The salt derives from xxhash64 of the whole row (not rand()),
  *    so recomputation under task retry is stable — a nondeterministic
  *    salt can duplicate or drop rows when a lost shuffle partition is
  *    recomputed.
  *  - the SMALL side is replicated S× via a posexplode'd literal range,
  *    one copy per salt value.
  *  - the equi-join then runs on (key, salt): same result set as the
  *    unsalted join (SkewSpec proves equivalence), S× the parallelism on
  *    the hot key, at the cost of an S× blow-up of the small side only.
  */
object Skew {

  /** `big ⋈ small` on `key`, with the big side's rows spread over
    * `salts` sub-partitions per key. Output columns = big's ++ small's
    * (minus small's join key), like a plain `join(..., Seq(key))`. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val saltCol: Column =
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts))
    val saltedBig = big.withColumn("__graft_salt", saltCol)
    val replicatedSmall = small
      .withColumn("__graft_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig
      .join(replicatedSmall, Seq(key, "__graft_salt"))
      .drop("__graft_salt")
  }

  // ---- Skew demonstration fixture (bench + SkewSpec) ----------------------
  // TESTDATA is uniform by construction (no natural zipf anywhere — see
  // CLAUDE.md), so the straggler scenario is synthesized deterministically:
  // half of the fact rows land on ONE key, the rest spread over the dim's
  // key space. Used by Bench (timings: naive vs AQE skew-split vs salted)
  // and SkewSpec (equivalence of all three plans at sf0.1 scale).

  /** `rows` fact rows, ~50% on the hot key 0 — a power-law head turned up
    * to 11. Deterministic (xxhash64, no rand()). */
  def zipfBig(s: org.apache.spark.sql.SparkSession, rows: Long): DataFrame =
    s.range(rows).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("key"),
      col("id").as("v"))

  /** The 100k-key dimension — small, but modeled as too big to broadcast
    * (the bench disables auto-broadcast), which is exactly when skew
    * mitigation matters. */
  def skewDim(s: org.apache.spark.sql.SparkSession): DataFrame =
    s.range(100000L).select(col("id").as("key"), (col("id") * 7).as("w"))

  /** One number summarizing the join result — identical across the naive,
    * AQE-split, and salted plans iff the join semantics are preserved. */
  def checksum(joined: DataFrame): Long =
    joined.agg(sum(col("v") + col("w"))).head().getLong(0)
}
