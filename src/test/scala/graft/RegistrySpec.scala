package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the whole query registry. */
class RegistrySpec extends AnyFunSuite {
  test("query names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).filter(_._2.size > 1).keys.mkString(", "))
  }

  test("every oracle key has a query and names are driver-safe") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z0-9_]+")))
  }

  test("rows-only queries are the documented hash-seeded or timing-dependent set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q14_approx_distinct", "q42_dedup_minhash_lsh",
      "q43_dedup_simhash", "q51_ann_lsh", "q53_ann_ivf",
      "q65_text_rollinghash", "q91_approx_percentiles", "q56_sketch_rollup",
      // q58 = CC over q42's hash-seeded LSH candidates — rows-only for the
      // same reason as q42; DedupSpec pins that its groups refine the
      // exact blocked-pair components
      "q58_dup_groups_lsh",
      // q59 aggregates per-trigger progress: batch boundaries and rates are
      // scheduling-dependent; StreamingSpec pins one-row-per-completed-batch
      "q59_monitoring_dashboard"))
  }
}
