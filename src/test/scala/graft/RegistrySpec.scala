package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants of the query registry itself: every oracle
  * targets a registered query (an orphan oracle would make the driver
  * compare against a missing parquet dump → a red correctness row), and
  * every query without an oracle is on the DOCUMENTED rows-only list —
  * so adding a query without deciding its checking story fails CI
  * instead of silently weakening the gate. */
class RegistrySpec extends AnyFunSuite {

  /** Queries that legitimately have no SQL-expressible oracle: sketch
    * outputs (HLL, quantile) and custom-kernel hash families (MinHash,
    * SimHash, sign-LSH, IVF). Each is covered by a ScalaTest
    * recall/tolerance spec. (r7 graduations: q_text_rolling — HUGEINT
    * Horner fold; q_sample_weighted — rounded A-ES key; the multimodal
    * decode/resize/embed trio — the stub kernels are deterministic
    * integer/exact-double math over ASCII payloads, so DuckDB list
    * comprehensions reproduce them.) */
  private val rowsOnly = Set(
    "q_agg_approx", "q_agg_hll_partial", "q_percentiles_approx",
    "q_dedup_minhash", "q_dedup_simhash", "q_sim_lsh", "q_sim_ivf")

  /** Every rows-only kernel carries an ORACLE-GRADED quality companion
    * (r9): the exact/ground-truth side is hash-checked against DuckDB and
    * the kernel's quality metric rides as thresholded booleans the oracle
    * asserts as literals — so kernel regressions turn a CORRECTNESS row
    * red even though the sketch values themselves aren't SQL-expressible. */
  private val companions = Map(
    "q_agg_approx" -> "q_agg_approx_check",
    "q_agg_hll_partial" -> "q_agg_hll_check",
    "q_percentiles_approx" -> "q_percentiles_check",
    "q_dedup_minhash" -> "q_dedup_minhash_recall",
    "q_dedup_simhash" -> "q_dedup_simhash_recall",
    "q_sim_lsh" -> "q_sim_lsh_recall",
    "q_sim_ivf" -> "q_sim_ivf_recall")

  test("every rows-only kernel has an oracle-graded companion") {
    assert(companions.keySet == rowsOnly)
    companions.foreach { case (kernel, comp) =>
      assert(SparkEntry.queries.contains(comp),
        s"$kernel lacks registered companion $comp")
      assert(SparkEntry.oracleSql.contains(comp),
        s"companion $comp for $kernel has no oracle")
    }
  }

  test("every oracle key is a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query either has an oracle or is documented rows-only") {
    val unchecked =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(unchecked.isEmpty,
      s"queries with neither oracle nor rows-only entry: $unchecked")
    val stale = rowsOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only entries for unregistered queries: $stale")
    val both = rowsOnly.intersect(SparkEntry.oracleSql.keySet)
    assert(both.isEmpty, s"rows-only entries that now have oracles: $both")
  }

  test("query names are driver-safe and aliased consistently") {
    SparkEntry.queries.keySet.foreach { n =>
      assert(n.matches("[a-z0-9_]+"), s"unsafe query name: $n")
    }
    // oracle SQL must not be empty or whitespace
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle for $n")
    }
  }
}
