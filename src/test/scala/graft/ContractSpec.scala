package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: a typo'd oracle key or duplicate
  * query name silently zeroes a round's correctness — fail fast here. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("rows-only queries are the expected, documented set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set(
      "q_dd3_minhash_lsh", "q_dd4_simhash", "q_dd8_simhash_pairs",
      "q_dd9_incremental_neardup", "q_dd10_semantic_dedup",
      "q_sim2_lsh_ann", "q_sim3_ivf_ann", "q_a7_approx_distinct",
      "q_txt5_winnowing"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("oracle SQL has no tabs/control chars that could break json transport") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n'), s"$k has control chars")
    }
  }
}
