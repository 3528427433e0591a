package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: a typo'd oracle key or duplicate
  * query name silently zeroes a round's correctness — fail fast here. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query has an oracle (signature-replay closed the rows-only set)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }

  test("signature-replay oracles read only their OWN query's output") {
    // The ${OUT} placeholder must reference the same query's parquet —
    // cross-query reads would create hidden eval-order dependencies.
    val re = raw"\$$\{OUT\}/([a-z0-9_]+)/".r
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      re.findAllMatchIn(sql).foreach { m =>
        assert(m.group(1) == k, s"$k oracle reads ${m.group(1)}'s output")
      }
    }
  }

  test("oracle SQL has no tabs/control chars that could break json transport") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n'), s"$k has control chars")
    }
  }
}
