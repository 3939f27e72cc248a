package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The catalog's driver contract, pinned: every query has a DuckDB
  * oracle twin (a query added without one silently downgrades to a
  * rows-only check in the driver's compare — the exact drift that
  * turned r3's agg_approx_distinct into the round's one non-green
  * row), and no oracle is orphaned.
  */
class CatalogContractSpec extends AnyFunSuite {

  test("every catalog query has an oracle, and no oracle is orphaned") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val missing = queries -- oracles
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle (driver downgrades them to rows-only): $missing")
    val orphaned = oracles -- queries
    assert(orphaned.isEmpty, s"oracles with no catalog query: $orphaned")
  }

  test("oracle SQL references only fixture tables and stays non-empty") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
      assert(tables.exists(t => sql.contains(t)),
        s"$name oracle references no known fixture table")
    }
  }
}
