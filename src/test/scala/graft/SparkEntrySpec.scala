package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guard for the driver surface: `SparkEntry.queries` is
  * built with `.toMap`, which silently DROPS duplicates — a
  * copy-pasted query name would hide one query from the correctness
  * gate while everything stays green. Pure JVM-side, no SparkSession.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("query names are unique — toMap cannot silently drop one") {
    val names = Seq(
      queries.CoreQueries.defs, queries.DataOpsQueries.defs,
      queries.ExtraQueries.defs, queries.AdvancedQueries.defs)
      .flatten.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle belongs to a registered query; flagship is registered") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.contains("q32_adjusted_close"))
  }

  test("bench retirement only names real queries and shrinks the bench " +
      "set exactly — a typo'd name would silently retire nothing") {
    assert(SparkEntry.benchRetired.subsetOf(SparkEntry.queries.keySet),
      s"unknown: ${SparkEntry.benchRetired -- SparkEntry.queries.keySet}")
    assert(SparkEntry.benchQueries.size ==
      SparkEntry.queries.size - SparkEntry.benchRetired.size)
    // every retired row keeps its correctness gate: it must still be
    // oracled (or at minimum registered) in the Verify surface
    assert(SparkEntry.benchRetired.subsetOf(SparkEntry.oracleSql.keySet))
  }

  test("every retired row's containing superior is registered and still " +
      "BENCHED — a retired superior would orphan the containment claim") {
    SparkEntry.benchRetiredInto.foreach { case (retired, superior) =>
      assert(SparkEntry.queries.contains(superior),
        s"$retired names unknown superior $superior")
      assert(!SparkEntry.benchRetired(superior),
        s"$retired's superior $superior is itself retired - the bench " +
          "no longer measures the chain that justified the retirement")
    }
  }
}
