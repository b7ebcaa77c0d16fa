package graft

import org.scalatest.funsuite.AnyFunSuite

/** REGISTRY.md's no-drift contract: the family map covers the live
  * registry exactly (a new query must be placed deliberately, a
  * removed one must leave the index), families never overlap, and the
  * committed file equals what the generator emits. */
class RegistrySpec extends AnyFunSuite {

  test("families partition the registry exactly") {
    val live = SparkEntry.queries.keySet
    val indexed = Registry.families.flatMap(_._2).toSet
    val unplaced = live -- indexed
    val stale = indexed -- live
    assert(unplaced.isEmpty,
      s"queries with no family (add them to Registry.families): ${unplaced.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"family entries for queries that no longer exist: ${stale.toSeq.sorted.mkString(", ")}")
    // disjoint: a query in two families would render twice
    val dupes = Registry.families.flatMap(_._2.toSeq)
      .groupBy(identity).collect { case (q, hits) if hits.size > 1 => q }
    assert(dupes.isEmpty, s"queries in more than one family: ${dupes.mkString(", ")}")
  }

  test("committed REGISTRY.md is current") {
    val path = java.nio.file.Paths.get("REGISTRY.md")
    assert(java.nio.file.Files.exists(path),
      "REGISTRY.md missing - run: sbt \"runMain graft.Registry\"")
    val committed = java.nio.file.Files.readString(path)
    assert(committed == Registry.render(),
      "REGISTRY.md is stale - regenerate: sbt \"runMain graft.Registry\"")
  }
}
