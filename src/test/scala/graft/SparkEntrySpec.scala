package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: the queries/oracle maps ARE the verified
  * surface, so structural drift (an oracle keyed to a renamed query, a
  * duplicate name silently shadowing an operator between the merged
  * maps) must fail fast here rather than as a mysteriously missing
  * CORRECTNESS row. */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("no query name collides across the merged group maps") {
    val groups: Seq[(String, Set[String])] = Seq(
      "Relational" -> graft.queries.Relational.queries.keySet,
      "S4Dataflow" -> graft.queries.S4Dataflow.queries.keySet,
      "TextPipeline" -> graft.queries.TextPipeline.queries.keySet,
      "Vectors" -> graft.queries.Vectors.queries.keySet,
      "Multimodal" -> graft.multimodal.Multimodal.queries.keySet,
      "Scans" -> graft.queries.Scans.queries.keySet,
      "RtbfE2e" -> graft.queries.RtbfE2e.queries.keySet)
    val collisions = groups.combinations(2).flatMap {
      case Seq((na, a), (nb, b)) => (a & b).map(k => s"$k ($na vs $nb)")
    }.toSeq
    assert(collisions.isEmpty, s"shadowed query names: $collisions")
    assert(SparkEntry.queries.size == groups.map(_._2.size).sum)
  }

  test("oracle SQL never carries a tab or CR (driver JSON-escape hazard)") {
    // Verify.q() escapes these, but flat SQL is also easier to diff; keep
    // the maps newline-only by construction.
    val offenders = SparkEntry.oracleSql.collect {
      case (k, v) if v.exists(c => c == '\t' || c == '\r') => k
    }
    assert(offenders.isEmpty, s"oracle SQL with tab/CR: $offenders")
  }
}
