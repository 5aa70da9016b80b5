package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: `SparkEntry.queries`/`oracleSql` are built with
  * `.toMap`, where a duplicate key would silently drop the earlier
  * operator from the correctness gate (this actually happened in round
  * 12: C51 shadowed C15 under the shared key `sample_stratified`).
  * These pins make any future collision a hard test failure.
  */
class RegistrySuite extends AnyFunSuite {

  test("registry names are unique (duplicate keys cannot shadow an operator)") {
    val names = graft.SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate registry keys: ${dups.mkString(", ")}")
    assert(names.size == graft.SparkEntry.queries.size)
  }

  test("both stratified-sampling operators are independently registered") {
    val q = graft.SparkEntry.queries
    assert(q.contains("sample_stratified"))    // C15: per-doc sample membership
    assert(q.contains("sample_stratum_report")) // C51: per-stratum report
    assert(graft.SparkEntry.oracleSql.contains("sample_stratified"))
    assert(graft.SparkEntry.oracleSql.contains("sample_stratum_report"))
  }
}
