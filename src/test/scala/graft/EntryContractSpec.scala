package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself (SparkEntry): the shapes the
  * correctness gate assumes but nothing else would catch drifting.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle entries without a query (the driver would choke): $orphans")
  }

  test("rows-only queries are a consciously maintained list") {
    // adding a query without an oracle must be a deliberate decision
    // (each of these is backed by a behavior spec) — not a forgotten
    // oracle silently downgrading the gate to rows>0
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // r5 promoted t04/f03/f09; r6 promoted d13 (portable md5 hash
    // family → full method-eval oracle) and t05 (tolerance-banded
    // oracle); r8 promoted s02 (deterministic hyperplane matrix
    // embedded in generated SQL), s04 (FLOAT quantization + i8 kernel
    // mirrored), and m07 (average-hash + noise synthesis + pigeonhole
    // bands re-derived over the ASCII payload bytes); r9 promoted the
    // final nine — t17/t18 (merge loop unrolled into chained CTEs),
    // d02/d03/d12 (portable md5Hash60 signature family), d06 (exact-
    // count geometry + embedded hyperplanes), and d09/s03/s05
    // (decimal-deterministic Lloyd replayed in SQL). The list is now
    // EMPTY — keep it that way.
    val expected = Set.empty[String]
    assert(rowsOnly === expected,
      "rows-only set drifted — add the oracle or update this list " +
        "WITH a backing spec")
  }

  test("query keys follow the family_name convention") {
    val re = "^(q|f|d|s|t|m|p|st|k|c)\\d+_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet
      .filterNot(k => re.pattern.matcher(k).matches())
    assert(bad.isEmpty, s"non-conforming query keys: $bad")
  }
}
