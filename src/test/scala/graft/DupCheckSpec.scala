package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.DupCheck

/** The duplicate-operator screen, wired into `sbt test` (round-12
  * verdict: three near-duplicates were caught only by manual review —
  * q470, q493, a q508 CUPED draft — and the hand grep that missed one
  * used a silently-dead `a\|b` alternation). No SparkSession: the
  * screen is pure shingle/Jaccard over the registered oracle SQL.
  */
class DupCheckSpec extends AnyFunSuite {

  test("no non-allowlisted oracle pair reaches the duplicate threshold") {
    val hits = DupCheck.flagged(SparkEntry.oracleSql)
    assert(hits.isEmpty, "near-duplicate oracle SQL pairs:\n" +
      hits.map { case (a, b, s) => f"  $s%.3f  $a ~ $b" }.mkString("\n") +
      "\nde-duplicate the operator or add the pair to " +
      "DupCheck.intentionalTwins with its reason")
  }

  test("every intentionalTwins entry names two currently-registered queries") {
    val names = SparkEntry.oracleSql.keySet
    DupCheck.intentionalTwins.keys.foreach { case (a, b) =>
      assert(names.contains(a), s"stale twin entry: $a")
      assert(names.contains(b), s"stale twin entry: $b")
    }
  }

  test("a seeded synthetic duplicate is caught") {
    // the exact failure mode the screen exists for: someone re-registers
    // an existing operator under a new name with cosmetic edits (alias
    // renames, whitespace, one changed literal)
    val original = SparkEntry.oracleSql("q03_popularity")
    val cosmetic = original
      .replace("AS ", "as ")
      .replace("  ", " ") + " -- draft"
    val entries = Map("q03_popularity" -> original, "q999_draft" -> cosmetic)
    val hits = DupCheck.flagged(entries)
    assert(hits.exists { case (a, b, s) =>
      Set(a, b) == Set("q03_popularity", "q999_draft") && s >= DupCheck.threshold })
  }

  test("no two operator scaladoc first-lines are near-identical") {
    val root = new java.io.File("src/main/scala/graft")
    assume(root.isDirectory) // repo-relative; skip outside the repo
    val docs = DupCheck.scaladocFirstLines(root)
    assert(docs.size > 400, s"doc extraction looks broken: ${docs.size}")
    val hits = DupCheck.flaggedDocs(root)
    assert(hits.isEmpty, "near-duplicate operator summaries:\n" +
      hits.map { case (a, b, s) => f"  $s%.3f  $a ~ $b" }.mkString("\n"))
  }

  test("the doc screen catches a near-verbatim summary") {
    val a = "Kendall tau-b rank concordance between every unordered pair"
    val b = "Kendall tau-b rank concordance between every unordered pairs"
    assert(DupCheck.jaccard(DupCheck.shingles(a), DupCheck.shingles(b)) >=
      DupCheck.docThreshold)
  }

  test("jaccard and the size-ratio prefilter agree on known values") {
    val a = DupCheck.shingles("SELECT x FROM t GROUP BY x")
    assert(DupCheck.jaccard(a, a) == 1.0)
    val b = DupCheck.shingles("SELECT y FROM u WHERE y > 0")
    assert(DupCheck.jaccard(a, b) < 0.5)
    // disjoint short strings
    assert(DupCheck.jaccard(Set("abcde"), Set("fghij")) == 0.0)
  }
}
