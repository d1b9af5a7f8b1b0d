package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.AhoCorasick

/** [[Blocklist]] + the [[graft.functions.AhoCorasick]] automaton:
  * hand-counted greedy semantics (incl. the self-overlap and
  * nested-term corners), equivalence with a from-first-principles
  * Scala reference counter over randomized text, codegen/interpreted
  * agreement, partitioning invariance, NULL handling, and the
  * automaton's own contract checks. */
class BlocklistSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    df(StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType))),
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)): _*)

  /** Reference leftmost-greedy non-overlapping counter: indexOf with
    * restart AFTER each counted match — the replace-count identity,
    * written independently of the automaton. */
  private def greedyCount(text: String, term: String): Long = {
    var n = 0L
    var from = 0
    var i = text.indexOf(term, from)
    while (i >= 0) { n += 1; from = i + term.length; i = text.indexOf(term, from) }
    n
  }

  test("hand counts: self-overlap is greedy, nested terms count independently") {
    val d = docs(1L -> "a a a", 2L -> "row scan row", 3L -> "aaaa")
    val out = Blocklist.blocklistScan(d,
        terms = Seq("a a", "row", "row scan", "aa"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    out shouldBe Set(
      (1L, "a a", 1L),        // "a a a": greedy takes [0,2], next start 3 -> no 2nd
      (2L, "row", 2L),        // both "row"s
      (2L, "row scan", 1L),   // the prefix-nested term counts on its own
      (3L, "aa", 2L))         // "aaaa": [0,1] and [2,3]
  }

  test("four-token self-overlap yields two (greedy restart lands on a fresh match)") {
    val out = Blocklist.blocklistScan(docs(1L -> "a a a a"), terms = Seq("a a"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    out shouldBe Array(("a a", 2L))
  }

  test("scan lowers both sides; zero-hit terms are omitted; NULL text drops") {
    val d = docs(1L -> "SLOW Slow slow", 2L -> null, 3L -> "clean")
    val out = Blocklist.blocklistScan(d, terms = Seq("Slow", "zebra"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out shouldBe Array((1L, "slow", 3L))
  }

  test("operator equals the reference greedy counter on randomized text") {
    val terms = Seq("ab", "aba", "ba", "b", "abab")
    val rnd = new scala.util.Random(42)
    val rows = (1L to 60L).map { i =>
      i -> (1 to 30).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString
    }
    val expected = rows.flatMap { case (id, t) =>
      terms.map(term => (id, term, greedyCount(t, term)))
    }.filter(_._3 > 0).toSet
    val out = Blocklist.blocklistScan(docs(rows: _*), terms = terms)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    out shouldBe expected
  }

  test("gate: totals, distinct terms hit, threshold verdict, NULL text = zero hits") {
    val d = docs(1L -> "slow slow row", 2L -> "clean text", 3L -> null)
    val out = Blocklist.blocklistGate(d, terms = Seq("slow", "row"), maxHits = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    out shouldBe Array(
      (1L, 3L, 2L, false), // 2x slow + 1x row = 3 > maxHits
      (2L, 0L, 0L, true),
      (3L, 0L, 0L, true))
  }

  test("deterministic across partitionings and codegen modes") {
    val rows = (1L to 40L).map(i => i -> s"row scan slow a a value $i")
    val d = docs(rows: _*)
    assertSameRows(Blocklist.blocklistScan(d), Blocklist.blocklistScan(d.repartition(7)))
    val base = Blocklist.blocklistScan(d).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      Blocklist.blocklistScan(d).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sorted shouldBe base
    }
  }

  test("plan shape pinned: gate is exchange-free, scan is one Generate over the scan") {
    // the EXPLAINS.md claim as a failing test (the q335 plan-pin
    // device): a refactor that sneaks a shuffle into the scan side
    // (e.g. a join against an exploded term table) fails here
    val d = docs((1L to 20L).map(i => i -> s"row scan slow $i"): _*)
    val gatePlan = Blocklist.blocklistGate(d).queryExecution
      .executedPlan.toString
    withClue("blocklistGate must stay a pure scan-side projection: ") {
      gatePlan should not include "Exchange"
    }
    val scanPlan = Blocklist.blocklistScan(d).queryExecution
      .executedPlan.toString
    withClue("blocklistScan must ride ONE automaton Generate: ") {
      scanPlan should include("multi_match_counts")
      "Generate".r.findAllIn(scanPlan).size shouldBe 1
      scanPlan should not include "Join"
    }
  }

  test("automaton contract: rejects empty, duplicate, and zero-length dictionaries") {
    an[IllegalArgumentException] should be thrownBy new AhoCorasick(Array.empty[String])
    an[IllegalArgumentException] should be thrownBy new AhoCorasick(Array("a", ""))
    an[IllegalArgumentException] should be thrownBy new AhoCorasick(Array("dup", "dup"))
    an[IllegalArgumentException] should be thrownBy
      Blocklist.blocklistScan(docs(1L -> "x"), terms = Seq("A", "a"))
  }

  test("automaton: suffix-output links fire (term ending inside a longer term's path)") {
    // "she" contains "he" ending at the same position: the output
    // LINK, not the node's own term, must surface it — the classic
    // AC corner a naive trie scan misses.
    val out = Blocklist.blocklistScan(docs(1L -> "she shells"),
        terms = Seq("she", "he", "hells"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    out shouldBe Set(("she", 2L), ("he", 2L), ("hells", 1L))
  }
}
