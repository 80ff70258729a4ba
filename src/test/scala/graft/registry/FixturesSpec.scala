package graft.registry

import org.scalatest.funsuite.AnyFunSuite

/** Build-once memo semantics (LlmFixtures.buildOnce) — the round-11
  * review fix: a failed first build must stay rebuildable, and a
  * successful build must not run twice. Pure JVM, no SparkSession. */
class FixturesSpec extends AnyFunSuite {

  test("buildOnce: failed build does not poison the memo; success builds exactly once") {
    val memo = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    var calls = 0
    intercept[RuntimeException] {
      LlmFixtures.buildOnce(memo, "k") { calls += 1; sys.error("disk full mid-write") }
    }
    assert(!memo.contains("k"), "failed build must leave the memo unrecorded")
    LlmFixtures.buildOnce(memo, "k") { calls += 1 }
    LlmFixtures.buildOnce(memo, "k") { calls += 1 }
    assert(calls == 2, "retry rebuilds once, then the memo holds")
    assert(memo.contains("k"))
  }

  test("buildOnce: keys are independent") {
    val memo = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    var built = List.empty[String]
    LlmFixtures.buildOnce(memo, "a") { built ::= "a" }
    LlmFixtures.buildOnce(memo, "b") { built ::= "b" }
    LlmFixtures.buildOnce(memo, "a") { built ::= "a2" }
    assert(built.reverse == List("a", "b"))
  }
}
