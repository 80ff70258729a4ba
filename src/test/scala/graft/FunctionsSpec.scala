package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** NfcNormalize edge set (round-12 verdict item 4): the expression
  * ships on the hot path before every hashing consumer, so its fast
  * paths are pinned here — ASCII identity must be the SAME UTF8String
  * reference (zero-copy contract), already-NFC multi-byte input must
  * take the isNormalized quick-check skip (also reference-identity),
  * and only genuinely decomposed input pays the rebuild. The
  * non-ASCII literals below are UTF-8 in-source with the exact
  * composed/decomposed byte sequences (verified byte-level): inputs
  * on the compute() side are decomposed (e + U+0301, i + U+0308,
  * jamo U+1100 U+1161), expectations are pre-composed. */
class FunctionsSpec extends SparkSpec {

  import graft.functions.NfcNormalize

  test("nfcq: pure-ASCII returns the same UTF8String reference (zero-copy fast path)") {
    val s = UTF8String.fromString("plain ascii text, 100% of english crawl rows")
    assert(NfcNormalize.compute(s) eq s)
  }

  test("nfcq: already-NFC multi-byte input takes the quick-check skip (same reference)") {
    val s = UTF8String.fromString("café naïve éclair") // all pre-composed
    assert(NfcNormalize.compute(s) eq s)
  }

  test("nfcq: decomposed sequences compose (UAX #15 canonical composition)") {
    assert(NfcNormalize.compute(UTF8String.fromString("é")).toString == "é")
    assert(NfcNormalize.compute(UTF8String.fromString("ï")).toString == "ï")
    // mixed: ASCII + decomposed + already-composed in one value
    val mixed = NfcNormalize.compute(UTF8String.fromString("Café doc é"))
    assert(mixed.toString == "Café doc é")
    assert(mixed.numChars == 10)
  }

  test("nfcq: Hangul jamo compose to a syllable; NFC is idempotent") {
    // U+1100 (choseong kiyeok) + U+1161 (jungseong a) -> U+AC00 (ga)
    val ga = NfcNormalize.compute(UTF8String.fromString("가"))
    assert(ga.toString == "가")
    assert(NfcNormalize.compute(ga) eq ga)
  }

  test("nfcq: compatibility characters are NOT folded (NFC, not NFKC)") {
    // U+FB01 LATIN SMALL LIGATURE FI is NFC-stable; only NFKC expands it
    val fi = UTF8String.fromString("ﬁn")
    assert(NfcNormalize.compute(fi) eq fi)
  }

  test("nfcq expression: null in, null out; non-string input rejected at analysis") {
    assert(NfcNormalize(Literal(null, StringType)).eval() == null)
    assert(!NfcNormalize(Literal(1, IntegerType)).checkInputDataTypes().isSuccess)
  }

  test("nfcq is injected by GraftExtensions (no register() call needed)") {
    // the shared test session builds with spark.sql.extensions=GraftExtensions,
    // so this would fail UNRESOLVED_ROUTINE if the descriptor weren't injected.
    // NB: Spark's chr() is mod-256 ASCII (chr(769)=U+0001, unlike DuckDB's
    // codepoint chr), so the decomposed mark is spliced in from Scala.
    val r = spark.sql(s"SELECT nfcq('Café') AS t").collect()(0).getString(0)
    assert(r == "Café")
  }

  test("nfcq: interpreted eval matches codegen over a DataFrame") {
    import spark.implicits._
    val in = Seq("éclair", "ascii only", "éclair", "ï")
    val fromCodegen = in.toDF("s").selectExpr("nfcq(s) AS n")
      .collect().map(_.getString(0)).toSeq
    val interpreted =
      in.map(v => NfcNormalize.compute(UTF8String.fromString(v)).toString)
    assert(fromCodegen == interpreted)
    assert(fromCodegen ==
      Seq("éclair", "ascii only", "éclair", "ï"))
  }
}

/** Registry contract (round-12 verdict item 3): every registered query
  * MUST carry a DuckDB oracle — t14 shipped a round with err=no_oracle
  * because nothing enforced this. An intentionally oracle-free query
  * must be listed in `allowedNoOracle` (currently none) to pass. */
class RegistryInvariantSpec extends AnyFunSuite {

  private val allowedNoOracle: Set[String] = Set.empty

  test("every SparkEntry query has an oracleSql entry") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- allowedNoOracle
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle (add one or allowlist deliberately): $missing")
  }

  test("no orphan oracles (oracle key without a registered query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }
}
