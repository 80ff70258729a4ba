package graft

import graft.llm.{Sketches, SpanDedup}
import org.apache.spark.sql.functions._

/** x19/x20 span dedup + a15 KMV sketch unit behavior on handcrafted
  * corpora (the registered queries pin the cross-engine values; these
  * pin the SEMANTICS on inputs small enough to reason about). */
class SpanSketchSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("duplicatedSpans finds cross-doc spans and merges touching islands") {
    val d = docs(
      1L -> "a b c d e f g h i j x y z", // shares tokens 1-10 with doc 2
      2L -> "a b c d e f g h i j q r s",
      3L -> "m n o p m n o p", // intra-doc repeat; adjacent spans coalesce
      4L -> "entirely unique words only here")
    val spans = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = 4)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1/2: windows 1..7 duplicated -> one span covering tokens 1..10;
    // doc 3: window 1 == window 5, starts 4 apart (= k) touch -> 1..8;
    // doc 4: nothing
    assert(spans.toSeq === Seq((1L, 1L, 10L), (2L, 1L, 10L), (3L, 1L, 8L)))
  }

  test("spanCoverage reports zeros for clean docs and handles short docs") {
    val d = docs(
      1L -> "a b c d e f g h i j x y z",
      2L -> "a b c d e f g h i j q r s",
      4L -> "entirely unique words only here",
      5L -> "tiny doc") // < k tokens: no windows, must not crash
    val cov = SpanDedup.spanCoverage(d, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(cov.toSeq === Seq(
      (1L, 13L, 10L, 769230L, 1L), // floor(10e6/13)
      (2L, 13L, 10L, 769230L, 1L),
      (4L, 5L, 0L, 0L, 0L),
      (5L, 2L, 0L, 0L, 0L)))
  }

  test("removeDuplicatedSpans keeps the canonical copy and cuts later occurrences") {
    val d = docs(
      1L -> "a b c d e f g h i j x y z", // canonical holder (lowest doc_id)
      2L -> "a b c d e f g h i j q r s", // loses tokens 1..10
      3L -> "m n o p m n o p", // intra-doc: window@1 canonical, window@5 cut -> tokens 5..8
      4L -> "entirely unique words only here")
    val out = SpanDedup.removeDuplicatedSpans(d, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "a b c d e f g h i j x y z", 13L),
      (2L, "q r s", 3L),
      (3L, "m n o p", 4L),
      (4L, "entirely unique words only here", 5L)))
  }

  test("kmvDistinct is salt-invariant, duplicate-blind, and matches the k-th order statistic") {
    import spark.implicits._
    // 200 distinct values, each appearing 3 times
    val vals = (0 until 200).flatMap(v => Seq.fill(3)(("g", v.toLong))).toDF("grp", "v")
    val a = Sketches.kmvDistinct(vals, "grp", "v", k = 64, salts = 16).collect()
    val b = Sketches.kmvDistinct(vals, "grp", "v", k = 64, salts = 1).collect()
    assert(a.toSeq === b.toSeq, "salt fan-out must not change the sketch")
    assert(a.length === 1)
    val kth = vals.select(md5(col("v").cast("string")).as("h")).distinct()
      .orderBy("h").limit(64).collect().last.getString(0)
    assert(a.head.getAs[String]("kth_hash") === kth)
    val est = a.head.getAs[Long]("est_distinct")
    assert(est > 100L && est < 400L, s"estimate $est implausible for 200 distinct")
  }

  test("kmv k-min sets merge algebraically: union of per-half k-mins re-minned = full sketch") {
    import spark.implicits._
    val full = (0 until 300).map(v => ("g", v.toLong)).toDF("grp", "v")
    val kthFull = Sketches.kmvDistinct(full, "grp", "v", k = 64)
      .head.getAs[String]("kth_hash")
    // simulate two partitions sketched independently, then merged
    def kmins(lo: Int, hi: Int) = (lo until hi).map(v => v.toLong).toDF("v")
      .select(md5(col("v").cast("string")).as("h")).distinct()
      .orderBy("h").limit(64).collect().map(_.getString(0)).toSeq
    val merged = (kmins(0, 150) ++ kmins(150, 300)).distinct.sorted.take(64)
    assert(merged.last === kthFull,
      "merging per-partition k-min sets must reproduce the global k-th order statistic")
  }

  test("importanceWeights favors target-domain vocabulary and zeroes empty docs") {
    val d = docs(
      1L -> "alpha alpha alpha beta", // target doc
      2L -> "alpha alpha alpha gamma", // raw doc in target vocab -> high weight
      3L -> "delta delta delta delta", // raw doc off-vocab -> low weight
      4L -> "")
    val w = graft.llm.Corpus.importanceWeights(d, "doc_id", "text", col("doc_id") === 1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byId = w.map(t => t._1 -> t._3).toMap
    assert(byId(2L) > byId(3L), s"target-vocab doc must outweigh off-vocab doc: $w")
    assert(w.find(_._1 == 4L).get === ((4L, 0L, 0L)), "empty doc carries no evidence")
  }

  test("kmvDistinct emits no row for a group with fewer than k distinct values") {
    import spark.implicits._
    val small = (0 until 10).map(v => ("s", v.toLong)).toDF("grp", "v")
    assert(Sketches.kmvDistinct(small, "grp", "v", k = 64).isEmpty)
  }
}
