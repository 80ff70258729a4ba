package graft

import graft.session.Sessionize
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** W1-W4/A1 semantics (FIXTURES.md unit-fixture spec). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def frame(tsSecs: Seq[Long]) =
    tsSecs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("entry_id", "ts_sec")

  test("W2: fixture gaps {1m,29m,31m,1m,2h} give session ids {2,2,2,3,3,4}") {
    val t0 = 1700000000L
    val ts = Seq(t0, t0 + 60, t0 + 60 + 29 * 60, t0 + 60 + 29 * 60 + 31 * 60,
      t0 + 60 + 29 * 60 + 31 * 60 + 60, t0 + 60 + 29 * 60 + 31 * 60 + 60 + 7200)
    val got = Sessionize
      .sessionIds(frame(ts), col("ts_sec"), Seq.empty, Seq(col("ts_sec"), col("entry_id")))
      .orderBy("entry_id").select("session_id").as[Long].collect().toSeq
    assert(got == Seq(2L, 2L, 2L, 3L, 3L, 4L))
  }

  test("W2 property: ids monotone; break iff gap > 1800") {
    val gaps = Gen.listOfN(30, Gen.chooseNum(1L, 4000L))
    val samples = (1 to 8).flatMap(i =>
      gaps.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
    assert(samples.nonEmpty)
    samples.foreach { gs =>
      val ts = gs.scanLeft(1700000000L)(_ + _)
      val rows = Sessionize
        .sessionIds(frame(ts), col("ts_sec"), Seq.empty, Seq(col("ts_sec"), col("entry_id")))
        .orderBy("entry_id").select("ts_sec", "session_id")
        .as[(Long, Long)].collect().toSeq
      rows.sliding(2).foreach {
        case Seq((t1, s1), (t2, s2)) =>
          if (t2 - t1 > 1800) assert(s2 == s1 + 1) else assert(s2 == s1)
        case _ =>
      }
      assert(rows.head._2 == 2L)
    }
  }

  test("W2 distributed: identical ids to the single-window global scan") {
    val gaps = Gen.listOfN(200, Gen.chooseNum(1L, 4000L))
    val gs = gaps.apply(Gen.Parameters.default, rng.Seed(99L)).get
    val df = frame(gs.scanLeft(1700000000L)(_ + _))
    val windowed = Sessionize
      .sessionIds(df, col("ts_sec"), Seq.empty, Seq(col("ts_sec"), col("entry_id")))
      .orderBy("entry_id").select("entry_id", "session_id")
      .as[(Long, Long)].collect().toSeq
    // more partitions than natural splits → exercises empty partitions
    val distributed = Sessionize
      .sessionIdsDistributed(df, "ts_sec", "entry_id", numPartitions = Some(7))
      .orderBy("entry_id").select("entry_id", "session_id")
      .as[(Long, Long)].collect().toSeq
    assert(distributed == windowed)
  }

  test("W2 distributed: ids survive a narrow coalesce(1) above the result") {
    // a single-file sink (IO singleFile, Verify) coalesces the result;
    // without a shuffle in between, all cached partitions run in ONE
    // task, so any TaskContext-based pid would mis-index the broadcast
    // offsets — the per-row __pid binding must keep ids exact
    val gaps = Gen.listOfN(300, Gen.chooseNum(1L, 4000L))
    val gs = gaps.apply(Gen.Parameters.default, rng.Seed(7L)).get
    val df = frame(gs.scanLeft(1700000000L)(_ + _))
    val windowed = Sessionize
      .sessionIds(df, col("ts_sec"), Seq.empty, Seq(col("ts_sec"), col("entry_id")))
      .orderBy("entry_id").select("entry_id", "session_id")
      .as[(Long, Long)].collect().toSeq
    val coalesced = Sessionize
      .sessionIdsDistributed(df, "ts_sec", "entry_id", numPartitions = Some(7))
      .coalesce(1) // narrow — no shuffle between the mapPartitions and the task merge
      .select("entry_id", "session_id")
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(coalesced == windowed)
  }

  test("A1: merge preserves total pageview count and event count") {
    val df = Seq(
      (1L, 100L, 1700000000L, 5L), (2L, 100L, 1700000300L, 7L),
      (3L, 100L, 1700010000L, 1L), (4L, 200L, 1700000000L, 2L)
    ).toDF("entry_id", "user_id", "ts_sec", "pageview_count")
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
    val sess = Sessionize.sessionIds(df, col("ts_sec"), Seq(col("user_id")),
      Seq(col("ts"), col("entry_id")))
    val merged = Sessionize.mergeSessions(sess, Seq(col("user_id"), col("session_id")),
      col("ts"), col("entry_id"), "pageview_count", Seq("entry_id"))
    assert(merged.agg(sum("pageview_count_sum")).as[Long].head() == 15L)
    assert(merged.count() == 3) // user 100: 2 sessions, user 200: 1
    // earliest entry_id survives per session
    val firstIds = merged.orderBy("user_id", "session_id").select("entry_id").as[Long].collect()
    assert(firstIds.toSeq == Seq(1L, 3L, 4L))
  }

  test("W3/W4: dwell = gap to next event, default 1800, cap 3600") {
    val df = frame(Seq(1700000000L, 1700000100L, 1700009000L))
    val dwell = Sessionize.cappedTimeOnPage(
      Sessionize.timeOnPage(df, col("ts_sec"), Seq.empty, Seq(col("ts_sec"), col("entry_id"))))
      .orderBy("entry_id")
      .select("raw_time_on_page", "capped_time_on_page")
      .as[(Double, Double)].collect().toSeq
    assert(dwell == Seq((100.0, 100.0), (8900.0, 3600.0), (1800.0, 1800.0)))
  }
}
