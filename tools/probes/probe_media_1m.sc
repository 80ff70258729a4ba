// Probe: media codec family at scale -- 1M real WAV encode+decode
// (m5 path) and 250k real AVI Motion-PNG encode+decode (m6 path,
// ~4.5 PNG frames per container), on synthetic id ranges.
// Claim under test: the encode/decode stages are CPU-bound NARROW
// work (no shuffle anywhere in the plan), so throughput scales with
// cores and the 100 TB story is executor count, not plan shape.
// Correctness at scale: aggregate stats must equal the closed-form
// replay of the synthesis formulas, summed in Scala over the same id
// range -- a decoder that drops rows, frames, or samples diverges.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 8g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_media_1m.sc -e ':quit'
import org.apache.spark.sql.functions._
import graft.llm.Multimodal

def timed(label: String)(f: => Unit): Double = {
  val t0 = System.nanoTime
  f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-24s $s%8.1f s")
  s
}

val nWav = 1000000L
val idsW = spark.range(0L, nWav).toDF("doc_id")
var wavAgg: org.apache.spark.sql.Row = null
val tWav = timed("wav-encode-decode-1M") {
  wavAgg = (Multimodal.decodeAudioBatched(
      Multimodal.synthesizeWavPayload(idsW, "doc_id"))
    .agg(count(lit(1)), sum(col("amp_sum")), sum(col("n_frames"))).head())
}
println("PROBE wav rows=" + wavAgg.getLong(0) +
  " ampSum=" + wavAgg.getLong(1) + " frames=" + wavAgg.getLong(2))
// closed-form replay of the same totals
var expAmp = 0L
var expFrames = 0L
var i = 0L
while (i < nWav) {
  val ch = 1 + (i % 2).toInt
  val nf = 256 + ((5 * i + 7) % 128).toInt
  val a = ((37 * i + 11) % 30000).toInt
  val b = ((53 * i + 29) % 30000).toInt
  expAmp += ch.toLong * ((nf / 2).toLong * a - (nf - nf / 2).toLong * b)
  expFrames += nf
  i += 1
}
println("PROBE wav closedform ampSum=" + expAmp + " frames=" + expFrames +
  " match=" + (expAmp == wavAgg.getLong(1) && expFrames == wavAgg.getLong(2)))

val nAvi = 250000L
val idsA = spark.range(0L, nAvi).toDF("doc_id")
var aviAgg: org.apache.spark.sql.Row = null
val tAvi = timed("avi-encode-decode-250k") {
  aviAgg = (Multimodal.decodeVideoBatched(
      Multimodal.synthesizeAviPayload(idsA, "doc_id"))
    .agg(count(lit(1)), sum(col("px_sum")), sum(col("n_frames"))).head())
}
println("PROBE avi rows=" + aviAgg.getLong(0) +
  " pxSum=" + aviAgg.getLong(1) + " frames=" + aviAgg.getLong(2))
var expPx = 0L
var expF2 = 0L
i = 0L
while (i < nAvi) {
  val nf = 3 + (i % 4).toInt
  val w = 16 + (i % 9).toInt
  val h = 16 + ((3 * i + 5) % 7).toInt
  var f = 0
  while (f < nf) {
    val a = ((31 * i + 17L * f + 3) % 256).toInt
    val b = ((53 * i + 29L * f + 7) % 256).toInt
    expPx += h.toLong * ((w / 2).toLong * a + (w - w / 2).toLong * b)
    f += 1
  }
  expF2 += nf
  i += 1
}
println("PROBE avi closedform pxSum=" + expPx + " frames=" + expF2 +
  " match=" + (expPx == aviAgg.getLong(1) && expF2 == aviAgg.getLong(2)))
println(f"PROBE throughput wav=${nWav / tWav}%.0f rows/s avi=${nAvi / tAvi}%.0f rows/s")
