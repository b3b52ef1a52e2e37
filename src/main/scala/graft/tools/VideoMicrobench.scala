package graft.tools

/** Decode-only microbench for the mm_video_fp_pairs cost attribution
  * (round-11 verdict task): splits the per-doc wall time into fixture
  * synthesis (frame closures + AVI mux), demux+decode, and fingerprint,
  * so BASELINE.md can attribute the query's constant to engine vs
  * fixture. Pure JVM, no Spark session.
  *
  * Usage: runMain graft.tools.VideoMicrobench [docs]
  */
object VideoMicrobench {
  def main(args: Array[String]): Unit = {
    val docs = args.lift(0).map(_.toInt).getOrElse(20000)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val sink = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[vbench] $label%-26s $dt%7.2f s  (${dt * 1e6 / docs}%8.1f µs/doc, sink=$sink)")
    }
    // warm-up
    (0 until 2000).foreach { i =>
      val avi = graft.streaming.VideoCodec.encodeAvi(16, 16,
        graft.queries.RiskQueries.videoFrames(i.toLong))
      graft.streaming.VideoCodec.signature60(avi)
    }
    val payloads = new Array[Array[Byte]](docs)
    timed("synth+mux (fixture)") {
      var i = 0
      var acc = 0L
      while (i < docs) {
        payloads(i) = graft.streaming.VideoCodec.encodeAvi(16, 16,
          graft.queries.RiskQueries.videoFrames(i.toLong))
        acc += payloads(i).length
        i += 1
      }
      acc
    }
    timed("demux+decode (engine)") {
      var i = 0
      var acc = 0L
      while (i < docs) {
        acc += graft.streaming.VideoCodec.decodeAvi(payloads(i)).get.length
        i += 1
      }
      acc
    }
    val decoded = payloads.map(p => graft.streaming.VideoCodec.decodeAvi(p).get)
    timed("fingerprint60 (engine)") {
      var i = 0
      var acc = 0L
      while (i < docs) { acc ^= graft.streaming.VideoCodec.fingerprint60(decoded(i)); i += 1 }
      acc
    }
    timed("signature60 (engine e2e)") {
      var i = 0
      var acc = 0L
      while (i < docs) { acc ^= graft.streaming.VideoCodec.signature60(payloads(i)); i += 1 }
      acc
    }
  }
}
