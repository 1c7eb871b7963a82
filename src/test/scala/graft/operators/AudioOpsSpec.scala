package graft.operators

import graft.SparkSpec
import graft.operators.AudioOps.{AudioRow, WavCodec}

/** The real-WAV leg: the container round trip must be sample-exact
  * (the oracle recomputes stats from the generator recurrence, so any
  * codec slip breaks the hash compare), and corrupt payloads must
  * degrade to ok=false rows, never a dead stage. */
class AudioOpsSpec extends SparkSpec {
  import spark.implicits._

  test("WAV encode→decode is sample-exact incl. extremes") {
    val xs = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345, 0)
    val bytes = WavCodec.encode(xs, AudioOps.SampleRate)
    // RIFF/WAVE magic proves a real container, not raw PCM
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((sr, got)) = WavCodec.decode(bytes)
    assert(sr == AudioOps.SampleRate)
    assert(got.toSeq == xs.toSeq)
  }

  test("decoded stats match a direct computation on the generator samples") {
    val docs = graft.Tables.documents(spark, sf).limit(20)
    val hex = docs.selectExpr("doc_id", "md5(text) AS h")
      .as[(Long, String)].collect().toMap
    val got = AudioOps.decodeAll(AudioOps.wavTable(spark, sf))
      .filter(_.media_id < 20).collect().map(r => r.media_id -> r).toMap
    for ((id, h) <- hex) {
      val xs = AudioOps.samplesFor(h)
      val zc = (1 until xs.length).count(i => xs(i).toLong * xs(i - 1).toLong < 0)
      val energy = xs.map(v => v.toLong * v.toLong).sum
      val r = got(id)
      assert(r.ok && r.sr == AudioOps.SampleRate.toLong)
      assert(r.n_samples == xs.length.toLong, s"doc $id length")
      assert(r.zero_crossings == zc.toLong, s"doc $id zc")
      assert(r.energy == energy, s"doc $id energy")
      assert(r.peak == xs.map(v => math.abs(v.toLong)).max, s"doc $id peak")
    }
  }

  test("corrupt and truncated payloads yield ok=false rows, not failures") {
    val good = WavCodec.encode(Array[Short](1, 2, 3, -4), AudioOps.SampleRate)
    val rows = Seq(
      AudioRow(1L, good),
      AudioRow(2L, Array[Byte](1, 2, 3)),            // garbage
      AudioRow(3L, good.take(10)),                   // truncated header
      AudioRow(4L, null)                             // missing payload
    ).toDS()
    val out = AudioOps.decodeAll(rows).collect().map(r => r.media_id -> r.ok).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("band energies: pure tones land in their own bin") {
    val n = 64
    val amp = 1000
    // constant -> DC; [A,0,-A,0] cycle -> Fs/4; alternating ±A -> Nyquist
    val dc = Array.fill(n)(amp.toShort)
    val quarter = Array.tabulate(n)(i => (Seq(amp, 0, -amp, 0)(i % 4)).toShort)
    val nyq = Array.tabulate(n)(i => (if (i % 2 == 0) amp else -amp).toShort)
    val rows = Seq(
      AudioRow(1L, WavCodec.encode(dc, AudioOps.SampleRate)),
      AudioRow(2L, WavCodec.encode(quarter, AudioOps.SampleRate)),
      AudioRow(3L, WavCodec.encode(nyq, AudioOps.SampleRate)),
      AudioRow(4L, Array[Byte](9, 9))
    ).toDS()
    val out = AudioOps.bandEnergies(rows).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).dominant == "dc" && out(1L).p_quarter == 0L && out(1L).p_nyquist == 0L)
    assert(out(2L).dominant == "quarter" && out(2L).p_dc == 0L && out(2L).p_nyquist == 0L)
    assert(out(3L).dominant == "nyquist" && out(3L).p_dc == 0L && out(3L).p_quarter == 0L)
    assert(!out(4L).ok && out(4L).dominant == "none")
    // exact values: a pure tone's whole energy concentrates in its bin
    assert(out(1L).p_dc == (n.toLong * amp) * (n.toLong * amp))
    // re gains +A at i%4==0 and −(−A) at i%4==2 → n/2·A total; im = 0
    assert(out(2L).p_quarter == (n.toLong / 2 * amp) * (n.toLong / 2 * amp))
    assert(out(3L).p_nyquist == (n.toLong * amp) * (n.toLong * amp))
  }
}
