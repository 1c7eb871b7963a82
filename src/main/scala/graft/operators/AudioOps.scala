package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-column plumbing: the WAV twin of [[MediaOps]]'s real-PNG leg.
  *
  * The JDK bundles a genuine RIFF/WAVE codec (`javax.sound.sampled`),
  * so — exactly like the image path — the corpus payloads are REAL
  * audio containers, not byte stubs: per doc, a 16-bit mono PCM clip
  * whose samples follow an integer recurrence seeded from md5(text)
  * (`s_i = ((seed + i·1664525) mod 2¹⁶) − 2¹⁵`), encoded to WAV bytes
  * on the executors. The feature extractor then parses those bytes
  * back with `AudioSystem` and computes sample-exact signal stats
  * (length, zero crossings, energy, peak) — all integer arithmetic,
  * so the DuckDB oracle re-derives every value from the generator
  * formula while the Spark side must recover it from real WAV
  * structure. A header mismatch, endianness slip, or dropped frame
  * breaks the hash compare.
  *
  * Scale notes (100 TB): encode+decode run once per row inside one
  * narrow mapPartitions stage (no shuffle), after column pruning drops
  * `text`; corrupt payloads yield ok=false rows, never a dead stage
  * (same NonFatal discipline as image decode). The corpus parquet is
  * one input split — round-robin first so the codec work spreads
  * across the cluster.
  */
object AudioOps {
  type Q = (SparkSession, String) => DataFrame

  val SampleRate = 8000

  case class AudioRow(media_id: Long, payload: Array[Byte])
  case class DecodedAudio(media_id: Long, sr: Long, n_samples: Long,
                          zero_crossings: Long, energy: Long, peak: Long,
                          ok: Boolean)

  /** Real WAV encode/decode.
    *
    * The hot path (`encode`/`decode`) is a hand-rolled RIFF codec:
    * `javax.sound.sampled.AudioSystem` consults a GLOBALLY LOCKED
    * provider registry on every `write`/`getAudioInputStream` call,
    * which doesn't just serialize a 32-thread stage — it scales
    * NEGATIVELY (measured on this box: 50k clips enc+dec 3.8 s on one
    * thread, 8.4 s on 32). The byte-level codec is lock-free and
    * ~50× cheaper. The JDK codec stays as `refEncode`/`refDecode`:
    * `AudioCodecParitySpec` proves `encode` is byte-identical to the
    * JDK writer's output and `decode` agrees with the JDK reader over
    * the corpus, so the production path still reads/writes genuine
    * interoperable RIFF/WAVE containers. */
  object WavCodec {
    /** Canonical 44-byte-header 16-bit mono PCM WAV — byte-identical
      * to `AudioSystem.write`'s output for the same samples. */
    def encode(samples: Array[Short], sr: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      def w32(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte
        out(off + 2) = ((v >> 16) & 0xff).toByte
        out(off + 3) = ((v >> 24) & 0xff).toByte
      }
      def w16(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte
      }
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      w32(4, 36 + dataLen)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      w32(16, 16)     // fmt chunk length
      w16(20, 1)      // PCM
      w16(22, 1)      // mono
      w32(24, sr)
      w32(28, sr * 2) // byte rate
      w16(32, 2)      // block align
      w16(34, 16)     // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      w32(40, dataLen)
      var i = 0
      while (i < samples.length) {
        out(44 + 2 * i) = (samples(i) & 0xff).toByte
        out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      out
    }

    /** Lock-free RIFF chunk walker: accepts any chunk order / extra
      * chunks (word-aligned per the RIFF rule); None unless a PCM
      * 16-bit mono `fmt ` and a `data` chunk are both present. */
    def decode(payload: Array[Byte]): Option[(Int, Array[Short])] =
      try {
        if (payload == null || payload.length < 44 ||
            payload(0) != 'R' || payload(1) != 'I' ||
            payload(2) != 'F' || payload(3) != 'F' ||
            payload(8) != 'W' || payload(9) != 'A' ||
            payload(10) != 'V' || payload(11) != 'E') None
        else {
          def r32(off: Int): Int =
            (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
              ((payload(off + 2) & 0xff) << 16) | ((payload(off + 3) & 0xff) << 24)
          def r16(off: Int): Int =
            (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
          var off = 12
          var sr = -1; var pcmOk = false
          var dataOff = -1; var dataLen = -1
          while (off + 8 <= payload.length && (dataOff < 0 || sr < 0)) {
            val id = (payload(off), payload(off + 1), payload(off + 2), payload(off + 3))
            val len = r32(off + 4)
            if (len < 0 || off + 8 + len > payload.length) {
              off = payload.length // malformed chunk size: stop the walk
            } else {
              id match {
                case ('f', 'm', 't', ' ') if len >= 16 =>
                  pcmOk = r16(off + 8) == 1 && r16(off + 10) == 1 &&
                    r16(off + 22) == 16
                  sr = r32(off + 12)
                case ('d', 'a', 't', 'a') =>
                  dataOff = off + 8; dataLen = len
                case _ => ()
              }
              off += 8 + len + (len & 1) // odd chunks pad to even
            }
          }
          if (!pcmOk || sr <= 0 || dataOff < 0) None
          else {
            val n = dataLen / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              out(i) = ((payload(dataOff + 2 * i) & 0xff) |
                ((payload(dataOff + 2 * i + 1) & 0xff) << 8)).toShort
              i += 1
            }
            Some((sr, out))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** JDK reference encoder (provider-locked — spec/reference only). */
    def refEncode(samples: Array[Short], sr: Int): Array[Byte] = {
      // signed 16-bit little-endian mono — the canonical PCM WAV layout
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** JDK reference decoder (provider-locked — spec/reference only):
      * None on anything unreadable or not 16-bit mono PCM. */
    def refDecode(payload: Array[Byte]): Option[(Int, Array[Short])] =
      try {
        if (payload == null) None
        else {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
          else {
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            val out = new Array[Short](n)
            val be = fmt.isBigEndian
            var i = 0
            while (i < n) {
              val b0 = bytes(2 * i) & 0xff
              val b1 = bytes(2 * i + 1) & 0xff
              out(i) = (if (be) (b0 << 8) | b1 else (b1 << 8) | b0).toShort
              i += 1
            }
            Some((fmt.getSampleRate.toInt, out))
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Generator recurrence, shared by the corpus synthesis and the spec
    * brute force: seed = b0·256+b1, n = 256 + (b2 mod 8)·64, samples
    * s_i = ((seed + i·1664525) mod 65536) − 32768. */
  def samplesFor(md5hex: String): Array[Short] = {
    def b(i: Int) = Integer.parseInt(md5hex.substring(2 * i, 2 * i + 2), 16)
    val seed = b(0) * 256 + b(1)
    val n = 256 + (b(2) % 8) * 64
    Array.tabulate(n)(i => (((seed + i.toLong * 1664525L) % 65536L) - 32768L).toShort)
  }

  /** Synthesize the real-WAV corpus from `documents`. */
  def wavTable(s: SparkSession, d: String): Dataset[AudioRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"), md5(col("text")).as("h"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .map { case (id, h) => AudioRow(id, WavCodec.encode(samplesFor(h), SampleRate)) }
  }

  /** Partition-batched real decode + integer signal stats. */
  def decodeAll(audio: Dataset[AudioRow]): Dataset[DecodedAudio] = {
    import audio.sparkSession.implicits._
    audio.map { r =>
      WavCodec.decode(r.payload) match {
        case None => DecodedAudio(r.media_id, 0L, 0L, 0L, 0L, 0L, ok = false)
        case Some((sr, xs)) =>
          var zc = 0L; var energy = 0L; var peak = 0L
          var i = 0
          while (i < xs.length) {
            val v = xs(i).toLong
            if (i > 0 && v * xs(i - 1).toLong < 0) zc += 1
            energy += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
          DecodedAudio(r.media_id, sr.toLong, xs.length.toLong, zc, energy, peak, ok = true)
      }
    }
  }

  case class BandEnergy(media_id: Long, p_dc: Long, p_quarter: Long,
                        p_nyquist: Long, dominant: String, ok: Boolean)

  /** Exact-integer 3-bin spectral energies: DFT power at DC, Fs/4 and
    * Fs/2. Those three bins are special — their twiddle factors are
    * exactly {0, ±1} (e^{-iπn/2} cycles 1,−i,−1,i; e^{-iπn} alternates
    * ±1) — so the DFT degenerates to signed integer sums and the
    * energies are EXACT longs both engines compute identically, where
    * a general-bin Goertzel would run an order-dependent double
    * recurrence no SQL oracle can replay bit-for-bit. DC/band/Nyquist
    * split is the classic cheap audio triage (silence/hum vs voiced
    * band vs aliasing/noise) run before any expensive featurizer. */
  def bandEnergies(audio: Dataset[AudioRow]): Dataset[BandEnergy] = {
    import audio.sparkSession.implicits._
    audio.map { r =>
      WavCodec.decode(r.payload) match {
        case None => BandEnergy(r.media_id, 0L, 0L, 0L, "none", ok = false)
        case Some((_, xs)) =>
          var s = 0L; var re = 0L; var im = 0L; var alt = 0L
          var i = 0
          while (i < xs.length) {
            val v = xs(i).toLong
            s += v
            (i & 3) match {
              case 0 => re += v
              case 1 => im -= v
              case 2 => re -= v
              case _ => im += v
            }
            alt += (if ((i & 1) == 0) v else -v)
            i += 1
          }
          val pDc = s * s
          val pQ = re * re + im * im
          val pN = alt * alt
          val dom =
            if (pDc >= pQ && pDc >= pN) "dc"
            else if (pQ >= pN) "quarter"
            else "nyquist"
          BandEnergy(r.media_id, pDc, pQ, pN, dom, ok = true)
      }
    }
  }

  val queries: Map[String, Q] = Map(
    "media_audio_stats" -> ((s, d) =>
      decodeAll(wavTable(s, d)).toDF()
        .select("media_id", "sr", "n_samples", "zero_crossings",
          "energy", "peak", "ok")
        .orderBy("media_id")),

    "media_audio_bands" -> ((s, d) =>
      bandEnergies(wavTable(s, d)).toDF()
        .select("media_id", "p_dc", "p_quarter", "p_nyquist",
          "dominant", "ok")
        .orderBy("media_id"))
  )

  private def hexByte(i: Int): String = {
    val a1 = s"ascii(substr(h, ${2 * i + 1}, 1))"
    val a2 = s"ascii(substr(h, ${2 * i + 2}, 1))"
    s"((CASE WHEN $a1 >= 97 THEN $a1 - 87 ELSE $a1 - 48 END) * 16" +
      s" + (CASE WHEN $a2 >= 97 THEN $a2 - 87 ELSE $a2 - 48 END))"
  }

  val oracles: Map[String, String] = Map(
    // re-derive every stat from the generator recurrence; the Spark
    // side must recover identical values from real WAV bytes
    "media_audio_stats" ->
      s"""WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
         |p AS (SELECT media_id,
         |        ${hexByte(0)} * 256 + ${hexByte(1)} AS seed,
         |        256 + (${hexByte(2)} % 8) * 64 AS n
         |      FROM m),
         |samp AS (SELECT media_id, i,
         |           (seed + i * 1664525) % 65536 - 32768 AS s
         |         FROM (SELECT media_id, seed, n,
         |                 unnest(range(0, CAST(n AS BIGINT))) AS i FROM p)),
         |lagd AS (SELECT media_id, s,
         |           lag(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
         |         FROM samp)
         |SELECT p.media_id, CAST($SampleRate AS BIGINT) AS sr,
         |       CAST(p.n AS BIGINT) AS n_samples,
         |       CAST(sum(CASE WHEN l.s * l.prev < 0 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS zero_crossings,
         |       CAST(sum(l.s * l.s) AS BIGINT) AS energy,
         |       CAST(max(abs(l.s)) AS BIGINT) AS peak,
         |       true AS ok
         |FROM p JOIN lagd l ON l.media_id = p.media_id
         |GROUP BY p.media_id, p.n
         |ORDER BY p.media_id""".stripMargin,

    // same generator recurrence; the three special bins' twiddles are
    // {0,±1}, so every energy is an exact integer in both engines
    "media_audio_bands" ->
      s"""WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
         |p AS (SELECT media_id,
         |        ${hexByte(0)} * 256 + ${hexByte(1)} AS seed,
         |        256 + (${hexByte(2)} % 8) * 64 AS n
         |      FROM m),
         |samp AS (SELECT media_id, i,
         |           (seed + i * 1664525) % 65536 - 32768 AS s
         |         FROM (SELECT media_id, seed, n,
         |                 unnest(range(0, CAST(n AS BIGINT))) AS i FROM p)),
         |acc AS (SELECT media_id,
         |          CAST(sum(s) AS BIGINT) AS sdc,
         |          CAST(sum(CASE WHEN i % 4 = 0 THEN s
         |                        WHEN i % 4 = 2 THEN -s ELSE 0 END) AS BIGINT) AS re,
         |          CAST(sum(CASE WHEN i % 4 = 1 THEN -s
         |                        WHEN i % 4 = 3 THEN s ELSE 0 END) AS BIGINT) AS im,
         |          CAST(sum(CASE WHEN i % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS alt
         |        FROM samp GROUP BY media_id)
         |SELECT media_id, sdc * sdc AS p_dc,
         |       re * re + im * im AS p_quarter,
         |       alt * alt AS p_nyquist,
         |       CASE WHEN sdc * sdc >= re * re + im * im
         |             AND sdc * sdc >= alt * alt THEN 'dc'
         |            WHEN re * re + im * im >= alt * alt THEN 'quarter'
         |            ELSE 'nyquist' END AS dominant,
         |       true AS ok
         |FROM acc ORDER BY media_id""".stripMargin
  )
}
