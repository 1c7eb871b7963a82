package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns with typed metadata, decode/feature-extract as batched
  * per-partition transforms.
  *
  * Image decode is REAL: payloads are genuine PNGs (encoded on the
  * executors from deterministic per-doc dimensions, [[PngCodec]]) and
  * [[decodeAll]] reads them back with the JDK-bundled `javax.imageio`
  * readers (PNG/JPEG/BMP/GIF/TIFF) — no external codec dependency.
  * The oracle can still hash-check the result because the GENERATOR's
  * dimensions derive from md5 hex chars, reproducible in SQL; the
  * decoder must recover exactly those dims from real PNG bytes for the
  * rows to match. Audio/video remain byte-derived stubs
  * (`media_frame_sample`) — no container parsers in the JDK.
  *
  * Scale: decode is the expensive stage, so it runs once per row inside
  * a single narrow stage (no shuffle), after column pruning has dropped
  * `text`; metadata aggregation happens on the small decoded output.
  */
object MediaOps {
  type Q = (SparkSession, String) => DataFrame

  /** Typed row for media payloads: binary blob + metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMedia(media_id: Long, kind: String, byte_len: Int,
                          width: Int, height: Int, channels: Int, ok: Boolean)

  /** Real PNG encode via the JDK's ImageIO — runs on executors inside
    * mapPartitions; one solid-fill image per row (solid fill keeps the
    * encode cheap and the file tiny without changing what the decoder
    * must prove: dims + bands recovered from real PNG structure). */
  object PngCodec {
    def encode(width: Int, height: Int, gray: Boolean, rgbSeed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgbSeed & 0xff, (rgbSeed * 7) & 0xff, (rgbSeed * 13) & 0xff))
      g.fillRect(0, 0, width, height)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Synthesize an OPAQUE-blob corpus from `documents`: payload = md5
    * bytes of the text, kind from source. Used by the plumbing checks
    * and the audio/video-shaped stubs; stands in for a real
    * (path, binary) scan such as `spark.read.format("binaryFile")`. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        concat(lit("img/"), col("source")).as("kind"),
        unhex(md5(col("text"))).as("payload"))
      .as[MediaRow]
  }

  /** Synthesize a REAL-PNG corpus from `documents`: per doc, the image
    * is `(8 + b0·2) × (8 + b1·2)` px (8..518 — some sides cross the 256
    * resize threshold), grayscale when b2 is even else RGB, where b_k is
    * byte k of md5(text). The dims are thus oracle-reproducible while
    * the payload is a genuine PNG only a real decoder can read back. */
  def pngTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        concat(lit("img/"), col("source")).as("kind"),
        md5(col("text")).as("h"))
      // the corpus parquet is one small file = one input split, but
      // this map stage carries ALL the PNG encode work (deflate of up
      // to 518×518×3 rasters) — spread it across the cluster first,
      // same discipline as DedupOps.docShingleArrays. Measured at
      // sf0.1: media_resize_dims 11.1 s → sub-second wall once the
      // encode+decode runs on every core instead of one.
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        it.map { case (id, kind, h) =>
          def b(i: Int) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16)
          MediaRow(id, kind,
            PngCodec.encode(8 + b(0) * 2, 8 + b(1) * 2, gray = b(2) % 2 == 0, rgbSeed = b(3)))
        }
      }
  }

  /** Partition-batched REAL decode: `javax.imageio` reads each payload
    * (any JDK-supported format — PNG/JPEG/BMP/GIF/TIFF); width/height
    * from the decoded image, channels from the raster's band count.
    * Unreadable payloads → ok=false row, never an exception (a corrupt
    * blob in 100 TB must not kill the stage). */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec setup
      it.map { r =>
        val len = if (r.payload == null) 0 else r.payload.length
        val img =
          try {
            if (r.payload == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          } catch {
            // NonFatal, not just IOException: ImageIO plugin readers
            // throw RuntimeExceptions (IndexOutOfBounds, NegativeArraySize,
            // IllegalArgument) on truncated/corrupt payloads
            case scala.util.control.NonFatal(_) => null
          }
        if (img == null) DecodedMedia(r.media_id, r.kind, len, 0, 0, 0, ok = false)
        else DecodedMedia(r.media_id, r.kind, len,
          img.getWidth, img.getHeight, img.getRaster.getNumBands, ok = true)
      }
    }
  }

  val queries: Map[String, Q] = Map(
    // REAL decode + per-kind metadata stats — oracle-checked: the
    // GENERATOR's dims are re-derived in SQL from md5 hex chars; the
    // Spark side must recover the same numbers by actually decoding
    // PNG bytes with javax.imageio. Any decode failure breaks n_ok.
    "media_decode_stats" -> ((s, d) =>
      decodeAll(pngTable(s, d)).toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum((col("width") * col("height")).cast("long")).as("px_sum"),
          sum(col("width").cast("long")).as("width_sum"),
          sum(col("height").cast("long")).as("height_sum"),
          sum(col("channels").cast("long")).as("channels_sum"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))
        .orderBy("kind")),

    // plumbing-only check (oracle-able): payload byte length per doc —
    // proves binary synthesis + schema survive the round trip
    "media_payload_len" -> ((s, d) =>
      mediaTable(s, d).toDF()
        .select(col("media_id"), col("kind"),
          length(col("payload")).cast("long").as("byte_len"))
        .orderBy("media_id")),

    // resize planning: aspect-preserving target dims (long side → 256,
    // never upscale) computed from REAL decoded metadata — generator
    // dims span 8..518 px so both branches (downscale and keep) are
    // exercised. Integer math only → oracle-checked via the same md5
    // hex-char derivation the generator uses.
    "media_resize_dims" -> ((s, d) =>
      decodeAll(pngTable(s, d)).toDF()
        .withColumn("long_side", greatest(col("width"), col("height")))
        .withColumn("scale_num", when(col("long_side") > 256, lit(256)).otherwise(col("long_side")))
        .select(col("media_id"), col("width"), col("height"),
          // explicit floor() on BOTH engines: Spark's double→long cast
          // truncates but DuckDB's rounds — floor makes them agree
          floor(col("width").cast("long") * col("scale_num") / col("long_side"))
            .cast("long").as("out_w"),
          floor(col("height").cast("long") * col("scale_num") / col("long_side"))
            .cast("long").as("out_h"))
        .orderBy("media_id")),

    // frame sampling: treat each payload as a "video" whose duration
    // and fps derive from its metadata bytes (deterministic stand-ins
    // for real container headers); emit one row per sampled frame at a
    // 2-frame stride. The generate/explode plumbing — one input row →
    // bounded frame rows, schema'd (media_id, frame_no, byte_off) — is
    // the real contract; a decoder swaps in for the arithmetic.
    // Oracle-checked (integer math only). Scale: explode is map-side
    // (no shuffle); frames-per-row is bounded by the metadata, so task
    // output stays proportional to input.
    "media_frame_sample" -> ((s, d) =>
      mediaTable(s, d).toDF()
        .select(col("media_id"), col("kind"), col("payload"),
          // fake header fields: n_frames = ascii(first hex char) % 64 + 1
          // — hex chars are '0'-'9','A'-'F' so the actual value set is
          // {49..58} ∪ {2..7}, not the full [1,64]; a real decoder
          // replaces this arithmetic wholesale
          (pmod(ascii(substring(hex(col("payload")), 1, 1)), lit(64)) + 1)
            .cast("long").as("n_frames"),
          (length(col("payload")) * 4).cast("long").as("frame_bytes"))
        .select(col("media_id"), col("kind"), col("n_frames"),
          explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, CAST(2 AS BIGINT))")).as("frame_no"),
          col("frame_bytes"))
        .withColumn("byte_off", col("frame_no") * col("frame_bytes"))
        .select("media_id", "kind", "frame_no", "byte_off")
        .orderBy("media_id", "frame_no")),

    // perceptual-hash stub (dHash shape): bit i set when payload byte
    // i > byte i+1 — an 8-bit locality-sensitive fingerprint; equal
    // phash buckets are the near-dup-image candidate groups. A real
    // decoder swaps the byte source for downsampled luma; the
    // bucketing contract (map-side bit math → groupable key) is the
    // real part. Oracle-checked via the same md5 hex-char derivation
    // as media_decode_stats.
    "media_phash" -> ((s, d) => {
      val withBytes = (0 to 8).foldLeft(
        Tables.documents(s, d)
          .select(col("doc_id").as("media_id"), md5(col("text")).as("h"))) {
        (df, i) =>
          df.withColumn(s"b$i",
            conv(substring(col("h"), 2 * i + 1, 2), 16, 10).cast("long"))
      }
      val phash = (0 until 8).map(i =>
        when(col(s"b$i") > col(s"b${i + 1}"), lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
      withBytes.select(col("media_id"), phash.as("phash"))
        .orderBy("media_id")
    }),

    // Image near-dup via banded perceptual-hash join — the multimodal
    // twin of the SimHash/MinHash text dedup: a 63-bit gradient hash
    // per image, split into four 16-bit LSH bands; images sharing ANY
    // band become candidates, and an exact hamming verify (≤
    // [[PhashHammingMax]]) confirms. Candidate volume is banded —
    // Σ per-bucket pairs over 2¹⁶-value band spaces, never N²/2 — and
    // the verify is a row-local xor/bit_count over four band values.
    // The "luma" bytes are CONTENT-derived and locality-sensitive —
    // the lengths of the payload's first 64 tokens (the decode stub
    // contract: a real pipeline swaps in downsampled image luma; the
    // gradient-hash → banding → verify plumbing is the real part, and
    // the oracle recomputes the same bytes in SQL). Near-duplicate
    // payloads share most "luma" values, so their gradient hashes land
    // within the hamming radius — exactly how a real pHash behaves —
    // while unrelated payloads need ≥1 of 4 16-bit bands to collide.
    "media_phash_neardup" -> ((s, d) => {
      // the corpus is one input split, and the 64-luma gradient-hash
      // projection below is the query's single heaviest map stage —
      // round-robin it across the cluster first (Widen no-ops at scale)
      val hh = Widen(Tables.documents(s, d)
          .select(col("doc_id").as("media_id"), col("text")))
        .select(col("media_id"), split(col("text"), " ", -1).as("tk"))
      // try_element_at: past-the-end tokens read as luma 0 (ANSI
      // element_at THROWS out of bounds; DuckDB's list index is
      // NULL-past-end, mirrored by the same coalesce). The luma mixes
      // token length WITH the token's last character: a length-only
      // feature makes any uniformly-token-edited copy (e.g. the scale
      // sweep's suffixed replicas) a bit-exact clone, collapsing the
      // whole corpus into a few giant buckets — content in the byte
      // keeps unrelated docs decorrelated while single-token edits
      // still move only one byte (≤2 gradient bits).
      val bytes = (0 to 63).map { i =>
        val t = s"try_element_at(tk, ${i + 1})"
        coalesce(
          (length(expr(t)) * lit(131L)) + expr(s"ascii(right($t, 1))"),
          lit(0L)).cast("long")
      }
      val bit = (0 to 62).map(i =>
        when(bytes(i) > bytes(i + 1), lit(1L)).otherwise(lit(0L)))
      val bands = (0 to 3).map { j =>
        val hi = math.min(j * 16 + 15, 62)
        (j * 16 to hi).map(i => bit(i) * lit(1L << (i - j * 16)))
          .reduce(_ + _).as(s"band$j")
      }
      val sig = hh.select(col("media_id") +: bands: _*).localCheckpoint(true)
      val ex0 = sig.select(col("media_id"),
        posexplode(array((0 to 3).map(j => col(s"band$j")): _*))
          .as(Seq("j", "bv")))
      // stop-band cap (the HotGramDfCap pattern): a band value shared
      // by more than [[PhashBandCap]] images pairs quadratically in
      // its bucket — drop it BEFORE the join, bounding candidates at
      // cap × rows. A bucket that hot is a degenerate feature (blank
      // frames, boilerplate thumbnails), not near-dup evidence; cap ≫
      // every bucket at the test scales, so oracles are unchanged.
      val kept = ex0.groupBy("j", "bv").agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= PhashBandCap).select("j", "bv")
      val ex = ex0.join(kept, Seq("j", "bv"), "left_semi")
      val cands = ex.as("x").join(ex.as("y"),
          col("x.j") === col("y.j") && col("x.bv") === col("y.bv") &&
            col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("ma"), col("y.media_id").as("mb"))
        .distinct()
      val va = (0 to 3).map(j => col(s"band$j").as(s"a$j"))
      val vb = (0 to 3).map(j => col(s"band$j").as(s"b$j"))
      cands
        .join(sig.select(col("media_id").as("ma") +: va: _*), "ma")
        .join(sig.select(col("media_id").as("mb") +: vb: _*), "mb")
        .withColumn("hamming", (0 to 3).map(j =>
          expr(s"bit_count(a$j ^ b$j)").cast("long")).reduce(_ + _))
        .filter(col("hamming") <= PhashHammingMax)
        .select(col("ma").as("media_id_a"), col("mb").as("media_id_b"),
          col("hamming"))
        .orderBy("media_id_a", "media_id_b")
    })
  )

  /** Near-dup hamming radius. 4 bands guarantee every pair at hamming
    * ≤ 3 shares a band (pigeonhole: 3 differing bits can spoil at most
    * 3 of 4 bands) — the banding is exact at this radius, not just a
    * recall heuristic. */
  val PhashHammingMax = 3L

  /** Per-(band, value) bucket cap for the near-dup join; buckets past
    * it are dropped before pairing (see the query's scaladoc). */
  val PhashBandCap = 1000L

  val oracles: Map[String, String] = Map(
    // decode parity: the PNG GENERATOR's dims derive from md5(text);
    // byte k of the digest is the hex pair at chars 2k+1..2k+2,
    // reconstructed with ascii arithmetic (DuckDB 1.0 has no hex→int
    // cast). width = 8 + b0*2, height = 8 + b1*2, channels = 1 when b2
    // even else 3 mirror pngTable exactly; the Spark side recovers
    // these by really decoding the PNG, so n_ok = count(*) asserts
    // every payload decoded.
    "media_decode_stats" ->
      """WITH m AS (SELECT 'img/' || source AS kind, md5(text) AS h FROM documents),
        |hx AS (SELECT kind,
        |  ascii(substr(h, 1, 1)) AS a1, ascii(substr(h, 2, 1)) AS a2,
        |  ascii(substr(h, 3, 1)) AS a3, ascii(substr(h, 4, 1)) AS a4,
        |  ascii(substr(h, 5, 1)) AS a5, ascii(substr(h, 6, 1)) AS a6
        |  FROM m),
        |b AS (SELECT kind,
        |  (CASE WHEN a1 >= 97 THEN a1 - 87 ELSE a1 - 48 END) * 16
        |    + (CASE WHEN a2 >= 97 THEN a2 - 87 ELSE a2 - 48 END) AS b0,
        |  (CASE WHEN a3 >= 97 THEN a3 - 87 ELSE a3 - 48 END) * 16
        |    + (CASE WHEN a4 >= 97 THEN a4 - 87 ELSE a4 - 48 END) AS b1,
        |  (CASE WHEN a5 >= 97 THEN a5 - 87 ELSE a5 - 48 END) * 16
        |    + (CASE WHEN a6 >= 97 THEN a6 - 87 ELSE a6 - 48 END) AS b2
        |  FROM hx),
        |d AS (SELECT kind, 8 + b0 * 2 AS w, 8 + b1 * 2 AS ht,
        |             CASE WHEN b2 % 2 = 0 THEN 1 ELSE 3 END AS ch
        |      FROM b)
        |SELECT kind, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(w * ht) AS BIGINT) AS px_sum,
        |       CAST(sum(w) AS BIGINT) AS width_sum,
        |       CAST(sum(ht) AS BIGINT) AS height_sum,
        |       CAST(sum(ch) AS BIGINT) AS channels_sum,
        |       CAST(count(*) AS BIGINT) AS n_ok
        |FROM d GROUP BY kind ORDER BY kind""".stripMargin,

    "media_payload_len" ->
      """SELECT doc_id AS media_id, 'img/' || source AS kind,
        |       octet_length(unhex(md5(text))) AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin,

    "media_resize_dims" ->
      """WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
        |hx AS (SELECT media_id,
        |  ascii(substr(h, 1, 1)) AS a1, ascii(substr(h, 2, 1)) AS a2,
        |  ascii(substr(h, 3, 1)) AS a3, ascii(substr(h, 4, 1)) AS a4
        |  FROM m),
        |wh AS (SELECT media_id,
        |  8 + ((CASE WHEN a1 >= 97 THEN a1 - 87 ELSE a1 - 48 END) * 16
        |      + (CASE WHEN a2 >= 97 THEN a2 - 87 ELSE a2 - 48 END)) * 2 AS width,
        |  8 + ((CASE WHEN a3 >= 97 THEN a3 - 87 ELSE a3 - 48 END) * 16
        |      + (CASE WHEN a4 >= 97 THEN a4 - 87 ELSE a4 - 48 END)) * 2 AS height
        |  FROM hx),
        |sc AS (SELECT media_id, width, height,
        |  greatest(width, height) AS long_side,
        |  least(greatest(width, height), 256) AS scale_num
        |  FROM wh)
        |SELECT media_id, width, height,
        |  CAST(floor(width * scale_num * 1.0 / long_side) AS BIGINT) AS out_w,
        |  CAST(floor(height * scale_num * 1.0 / long_side) AS BIGINT) AS out_h
        |FROM sc ORDER BY media_id""".stripMargin,

    "media_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 'img/' || source AS kind,
        |         ascii(substr(upper(md5(text)), 1, 1)) % 64 + 1 AS n_frames,
        |         octet_length(unhex(md5(text))) * 4 AS frame_bytes
        |  FROM documents)
        |SELECT media_id, kind,
        |       unnest(range(0, CAST(n_frames AS BIGINT), 2)) AS frame_no,
        |       unnest(range(0, CAST(n_frames AS BIGINT), 2)) * frame_bytes AS byte_off
        |FROM m ORDER BY media_id, frame_no""".stripMargin,

    "media_phash" -> {
      val bytes = (0 to 8).map { i =>
        val a1 = s"ascii(substr(h, ${2 * i + 1}, 1))"
        val a2 = s"ascii(substr(h, ${2 * i + 2}, 1))"
        s"(CASE WHEN $a1 >= 97 THEN $a1 - 87 ELSE $a1 - 48 END) * 16" +
          s" + (CASE WHEN $a2 >= 97 THEN $a2 - 87 ELSE $a2 - 48 END) AS b$i"
      }.mkString(",\n  ")
      val bits = (0 until 8).map(i =>
        s"(CASE WHEN b$i > b${i + 1} THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      s"""WITH m AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
         |bb AS (SELECT media_id,
         |  $bytes
         |  FROM m)
         |SELECT media_id, CAST($bits AS BIGINT) AS phash
         |FROM bb ORDER BY media_id""".stripMargin
    },

    "media_phash_neardup" -> {
      val byteDefs = (0 to 63).map(i =>
        s"coalesce(len(tk[${i + 1}]) * 131 + ascii(right(tk[${i + 1}], 1)), 0) AS b$i")
        .mkString(",\n  ")
      val bandDefs = (0 to 3).map { j =>
        val hi = math.min(j * 16 + 15, 62)
        (j * 16 to hi).map(i =>
          s"(CASE WHEN b$i > b${i + 1} THEN ${1L << (i - j * 16)} ELSE 0 END)")
          .mkString(" + ") + s" AS band$j"
      }.mkString(",\n  ")
      val ex = (0 to 3).map(j =>
        s"SELECT media_id, $j AS j, band$j AS bv FROM sg").mkString(" UNION ALL ")
      val ham = (0 to 3).map(j =>
        s"bit_count(xor(a.band$j, b.band$j))").mkString(" + ")
      s"""WITH h AS (SELECT doc_id AS media_id,
         |            string_split(text, ' ') AS tk FROM documents),
         |bb AS (SELECT media_id,
         |  $byteDefs
         |  FROM h),
         |sg AS (SELECT media_id,
         |  $bandDefs
         |  FROM bb),
         |ex0 AS ($ex),
         |kept AS (SELECT j, bv FROM ex0 GROUP BY j, bv
         |         HAVING count(*) <= $PhashBandCap),
         |ex AS (SELECT ex0.* FROM ex0 JOIN kept USING (j, bv)),
         |cand AS (SELECT DISTINCT x.media_id AS ma, y.media_id AS mb
         |         FROM ex x JOIN ex y
         |           ON x.j = y.j AND x.bv = y.bv AND x.media_id < y.media_id),
         |v AS (SELECT ma, mb, CAST($ham AS BIGINT) AS hamming
         |      FROM cand
         |      JOIN sg a ON a.media_id = ma
         |      JOIN sg b ON b.media_id = mb)
         |SELECT ma AS media_id_a, mb AS media_id_b, hamming
         |FROM v WHERE hamming <= $PhashHammingMax
         |ORDER BY media_id_a, media_id_b""".stripMargin
    }
  )
}
