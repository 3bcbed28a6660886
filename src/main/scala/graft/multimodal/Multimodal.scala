package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct.
  *
  * The image path is REAL end-to-end: [[fixtureImages]] encodes
  * deterministic two-band PNG/BMP images with `javax.imageio` (pure
  * JVM, no native codecs) and [[decodeImageFeatures]] decodes arbitrary
  * PNG/BMP/JPEG bytes back to per-image integer features (dimensions,
  * per-channel sums, vertical-edge energy) in a `mapPartitions` — the
  * legitimate black-box-decode shape: the codec call cannot be a
  * Catalyst expression, so it runs once per row inside the partition
  * iterator with zero shuffle, and everything downstream operates on
  * the compact features. Audio/video decoders would slot into the same
  * shape (bytes in, fixed-width features out).
  *
  * Scale notes: media blobs make wide rows — keep
  * `spark.sql.files.maxPartitionBytes` small enough that a partition of
  * blobs fits executor memory, and never collect the bytes column.
  * Feature extraction is per-row (no shuffle); only the downstream
  * dedup/similarity steps shuffle, and those operate on the compact
  * features, never the blobs.
  */
object Multimodal {

  /** Canonical media row schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Demo/test helper: lift a text table into the media schema (UTF-8
    * bytes, synthetic metadata).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        octet_length(col(textCol)).as("width"),
        lit(1).as("height"),
        lit(3).as("channels"),
        lit(null).cast(IntegerType).as("sample_rate"),
        octet_length(col(textCol)).cast(LongType).as("duration_ms")).as("meta"))

  /** Cheap byte-level stats — the non-stub part any pipeline wants
    * before decode (size filters, magic-byte checks, chunk hashes).
    */
  def byteStats(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(bytesCol)).cast(LongType))
      .withColumn("chunk_fp", md5(col(bytesCol)))

  /** The deterministic fixture-image spec for `id`: a `w x h` two-band
    * image — the top `h/2` rows solid colour A, the rest solid colour
    * B, colours and dimensions pure integer functions of the id. Every
    * derived quantity (channel sums, edge energy) is therefore
    * computable analytically by any engine, which is what lets a
    * SQL-only oracle check a codec round-trip it cannot perform
    * itself.
    */
  final case class FixtureSpec(
      id: Long, fmt: String, w: Int, h: Int, top: Int,
      ar: Int, ag: Int, ab: Int, br: Int, bg: Int, bb: Int)

  def fixtureSpec(id: Long): FixtureSpec = FixtureSpec(
    id = id,
    fmt = if (id % 2 == 0) "png" else "bmp",
    w = (8 + id % 5).toInt,
    h = (8 + id % 3).toInt,
    top = ((8 + id % 3) / 2).toInt,
    ar = ((id * 37) % 256).toInt, ag = ((id * 59) % 256).toInt,
    ab = ((id * 83) % 256).toInt, br = ((id * 97) % 256).toInt,
    bg = ((id * 101) % 256).toInt, bb = ((id * 103) % 256).toInt)

  /** Encode the fixture image for `id` as real PNG or BMP bytes via
    * `javax.imageio` (both formats are lossless for 24-bit RGB, so the
    * decode side recovers exact pixel values).
    */
  def encodeFixture(id: Long): Array[Byte] = {
    val s = fixtureSpec(id)
    val img = new java.awt.image.BufferedImage(
      s.w, s.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < s.h) {
      val rgb =
        if (y < s.top) (s.ar << 16) | (s.ag << 8) | s.ab
        else (s.br << 16) | (s.bg << 8) | s.bb
      var x = 0
      while (x < s.w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, s.fmt, bos)
    bos.toByteArray
  }

  /** One row per input id with REAL encoded image bytes:
    * (id, fmt, bytes). Encoding is a per-row black box (ImageIO has no
    * expression form), so it runs as a deterministic UDF — the one
    * place in this engine where a UDF is the right tool rather than a
    * codegen regression.
    */
  def fixtureImages(ids: DataFrame, idCol: String): DataFrame = {
    val enc = udf((id: Long) => encodeFixture(id))
    val fmt = udf((id: Long) => fixtureSpec(id).fmt)
    ids.select(col(idCol),
      fmt(col(idCol).cast(LongType)).as("fmt"),
      enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** ImageIO decode honoring the drop-on-undecodable contract for
    * CORRUPT bytes too: `ImageIO.read` returns null for bytes no
    * registered reader recognizes, but THROWS `IIOException` for a
    * recognized-but-truncated stream — and plugin readers can throw
    * unchecked exceptions (`ArrayIndexOutOfBoundsException`,
    * `IllegalArgumentException`, `CMMException`) on malformed headers.
    * All of these must drop the row, not kill the task, so the catch
    * is `NonFatal` (the audio decoder follows the same convention).
    */
  private def readImageOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }

  /** Feature row a decoded image reduces to. All-integer so an
    * analytic oracle can match it exactly: per-channel pixel sums and
    * the vertical-edge energy (sum over vertically-adjacent pixel
    * pairs of the L1 colour distance).
    */
  final case class ImageFeatures(
      media_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, edge_sum: Long)

  /** REAL image decode: PNG/BMP/JPEG bytes -> [[ImageFeatures]], one
    * output row per decodable input row (undecodable bytes are
    * dropped; production would route them to a quarantine sink).
    *
    * `mapPartitions`, not an expression: the codec is a per-row black
    * box, and the partition iterator amortizes codec setup while
    * keeping the work fully distributed — no shuffle, blobs never
    * leave their partition, only the fixed-width features flow on.
    */
  def decodeImageFeatures(
      df: DataFrame, idCol: String, bytesCol: String = "bytes"): DataFrame = {
    val input = df.select(col(idCol).cast(LongType), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else {
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img = readImageOrNull(bytes)
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L; var edge = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
                sr += pr; sg += pg; sb += pb
                if (y + 1 < h) {
                  val q = img.getRGB(x, y + 1)
                  edge += math.abs(pr - ((q >> 16) & 0xff)) +
                    math.abs(pg - ((q >> 8) & 0xff)) +
                    math.abs(pb - (q & 0xff))
                }
                x += 1
              }
              y += 1
            }
            Some(ImageFeatures(id, w.toLong, h.toLong, sr, sg, sb, edge))
          }
        }
      }
    }(Encoders.product[ImageFeatures])
      .toDF()
      .withColumnRenamed("media_id", idCol)
  }

  /** Per-image 64-bit perceptual hash (grid average-hash): decode,
    * partition the image into an 8x8 grid by INTEGER pixel coordinates
    * (cell (i,j) covers rows [i*h/8, (i+1)*h/8) and the analogous
    * column range — no resampling, so there is no interpolation
    * convention to disagree on), and set bit (i,j) when the cell's
    * mean gray meets the image's global mean gray. The comparison is
    * CROSS-MULTIPLIED integer arithmetic (`cellSum * totalPx >=
    * totalSum * cellPx`, gray = r+g+b unscaled) — zero floating point,
    * so any engine that knows the pixel values derives the identical
    * 64 bits, which is what lets the SQL oracle replay the hash
    * analytically from the fixture-image spec it cannot decode.
    *
    * Output `(idCol, simhash)` uses the SAME 64-char bit-string
    * convention as [[graft.operators.Dedup.simhash64]], so the
    * pigeonhole Hamming pair join
    * ([[graft.operators.Dedup.simhashIncrementalPairsFromSigs]]
    * with `sigChars = 64`) consumes image hashes unchanged — image
    * near-dup rides the exact text-dedup machinery: decode once per
    * row inside the partition (blobs never shuffle), band-join the
    * 16-bit chunks, `bit_count` the distance. Undecodable bytes drop,
    * like [[decodeImageFeatures]].
    */
  def imageGridHash(
      df: DataFrame, idCol: String, bytesCol: String = "bytes"): DataFrame = {
    val input = df.select(col(idCol).cast(LongType), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else {
          val id = r.getLong(0)
          val img = readImageOrNull(r.getAs[Array[Byte]](1))
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            var totalSum = 0L
            val cellSum = Array.ofDim[Long](8, 8)
            val cellPx = Array.ofDim[Long](8, 8)
            var i = 0
            while (i < 8) {
              val rLo = i * h / 8; val rHi = (i + 1) * h / 8
              var j = 0
              while (j < 8) {
                val cLo = j * w / 8; val cHi = (j + 1) * w / 8
                var s = 0L
                var y = rLo
                while (y < rHi) {
                  var x = cLo
                  while (x < cHi) {
                    val p = img.getRGB(x, y)
                    s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                    x += 1
                  }
                  y += 1
                }
                cellSum(i)(j) = s
                cellPx(i)(j) = (rHi - rLo).toLong * (cHi - cLo)
                totalSum += s
                j += 1
              }
              i += 1
            }
            val totalPx = w.toLong * h
            val sb = new java.lang.StringBuilder(64)
            // BigInt cross-multiplication: both products reach
            // ~765*(w*h)^2, which overflows Long past ~110 megapixels
            // — 64 BigInt comparisons per image is noise next to the
            // decode, and the exact-integer contract holds at any size
            val bigTotalSum = BigInt(totalSum)
            val bigTotalPx = BigInt(totalPx)
            i = 0
            while (i < 8) {
              var j = 0
              while (j < 8) {
                sb.append(
                  if (cellPx(i)(j) > 0 &&
                    BigInt(cellSum(i)(j)) * bigTotalPx >=
                      bigTotalSum * BigInt(cellPx(i)(j))) '1'
                  else '0')
                j += 1
              }
              i += 1
            }
            Some(GridHash(id, sb.toString))
          }
        }
      }
    }(Encoders.product[GridHash])
      .toDF()
      .withColumnRenamed("media_id", idCol)
  }

  /** Row shape of [[imageGridHash]]. */
  final case class GridHash(media_id: Long, simhash: String)

  /** Grid-fixture bit (i,j) for `seed`: parity of the first hex digit
    * of `md5("seed:i:j")` — well-mixed across seeds (unlike any small
    * linear congruence, whose pattern would collapse to `seed mod m`),
    * and computable verbatim by a SQL engine's `md5`.
    */
  def gridFixtureBit(seed: Long, i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xf) % 2
  }

  /** Deterministic 32x32 grid fixture image for `id`: an 8x8 grid of
    * 4x4-pixel cells, cell (i,j) solid black or white by
    * [[gridFixtureBit]] of `seed = id % base` — so ids `k` and
    * `base + k` share a pattern — and ids `>= base` additionally flip
    * the single cell `seed % 64`. Under [[imageGridHash]] (cell value
    * is exactly 0 or 765, the global mean strictly between for any
    * mixed pattern) the hash IS the bit pattern, so each incoming
    * image sits at Hamming distance exactly 1 from its base twin and
    * ~32 from everything else: the near-dup structure is PLANTED and
    * the pair set is exact — unlike the two-band [[fixtureSpec]]
    * images, whose hashes collapse to a handful of values. Always
    * PNG (lossless).
    */
  /** Render the shared 32x32 grid-fixture geometry — an 8x8 grid of
    * 4x4-pixel solid cells, cell (i,j) white when `bitFn(i, j) == 1`,
    * black otherwise — as PNG bytes. ONE painter for both the image
    * fixtures and the video frames, so the geometry their analytic
    * oracles assume cannot diverge between the two.
    */
  private def paintGrid(bitFn: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        val rgb = if (bitFn(i, j) == 1) 0xffffff else 0x000000
        var y = i * 4
        while (y < i * 4 + 4) {
          var x = j * 4
          while (x < j * 4 + 4) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        j += 1
      }
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encodeGridFixture(id: Long, base: Long): Array[Byte] = {
    val seed = id % base
    val flip = if (id >= base) (seed % 64).toInt else -1
    paintGrid((i, j) =>
      gridFixtureBit(seed, i, j) ^ (if (i * 8 + j == flip) 1 else 0))
  }

  /** One row per input id with real PNG bytes of its grid fixture
    * (same per-row deterministic-UDF shape as [[fixtureImages]]).
    */
  def gridFixtureImages(ids: DataFrame, idCol: String, base: Long): DataFrame = {
    val enc = udf((id: Long) => encodeGridFixture(id, base))
    ids.select(col(idCol), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** Nearest-neighbor image resize: decode, sample source pixel
    * `(y*h div targetH, x*w div targetW)` for every target pixel, and
    * re-encode as PNG (lossless) — `(idCol, bytes)` out, undecodable
    * rows dropped. NEAREST by integer division is deliberate: Java2D's
    * `drawImage` interpolation has no cross-engine replay, while this
    * mapping is pure integer arithmetic any engine reproduces — the
    * resize twin of [[imageGridHash]]'s no-resample rule, and the
    * preprocessing step a vision-model pipeline runs before feature
    * extraction. Same `mapPartitions` black-box-codec shape as
    * [[decodeImageFeatures]]: blobs never shuffle, codec setup
    * amortizes per partition.
    */
  def resizeImages(
      df: DataFrame, idCol: String, targetW: Int, targetH: Int,
      bytesCol: String = "bytes"): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val input = df.select(col(idCol).cast(LongType), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else {
          val id = r.getLong(0)
          val img = readImageOrNull(r.getAs[Array[Byte]](1))
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < targetH) {
              val sy = y * h / targetH
              var x = 0
              while (x < targetW) {
                out.setRGB(x, y, img.getRGB(x * w / targetW, sy))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some(ResizedImage(id, bos.toByteArray))
          }
        }
      }
    }(Encoders.product[ResizedImage])
      .toDF()
      .withColumnRenamed("media_id", idCol)
  }

  /** Row shape of [[resizeImages]]. */
  final case class ResizedImage(media_id: Long, bytes: Array[Byte])

  /** Frame `f` of fixture video `id`: the id's base grid pattern
    * ([[gridFixtureBit]]) with cells `(id%64 + k) mod 64` for `k < f`
    * flipped — exactly one cell of "motion" per frame step, so every
    * per-frame statistic is closed-form. Real PNG bytes, same cell
    * geometry as [[encodeGridFixture]].
    */
  def encodeGridVideoFrame(id: Long, f: Int): Array[Byte] =
    paintGrid { (i, j) =>
      val rel = (((i * 8 + j - (id % 64)) % 64) + 64) % 64
      gridFixtureBit(id, i, j) ^ (if (rel < f) 1 else 0)
    }

  /** One row per (video id, sampled frame): `(idCol, frame_ms,
    * bytes)` — the frame-sampling explode composed with REAL per-frame
    * encoding, i.e. what [[frameSample]]'s plumbing plugs into when a
    * codec exists. `nFrames` frames every `everyMs`.
    */
  def videoFrameFixtures(ids: DataFrame, idCol: String,
      nFrames: Int = 8, everyMs: Long = 250L): DataFrame = {
    val enc = udf((id: Long, f: Int) => encodeGridVideoFrame(id, f))
    ids.select(col(idCol), explode(sequence(
        lit(0L), lit((nFrames - 1) * everyMs), lit(everyMs))).as("frame_ms"))
      .withColumn("bytes",
        enc(col(idCol).cast(LongType), (col("frame_ms") / everyMs).cast("int")))
  }

  /** Window-amplitude bit of the audio grid fixture: md5 parity over
    * `"seed:w"` — the audio twin of [[gridFixtureBit]] (different
    * arity, so the two fixture families can never collide on a seed).
    */
  def audioGridBit(seed: Long, w: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$w".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xf) % 2
  }

  /** Deterministic WAV fixture with PLANTED near-dup structure — the
    * audio twin of [[encodeGridFixture]]: 64 windows of `nPerWin`
    * samples; window `w` carries a fixed sawtooth
    * `((17·k mod 64) − 32)` scaled by 900 (loud) or 100 (quiet)
    * according to [[audioGridBit]] of `seed = id % base`; ids
    * `>= base` flip the single window `seed % 64`. Under
    * [[audioEnergyHash]] every loud window sits above the clip's mean
    * window energy and every quiet one below (the mean is strictly
    * between for any mixed pattern), so the hash IS the bit pattern
    * and each incoming clip is at Hamming distance exactly 1 from its
    * base twin, ~32 from everything else. PCM16LE mono in a real RIFF
    * container ([[encodeWavFixture]]'s header).
    */
  def encodeWavGridFixture(
      id: Long, base: Long, nPerWin: Int = 32, rate: Int = 8000): Array[Byte] = {
    val seed = id % base
    val flip = if (id >= base) (seed % 64).toInt else -1
    val n = 64 * nPerWin
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var w = 0
    while (w < 64) {
      val amp = if ((audioGridBit(seed, w) ^ (if (w == flip) 1 else 0)) == 1) 900 else 100
      var k = 0
      while (k < nPerWin) {
        bb.putShort((amp * ((17 * k % 64) - 32)).toShort)
        k += 1
      }
      w += 1
    }
    bb.array()
  }

  /** One row per id with [[encodeWavGridFixture]] bytes (deterministic
    * UDF, the [[gridFixtureImages]] shape).
    */
  def audioGridFixtures(ids: DataFrame, idCol: String, base: Long): DataFrame = {
    val enc = udf((id: Long) => encodeWavGridFixture(id, base))
    ids.select(col(idCol), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** Per-clip 64-bit energy fingerprint — the audio member of the
    * `simhash64` convention: decode (PCM16LE, channels folded like
    * [[decodeAudioFeatures]]), split the sample stream into 64
    * consecutive windows by INTEGER ranges `[w·n/64, (w+1)·n/64)`,
    * and set bit `w` when the window's absolute-amplitude sum meets
    * the clip mean — cross-multiplied exact integers
    * (`winAbs·n >= totalAbs·winLen`, BigInt so no clip length can
    * overflow), zero floating point, so a SQL oracle replays the bits
    * from a closed-form sample formula without parsing RIFF.
    *
    * Output `(idCol, simhash)` in [[graft.operators.Dedup.simhash64]]'s
    * 64-char bit-string convention: audio near-dup rides the SAME
    * pigeonhole Hamming join as text and images
    * ([[graft.operators.Dedup.simhashIncrementalPairsFromSigs]],
    * `sigChars = 64`) — blobs never shuffle, only the 64-bit
    * fingerprint flows on. Undecodable bytes and clips shorter than
    * 64 samples drop.
    */
  def audioEnergyHash(
      df: DataFrame, idCol: String, bytesCol: String = "bytes"): DataFrame = {
    val input = df.select(col(idCol).cast(LongType), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else try {
          val id = r.getLong(0)
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getChannels <= 0 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            None
          else {
            val data = in.readAllBytes()
            val nCh = fmt.getChannels
            val n = data.length / 2 / nCh
            if (n < 64) None
            else {
              val absArr = new Array[Long](n)
              var total = 0L
              var t = 0
              while (t < n) {
                var v = 0; var c = 0
                while (c < nCh) {
                  val o = (t * nCh + c) * 2
                  v += ((data(o) & 0xff) | (data(o + 1) << 8))
                  c += 1
                }
                val a = math.abs(v.toLong)
                absArr(t) = a
                total += a
                t += 1
              }
              val sb = new java.lang.StringBuilder(64)
              var w = 0
              while (w < 64) {
                val lo = w * n / 64; val hi = (w + 1) * n / 64
                var s = 0L
                var k = lo
                while (k < hi) { s += absArr(k); k += 1 }
                val bit = BigInt(s) * n >= BigInt(total) * (hi - lo)
                sb.append(if (bit) '1' else '0')
                w += 1
              }
              Some((id, sb.toString))
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) => None
        }
      }
    }(Encoders.product[(Long, String)])
      .toDF(idCol, "simhash")
  }

  /** Twin-planted video frame: [[encodeGridVideoFrame]] of
    * `seed = id % base` with, for ids `>= base`, ONE extra cell
    * (`(seed%64 + 40) mod 64` — outside the motion span, so the
    * majority vote is untouched by frame dynamics) flipped in EVERY
    * frame. Bitwise majority across frames then differs from the base
    * video in exactly that cell.
    */
  def encodeGridVideoFrameTwin(seed: Long, f: Int, extraFlip: Int): Array[Byte] =
    paintGrid { (i, j) =>
      val rel = (((i * 8 + j - (seed % 64)) % 64) + 64) % 64
      gridFixtureBit(seed, i, j) ^ (if (rel < f) 1 else 0) ^
        (if (i * 8 + j == extraFlip) 1 else 0)
    }

  /** One row per (id, sampled frame) with [[encodeGridVideoFrameTwin]]
    * bytes: ids `< base` are originals, ids `>= base` planted twins.
    */
  def videoNearDupFixtures(ids: DataFrame, idCol: String, base: Long,
      nFrames: Int = 8, everyMs: Long = 250L): DataFrame = {
    val enc = udf { (id: Long, f: Int) =>
      val seed = id % base
      val extra = if (id >= base) (((seed % 64) + 40) % 64).toInt else -1
      encodeGridVideoFrameTwin(seed, f, extra)
    }
    ids.select(col(idCol), explode(sequence(
        lit(0L), lit((nFrames - 1) * everyMs), lit(everyMs))).as("frame_ms"))
      .withColumn("bytes",
        enc(col(idCol).cast(LongType), (col("frame_ms") / everyMs).cast("int")))
  }

  /** Reduce per-frame fingerprints to ONE per-video signature by
    * bitwise MAJORITY (ties to 1: `2·ones >= nFrames`) — integer-exact,
    * so the oracle derives it closed-form. Input is any frame-level
    * `(idCol, simhash)` frame (e.g. [[imageGridHash]] over sampled
    * frames); output `(idCol, simhash)` joins into the same
    * `sigChars = 64` pigeonhole Hamming machinery as text, image and
    * audio fingerprints — the whole dedup family is modality-blind
    * past this point. Relational shape: one explode to (id, pos, bit)
    * — 64·nFrames small rows per video, never pixels — one
    * partial-agged majority groupBy, one ordered re-assembly.
    */
  def majorityHash(
      frameSigs: DataFrame, idCol: String, sigChars: Int = 64): DataFrame =
    frameSigs
      .select(col(idCol), col("simhash"))
      .withColumn("__p", explode(sequence(lit(1), lit(sigChars))))
      .withColumn("__b", expr("substring(simhash, __p, 1)"))
      .groupBy(col(idCol), col("__p"))
      .agg(sum(when(col("__b") === "1", 1L).otherwise(0L)).as("__ones"),
        count(lit(1)).as("__n"))
      .withColumn("__bit",
        when(col("__ones") * 2 >= col("__n"), lit("1")).otherwise(lit("0")))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__p"), col("__bit")))),
          x => x.getField("__bit")),
        "").as("simhash"))

  /** Deterministic WAV fixture for `id`: PCM16LE mono at `rate` Hz,
    * `n` samples, sample `t` = `((id*37 + t*17) mod 2048) - 1024` — a
    * sawtooth whose every derived statistic is closed-form, so a SQL
    * oracle replays the decoded features without parsing RIFF. The
    * bytes are a REAL WAV container (44-byte RIFF header, hand-rolled
    * so the encoding is bit-deterministic), decodable by any WAV
    * reader including [[decodeAudioFeatures]]'s `javax.sound` path.
    */
  def encodeWavFixture(id: Long, n: Int = 2000, rate: Int = 8000): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var t = 0
    while (t < n) {
      bb.putShort((((id * 37 + t * 17) % 2048) - 1024).toShort)
      t += 1
    }
    bb.array()
  }

  /** One row per input id with real WAV bytes (same deterministic-UDF
    * shape as [[fixtureImages]]).
    */
  def audioFixtures(ids: DataFrame, idCol: String,
      n: Int = 2000, rate: Int = 8000): DataFrame = {
    val enc = udf((id: Long) => encodeWavFixture(id, n, rate))
    ids.select(col(idCol), enc(col(idCol).cast(LongType)).as("bytes"))
  }

  /** Feature row a decoded audio clip reduces to — all-integer, like
    * [[ImageFeatures]], so an analytic oracle matches exactly:
    * `sum_abs` (total absolute amplitude), `max_abs` (peak), and
    * `zero_crossings` (sign changes between consecutive samples, the
    * classic cheap spectral proxy).
    */
  final case class AudioFeatures(
      media_id: Long, sample_rate: Long, n_samples: Long,
      sum_abs: Long, max_abs: Long, zero_crossings: Long)

  /** REAL audio decode: WAV bytes -> [[AudioFeatures]] via
    * `javax.sound.sampled.AudioSystem` (RIFF parse, format
    * validation), one row per decodable input; non-audio bytes are
    * dropped. Accepts PCM16 mono/stereo little-endian — stereo folds
    * to per-frame sums channel-major. Same `mapPartitions` black-box
    * shape as the image codec: the blob never shuffles, only the
    * fixed-width features flow on.
    */
  def decodeAudioFeatures(
      df: DataFrame, idCol: String, bytesCol: String = "bytes"): DataFrame = {
    val input = df.select(col(idCol).cast(LongType), col(bytesCol))
    input.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else try {
          val id = r.getLong(0)
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val fmt = in.getFormat
          // channels <= 0: a malformed fmt chunk would otherwise
          // divide by zero below — drop like any other bad container
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getChannels <= 0 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            None
          else {
            val data = in.readAllBytes()
            val nCh = fmt.getChannels
            val n = data.length / 2 / nCh
            var sumAbs = 0L; var maxAbs = 0L; var zc = 0L
            var prev = 0; var t = 0
            while (t < n) {
              // fold channels to one value per frame (mono passthrough)
              var v = 0; var c = 0
              while (c < nCh) {
                val o = (t * nCh + c) * 2
                v += ((data(o) & 0xff) | (data(o + 1) << 8))
                c += 1
              }
              val a = math.abs(v.toLong)
              sumAbs += a
              if (a > maxAbs) maxAbs = a
              if (t > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) zc += 1
              prev = v
              t += 1
            }
            Some(AudioFeatures(id, fmt.getSampleRate.toLong, n.toLong,
              sumAbs, maxAbs, zc))
          }
        } catch {
          // UnsupportedAudioFileException for unrecognized containers,
          // IOException for truncation, and NonFatal for the unchecked
          // exceptions codec plumbing throws on malformed headers —
          // all drop the row rather than kill the task.
          case scala.util.control.NonFatal(_) => None
        }
      }
    }(Encoders.product[AudioFeatures])
      .toDF()
      .withColumnRenamed("media_id", idCol)
  }

  /** Frame-sampling plumbing for video rows: one output row per sampled
    * frame offset (every `everyMs` within `meta.duration_ms`). The
    * per-frame decode would plug into the exploded rows.
    */
  def frameSample(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)),
          lit(everyMs))))

  /** Full real pipeline: id rows -> encoded image bytes -> byte stats
    * -> decoded per-image features (joined on the id, so the feature
    * extraction and the byte-level stats each see the blobs exactly
    * once).
    */
  def featurize(ids: DataFrame, idCol: String): DataFrame = {
    val imgs = fixtureImages(ids, idCol)
    byteStats(imgs).drop("bytes")
      .join(decodeImageFeatures(imgs, idCol), idCol)
  }
}
