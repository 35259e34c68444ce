package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Perceptual image hashing — the image analogue of
  * [[graft.textops.SimHash]]: a 64-bit fingerprint whose Hamming
  * distance tracks VISUAL similarity, so crawled-corpus image dedup
  * rides the exact same pigeonhole chunk machinery as text simhash
  * ([[graft.textops.NearDup.fingerprintPairs]]).
  *
  * The hash is dHash (difference hash, the standard
  * gradient-comparison member of the aHash/dHash/pHash family): decode
  * (real ImageIO — PNG/JPEG/GIF/BMP ship with the JDK), box-average
  * the grayscale raster down to a 9x8 grid, then bit (row r, col c) =
  * 1 iff grid(r, c+1) > grid(r, c) — 8 comparisons per row x 8 rows.
  * Gradient comparisons are invariant under uniform brightness shift
  * and any re-encode that preserves pixel values, and robust (small
  * Hamming distance) to noise/recompression — exactly the
  * near-duplicate classes a crawl produces. Undecodable payloads hash
  * to NULL (and [[graft.textops.NearDup.fingerprintPairs]] drops null
  * fingerprints), never to a sentinel value that would bucket all
  * broken images together.
  *
  * 100 TB shape: one narrow codegen'd scan per image (decode cost is
  * the image itself, not the corpus), then the chunk-join candidate
  * path — no pair join, explicit bucket caps.
  */
object PerceptualHash {

  /** 64-bit dHash of an encoded image, or null when ImageIO cannot
    * decode the bytes. Deterministic: integer box sums over
    * floor-boundary cells, no Graphics2D interpolation, raw raster
    * samples (not getRGB's gamma-converted view — same rationale as
    * [[Multimodal.decodeImage]]).
    */
  def dhash64(bytes: Array[Byte]): java.lang.Long =
    dhash64Slice(bytes, 0, bytes.length)

  /** [[dhash64]] over an (offset, length) slice — lets the AVI frame
    * sampler ([[Multimodal.videoFrameHashes]]) hash embedded JPEG
    * chunks without copying them out.
    */
  def dhash64Slice(bytes: Array[Byte], off: Int, len: Int): java.lang.Long =
    try {
      ImageIO.setUseCache(false)
      val img = ImageIO.read(new ByteArrayInputStream(bytes, off, len))
      if (img == null) return null
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return null
      // Indexed-color images (GIF, palette PNG) store PALETTE INDICES
      // in the raster — averaging those compares palette order, not
      // brightness, and a routine palette-reordering re-encode would
      // hash arbitrarily far away. Resolve them through the color
      // model to sRGB luminance first; all other types keep the raw
      // raster samples (getRGB would gamma-convert grayscale rasters —
      // same rationale as Multimodal.decodeImage).
      val indexed = img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
      val src =
        if (!indexed) img
        else {
          val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val gg = g.createGraphics()
          try gg.drawImage(img, 0, 0, null) finally gg.dispose()
          g
        }
      val raster = src.getRaster
      val nb = math.min(raster.getNumBands, 3)
      // 9x8 box-average grid; cell (cx, cy) covers x in
      // [cx*w/9, (cx+1)*w/9) x [cy*h/8, (cy+1)*h/8). For tiny images a
      // floor range can be empty — widen to one pixel (deterministic,
      // may resample a pixel into two cells).
      val grid = Array.ofDim[Double](8, 9)
      var cy = 0
      while (cy < 8) {
        val y0 = (h.toLong * cy / 8).toInt
        val y1 = math.min(h, math.max(y0 + 1, (h.toLong * (cy + 1) / 8).toInt))
        var cx = 0
        while (cx < 9) {
          val x0 = (w.toLong * cx / 9).toInt
          val x1 = math.min(w, math.max(x0 + 1, (w.toLong * (cx + 1) / 9).toInt))
          var acc = 0.0
          var cnt = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              var b = 0
              var px = 0.0
              while (b < nb) { px += raster.getSample(x, y, b); b += 1 }
              acc += px / nb
              cnt += 1
              x += 1
            }
            y += 1
          }
          grid(cy)(cx) = if (cnt == 0) 0.0 else acc / cnt
          cx += 1
        }
        cy += 1
      }
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (grid(r)(c + 1) > grid(r)(c)) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      java.lang.Long.valueOf(hash)
    } catch { case _: Exception => null }

  case class DHash64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // undecodable bytes -> null
    override def prettyName: String = "dhash64"
    override def nullSafeEval(input: Any): Any =
      dhash64(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, { input =>
        val tmp = ctx.freshName("dh")
        s"""java.lang.Long $tmp = graft.multimodal.PerceptualHash.dhash64($input);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def dhash64(imageBytes: Column): Column =
    GraftInterop.column(DHash64Expr(GraftInterop.expression(imageBytes)))

  /** 64-bit perceptual AUDIO hash, or null when the payload is not a
    * decodable 16-bit PCM container (WAV/AIFF/AU — the JDK's
    * javax.sound set): mean |amplitude| over 65 equal time slices,
    * bit i = slice(i+1) > slice(i). Gradient comparisons over slice
    * energies are invariant under any positive GAIN change (volume
    * normalization — the routine audio re-encode) and robust to mild
    * noise, mirroring [[dhash64]]'s brightness argument for images.
    * Same deterministic floor-boundary slicing as the image grid.
    */
  def audioHash64(bytes: Array[Byte]): java.lang.Long =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return null
        val pcm = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = pcm.length / 2
        if (n < 2) return null
        val e = new Array[Double](65)
        var s = 0
        while (s < 65) {
          val i0 = (n.toLong * s / 65).toInt
          val i1 = math.min(n, math.max(i0 + 1, (n.toLong * (s + 1) / 65).toInt))
          var acc = 0.0
          var i = i0
          while (i < i1) { acc += math.abs(bb.getShort(i * 2).toDouble); i += 1 }
          e(s) = acc / (i1 - i0)
          s += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (e(b + 1) > e(b)) hash |= 1L << b
          b += 1
        }
        java.lang.Long.valueOf(hash)
      } finally in.close()
    } catch { case _: Exception => null }

  case class AudioHash64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true // undecodable bytes -> null
    override def prettyName: String = "audio_hash64"
    override def nullSafeEval(input: Any): Any =
      audioHash64(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, { input =>
        val tmp = ctx.freshName("ah")
        s"""java.lang.Long $tmp = graft.multimodal.PerceptualHash.audioHash64($input);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.longValue(); }""".stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def audio_hash64(audioBytes: Column): Column =
    GraftInterop.column(AudioHash64Expr(GraftInterop.expression(audioBytes)))
}
