package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.ImageCodec

/** Pins the property the m2/m4 oracles depend on: 8-bit gray PNG raster
  * samples round-trip bit-exactly through the JDK's ImageIO (no gamma or
  * colorspace rescale on the raster path). If a JDK ever broke this, the
  * SQL oracles could no longer recompute decoded features from text.
  */
class ImageCodecSpec extends AnyFunSuite {

  test("all 256 sample values round-trip exactly (16x16)") {
    val px = Array.tabulate(256)(i => i.toByte)
    val png = ImageCodec.encodeGrayPng(16, 16, px)
    // a real PNG: magic bytes present
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val (w, h, out) = ImageCodec.decodeGrayPng(png)
    assert(w == 16 && h == 16)
    assert(out.toSeq == (0 until 256))
  }

  test("zero padding beyond pixels.length decodes as 0 (pad sentinel)") {
    val px = Array[Byte](50, 60, 70)
    val (w, h, out) = ImageCodec.decodeGrayPng(ImageCodec.encodeGrayPng(4, 2, px))
    assert(w == 4 && h == 2)
    assert(out.toSeq == Seq(50, 60, 70, 0, 0, 0, 0, 0))
  }

  test("non-square ASCII-range raster round-trips (m2 shape)") {
    val bytes = ("The quick brown fox jumps over the lazy dog. " * 7).getBytes("UTF-8")
    val wd = bytes.length % 64 + 1
    val ht = (bytes.length + wd - 1) / wd
    val (w, h, out) = ImageCodec.decodeGrayPng(ImageCodec.encodeGrayPng(wd, ht, bytes))
    assert(w == wd && h == ht)
    assert(out.count(_ != 0) == bytes.length)
    assert(out.take(bytes.length).toSeq == bytes.toSeq.map(b => b & 0xff))
  }

  test("undecodable blob raises, oversized raster rejected") {
    intercept[IllegalArgumentException] {
      ImageCodec.decodeGrayPng(Array[Byte](1, 2, 3, 4))
    }
    intercept[IllegalArgumentException] {
      ImageCodec.encodeGrayPng(2, 2, Array.fill(5)(1.toByte))
    }
  }

  test("dHash64: horizontal-gradient bits, brightness invariance, decode consistency") {
    // strictly increasing rows: every right neighbor is brighter -> all
    // 64 bits set -> w0 = w1 = 0xFFFFFFFF
    val grad = Array.tabulate(9 * 8)(i => i % 9 * 10)
    assert(ImageCodec.dHash64(9, 8, grad) === ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    // constant raster: no bit set
    assert(ImageCodec.dHash64(9, 8, Array.fill(72)(50)) === ((0L, 0L)))
    // dHash depends only on neighbor DIFFERENCES -> +brightness invariant
    val noisy = Array.tabulate(32 * 12)(i => (i * 37 + i / 32 * 11) % 90)
    val brighter = noisy.map(_ + 100)
    assert(ImageCodec.dHash64(32, 12, noisy) === ImageCodec.dHash64(32, 12, brighter))
    // hash over a real PNG round-trip == hash over the raw raster
    val bytes = ("pack my box with five dozen liquor jugs " * 9).getBytes("UTF-8")
    val h = (bytes.length + 31) / 32
    val padded = bytes ++ Array.fill(32 * h - bytes.length)(0.toByte)
    val (w, hh, px) = ImageCodec.decodeGrayPng(ImageCodec.encodeGrayPng(32, h, padded))
    assert(ImageCodec.dHash64(w, hh, px) ===
      ImageCodec.dHash64(32, h, padded.map(b => b & 0xff)))
    intercept[IllegalArgumentException] { ImageCodec.dHash64(3, 3, Array.fill(8)(0)) }
  }
}
