package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MultimodalOps.parseDims golden checks: round-trips against the JDK's
  * own encoders (javax.imageio writes real PNG/JPEG/GIF bytes — a true
  * independent producer), a hand-crafted progressive JPEG (SOF2) with
  * fill bytes, a golden 1x1 PNG byte constant, and the fallback contract
  * for unrecognized payloads.
  */
class MediaDimsSpec extends AnyFunSuite {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xCAFE42)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("dims round-trip against the JDK's real PNG/JPEG/GIF encoders") {
    for ((w, h) <- Seq((1, 1), (13, 7), (640, 480), (2000, 3)))
      for (fmt <- Seq("png", "jpg", "gif"))
        assert(MultimodalOps.parseDims(encode(fmt, w, h)) === Some((w, h)),
          s"$fmt ${w}x$h")
  }

  test("golden 1x1 PNG byte constant") {
    // the canonical minimal PNG: signature + IHDR(1,1,8-bit gray) +
    // IDAT(one zlib-deflated zero scanline) + IEND
    val png = Array(
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52, // len 13, "IHDR"
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, // w=1, h=1
      0x08, 0x00, 0x00, 0x00, 0x00, 0x3A, 0x7E, 0x9B, 0x55, // gray + CRC
      0x00, 0x00, 0x00, 0x0A, 0x49, 0x44, 0x41, 0x54, // len 10, "IDAT"
      0x78, 0x9C, 0x63, 0x60, 0x00, 0x00, 0x00, 0x02, 0x00, 0x01,
      0x73, 0x75, 0x01, 0x18, // IDAT CRC
      0x00, 0x00, 0x00, 0x00, 0x49, 0x45, 0x4E, 0x44, // len 0, "IEND"
      0xAE, 0x42, 0x60, 0x82).map(_.toByte)
    assert(MultimodalOps.parseDims(png) === Some((1, 1)))
  }

  test("progressive JPEG (SOF2) with marker fill bytes") {
    // SOI, APP0 (JFIF stub), a fill-padded SOF2: precision 8,
    // height 0x0150 = 336, width 0x0207 = 519
    val jpg = Array(
      0xFF, 0xD8, // SOI
      0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46, // APP0 len 4 (2 payload bytes)
      0xFF, 0xFF, 0xFF, 0xC2, // fill bytes then SOF2
      0x00, 0x0B, 0x08, 0x01, 0x50, 0x02, 0x07, 0x01, // len, prec, h, w
      0x01, 0x11, 0x00).map(_.toByte)
    assert(MultimodalOps.parseDims(jpg) === Some((519, 336)))
  }

  test("unrecognized and truncated payloads fall back to the stub") {
    val html = "<html><body>not an image</body></html>".getBytes("UTF-8")
    assert(MultimodalOps.parseDims(html) === None)
    assert(MultimodalOps.decode(html) === MultimodalOps.decodeStub(html))
    // truncated real PNG header (signature only) must not crash or lie
    assert(MultimodalOps.parseDims(
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      === None)
    // JPEG with SOS before any SOF (corrupt) → None
    assert(MultimodalOps.parseDims(
      Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x02).map(_.toByte)) === None)
    assert(MultimodalOps.parseDims(Array[Byte]()) === None)
  }

  test("recognized stills decode to one frame with real dims") {
    val png = encode("png", 33, 44)
    assert(MultimodalOps.decode(png) === ((33, 44, 1)))
  }
}
