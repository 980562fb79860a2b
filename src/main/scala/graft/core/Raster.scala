package graft.core

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Grayscale PNG rendering of a density raster — the render half of the
  * reference's node-density example (reference/examples/nodedensity.cpp:
  * 63-84): each cell's count is clamped to [min, max] and mapped to the
  * 8-bit gray value (val - min) * 255 / (max - min) with integer
  * division; cells without data render 0 (the calloc'd buffer). The
  * COUNTING half is the oracle-checked q_density aggregation; this kernel
  * consumes its (x, y, cnt) output, which is raster-sized, not
  * input-sized — so materializing it on the driver is the correct plan at
  * any data scale.
  */
object Raster {

  def gray(value: Long, min: Int, max: Int): Int = {
    require(max > min, s"gray range must be non-degenerate: [$min, $max]")
    val clamped = math.min(math.max(value, min), max)
    ((clamped - min) * 255 / (max - min)).toInt
  }

  def grayPng(w: Int, h: Int, cells: Iterator[(Int, Int, Long)],
              min: Int = 0, max: Int = 99999): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    cells.foreach { case (x, y, cnt) =>
      if (x >= 0 && x < w && y >= 0 && y < h)
        raster.setSample(x, y, 0, gray(cnt, min, max))
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
