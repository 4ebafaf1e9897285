package graft

/** Scratchpad: verify the JDK can WRITE an animated (multi-frame) GIF via
  * writeToSequence and read back every frame losslessly (gray palette). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val id = 13L
    val frames = (2 + id % 4).toInt
    val w = (8 + id % 8).toInt
    val h = (8 + id % 6).toInt
    def pix(f: Int, x: Int, y: Int): Int =
      ((id * 31 + f * 59 + x * 7 + y * 13) % 256).toInt

    // ---- write animated gif
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no gif writer")
    val wr = writers.next()
    println(s"canWriteSequence=${wr.canWriteSequence}")
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    for (f <- 0 until frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val v = pix(f, x, y)
        img.getRaster.setSample(x, y, 0, v)
      }
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    wr.endWriteSequence()
    ios.close()
    val bytes = out.toByteArray
    println(s"gif bytes: ${bytes.length}")

    // ---- read back all frames
    val rd = javax.imageio.ImageIO.getImageReaders(
      javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))).next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val n = rd.getNumImages(true)
    println(s"frames read: $n (expected $frames)")
    var ok = true
    for (f <- 0 until n) {
      val img = rd.read(f)
      for (y <- 0 until h; x <- 0 until w) {
        val got = (img.getRGB(x, y) >> 16) & 0xff
        val want = pix(f, x, y)
        if (got != want) { ok = false
          if (f == 0 && x < 3 && y == 0) println(s"MISMATCH f=$f x=$x y=$y got=$got want=$want") }
      }
    }
    println(s"lossless=$ok dims=${rd.read(0).getWidth}x${rd.read(0).getHeight} (want ${w}x$h)")
  }
}
