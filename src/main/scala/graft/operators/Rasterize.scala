package graft.operators

/** P12 rasterization — the actual pixel-painting leg of box
  * annotation (`gst-detection-tf.py:331-337` draws with
  * cv2.rectangle; the analytics path carries draw COMMANDS,
  * DetectionPipeline.drawCommands, and this executes them). Pure JVM
  * byte-buffer painting, composed with BmpCodec.encodeRgb for a
  * viewable artifact — the engine's `autovideosink` stand-in stays
  * off the hot path, invoked only where a human wants pixels.
  *
  * Coordinates follow the BoxRecord corner quirk (Model.scala): a
  * rect is the int-truncated corners (row0=ymin·h, col0=xmin·w,
  * row1=ymax·h, col1=xmax·w).
  */
object Rasterize {

  /** Paint a `thickness`-px rectangle outline in place on packed
    * top-down RGB. Corners clamp to the frame, so partially (or
    * fully) out-of-frame boxes are safe. */
  def drawRect(rgb: Array[Byte], width: Int, height: Int,
      row0: Int, col0: Int, row1: Int, col1: Int,
      r: Int, g: Int, b: Int, thickness: Int = 2): Unit = {
    require(rgb.length == width * height * 3, "rgb size mismatch")
    val rLo = math.max(0, math.min(row0, row1))
    val rHi = math.min(height - 1, math.max(row0, row1))
    val cLo = math.max(0, math.min(col0, col1))
    val cHi = math.min(width - 1, math.max(col0, col1))
    if (rLo > rHi || cLo > cHi) return
    def paint(y: Int, x: Int): Unit = {
      val i = (y * width + x) * 3
      rgb(i) = r.toByte; rgb(i + 1) = g.toByte; rgb(i + 2) = b.toByte
    }
    var y = rLo
    while (y <= rHi) {
      var x = cLo
      while (x <= cHi) {
        // on the outline band: within `thickness` of any edge
        if (y - rLo < thickness || rHi - y < thickness ||
            x - cLo < thickness || cHi - x < thickness) paint(y, x)
        x += 1
      }
      y += 1
    }
  }

  /** One annotation: corner rect + RGB color (the drawCommands
    * shape, minus the text overlay — glyph rendering needs a font
    * asset this engine does not ship). */
  final case class Box(row0: Int, col0: Int, row1: Int, col1: Int,
      r: Int, g: Int, b: Int)

  /** Annotate a copy of the frame (the reference's defensive copy,
    * `gst-detection-tf.py:348-349`: draw on the original pixels
    * while preprocessing mutates its own buffer). */
  def annotate(rgb: Array[Byte], width: Int, height: Int,
      boxes: Seq[Box], thickness: Int = 2): Array[Byte] = {
    val out = rgb.clone()
    boxes.foreach(bx => drawRect(out, width, height,
      bx.row0, bx.col0, bx.row1, bx.col1, bx.r, bx.g, bx.b, thickness))
    out
  }

  /** Annotated frame as a viewable BMP artifact. */
  def annotateToBmp(rgb: Array[Byte], width: Int, height: Int,
      boxes: Seq[Box], thickness: Int = 2): Array[Byte] =
    Codecs.BmpCodec.encodeRgb(width, height,
      annotate(rgb, width, height, boxes, thickness))
}
