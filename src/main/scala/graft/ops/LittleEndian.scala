package graft.ops

/** Shared little-endian byte helpers for the binary codecs — one
  * implementation for BMP and WAV (a bounds/overflow fix must never
  * have to be applied twice). */
private[ops] object LittleEndian {
  def putInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
    a(off + 2) = (v >>> 16).toByte; a(off + 3) = (v >>> 24).toByte
  }
  def putShort(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = v.toByte; a(off + 1) = (v >>> 8).toByte
  }
  def getInt(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8) |
      ((a(off + 2) & 0xFF) << 16) | ((a(off + 3) & 0xFF) << 24)
  def getShort(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8)
}
