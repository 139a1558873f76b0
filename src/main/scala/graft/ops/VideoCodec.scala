package graft.ops

/** Pure-JVM raw-video container codec — the video leg of the multimodal
  * surface, completing decode / feature-extract / resize / FRAME-SAMPLE
  * (SURVEY.md §7.6). The container ("GVID") is a real binary format
  * written and parsed byte-by-byte, in the spirit of uncompressed AVI/
  * y4m: a fixed header (magic, dims, frame count, fps) followed by
  * `nFrames` raw 24-bit RGB frames in logical order. Parsing walks the
  * header with 64-bit bounds math (a crafted frame count near 2³¹ must
  * classify as corrupt, not overflow the size check — the ImageCodec
  * BMP lesson); anything truncated, inflated, or non-positive returns
  * None, never throws.
  *
  * The training-data operations on top are the ones a video curation
  * pipeline runs before any model sees a frame:
  *  - [[sampleIndices]] — stride sampling (every k-th frame), the
  *    cheap-first reduction of temporal redundancy;
  *  - [[frameAbsDiff]] / [[keyframes]] — scene-change detection by
  *    consecutive-frame L1 distance: frame 0 plus every frame whose
  *    diff from its predecessor crosses the threshold. Keyframes are
  *    simultaneously the TEMPORAL DEDUP survivors (consecutive
  *    near-identical frames collapse onto their scene's keyframe).
  */
object VideoCodec {

  val MAGIC = Array[Byte]('G', 'V', 'I', 'D')
  val HEADER_LEN = 20

  /** Decoded video: frames kept as ONE flat buffer (no per-frame array
    * churn); `frame f` spans `[f*frameLen, (f+1)*frameLen)`. */
  final case class DecodedVideo(width: Int, height: Int, fps: Int,
                                nFrames: Int, data: Array[Byte]) {
    def frameLen: Int = 3 * width * height
  }

  def videoFileSize(w: Int, h: Int, nFrames: Int): Long =
    HEADER_LEN.toLong + 3L * w * h * nFrames

  def encode(w: Int, h: Int, fps: Int,
             frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "a video has at least one frame")
    val frameLen = 3 * w * h
    frames.foreach(f => require(f.length == frameLen,
      s"frame length ${f.length} != 3*$w*$h"))
    val total = videoFileSize(w, h, frames.length)
    require(total <= Int.MaxValue, "video exceeds 2GB buffer limit")
    val out = new Array[Byte](total.toInt)
    MAGIC.copyToArray(out, 0)
    LittleEndian.putInt(out, 4, w)
    LittleEndian.putInt(out, 8, h)
    LittleEndian.putInt(out, 12, frames.length)
    LittleEndian.putInt(out, 16, fps)
    var f = 0
    while (f < frames.length) {
      frames(f).copyToArray(out, HEADER_LEN + f * frameLen)
      f += 1
    }
    out
  }

  /** Strict parse: magic, positive dims/fps, and the byte length must
    * equal header + nFrames·3wh EXACTLY — a truncated tail or trailing
    * garbage is corrupt (this is our own container; there are no
    * optional chunks to tolerate). */
  def decode(bytes: Array[Byte]): Option[DecodedVideo] = {
    if (bytes.length < HEADER_LEN) return None
    var i = 0
    while (i < 4) { if (bytes(i) != MAGIC(i)) return None; i += 1 }
    val w = LittleEndian.getInt(bytes, 4)
    val h = LittleEndian.getInt(bytes, 8)
    val n = LittleEndian.getInt(bytes, 12)
    val fps = LittleEndian.getInt(bytes, 16)
    if (w <= 0 || h <= 0 || n <= 0 || fps <= 0) return None
    // 64-bit: w·h·n near Int.MaxValue must not wrap the size check
    if (videoFileSize(w, h, n) != bytes.length.toLong) return None
    Some(DecodedVideo(w, h, fps, n,
      java.util.Arrays.copyOfRange(bytes, HEADER_LEN, bytes.length)))
  }

  /** Every `stride`-th frame index, always including frame 0. */
  def sampleIndices(nFrames: Int, stride: Int): Seq[Int] = {
    require(stride > 0, "stride must be positive")
    0 until nFrames by stride
  }

  /** L1 distance between two frames (Σ |byte − byte| over channels). */
  def frameAbsDiff(v: DecodedVideo, f1: Int, f2: Int): Long = {
    val len = v.frameLen
    val o1 = f1 * len; val o2 = f2 * len
    var s = 0L
    var i = 0
    while (i < len) {
      val d = (v.data(o1 + i) & 0xFF) - (v.data(o2 + i) & 0xFF)
      s += (if (d < 0) -d else d)
      i += 1
    }
    s
  }

  /** Channel-byte sum of one frame (the exact integer stat the SQL
    * oracle re-derives, like q203's pixel_sum). */
  def frameSum(v: DecodedVideo, f: Int): Long = {
    val len = v.frameLen
    val off = f * len
    var s = 0L
    var i = 0
    while (i < len) { s += v.data(off + i) & 0xFF; i += 1 }
    s
  }

  /** Scene-change keyframes: frame 0, plus every frame whose L1
    * distance from its predecessor is ≥ `minDiff`. One linear pass. */
  def keyframes(v: DecodedVideo, minDiff: Long): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer(0)
    var f = 1
    while (f < v.nFrames) {
      if (frameAbsDiff(v, f - 1, f) >= minDiff) out += f
      f += 1
    }
    out.toSeq
  }
}
