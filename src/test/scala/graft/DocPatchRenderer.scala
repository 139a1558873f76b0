package graft

/** Deterministic document→image renderer shared by the offline PCA fit
  * ([[PatchEncoderFitTool]]) and the retrieval gate (ImageEmbeddingSpec).
  *
  * Stands in for a natural-image corpus, which this container cannot
  * ship: natural images are approximately LOW-RANK (their energy
  * concentrates in a few smooth spatial modes — the fact every learned
  * patch encoder exploits), so the renderer composes each document's
  * patch from 12 fixed smooth basis patterns with document-derived
  * coefficients of decaying amplitude, plus per-pixel noise. The
  * coefficients come from rolling hashes of the document's actual text,
  * so the fitted tensor is derived from the test DATA, not a formula
  * over ids; the basis is the structure, the text drives where each
  * document lands in it. A rank-8 PCA of this corpus must recover the
  * dominant modes from samples alone — which is exactly what the
  * committed fixture is: the spec then checks the recovered subspace
  * RETRIEVES (pixel-space neighbors stay neighbors in the 8-dim
  * embedding), the "fitted model" half of the decoderSetup seam. */
object DocPatchRenderer {
  val W = 18; val H = 16; val LEN = 3 * W * H
  val FACTORS = 12

  /** splitmix64 — deterministic, well-mixed. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Factor coefficient in [-1, 1), derived from the document text. */
  def coeff(text: String, f: Int): Double = {
    var h = 1125899906842597L
    var i = 0
    while (i < text.length) { h = 31 * h + text.charAt(i); i += 1 }
    val m = mix(h ^ (f.toLong * 0xD6E8FEB86659FD93L))
    ((m >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** Fixed smooth basis pattern f at (y, x, c): separable cosines with
    * frequency and channel phase drawn from f. */
  def basis(f: Int, y: Int, x: Int, c: Int): Double = {
    val fx = 1 + f % 3
    val fy = 1 + (f / 3) % 2
    val phase = (f + c) * math.Pi / 4
    math.cos(math.Pi * fx * (x + 0.5) / W + phase) *
      math.cos(math.Pi * fy * (y + 0.5) / H)
  }

  /** Amplitude of factor f — decaying, so a rank-8 fit of a rank-12
    * generator is a real (but passable) approximation problem. */
  def amp(f: Int): Double = 44.0 / (1 + f)

  /** Render one document's 18×16 RGB patch. */
  def render(text: String): Array[Byte] = {
    val out = new Array[Byte](LEN)
    val as = Array.tabulate(FACTORS)(coeff(text, _))
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        var c = 0
        while (c < 3) {
          var v = 128.0
          var f = 0
          while (f < FACTORS) {
            v += amp(f) * as(f) * basis(f, y, x, c)
            f += 1
          }
          // small per-pixel noise so the corpus is not exactly rank-12
          val p = 3 * (y * W + x) + c
          v += (mix(31L * p + 7L * text.length) % 5L).toDouble
          out(p) = math.max(0, math.min(255, math.round(v))).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }
}
