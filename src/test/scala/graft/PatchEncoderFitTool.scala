package graft

/** Offline closed-form PCA fit for the patch-encoder fixture (round-13
  * verdict item 3): reads the REAL test documents, renders each through
  * [[DocPatchRenderer]], and solves for the top-8 principal components
  * of the 864-dim patch corpus — deterministic power iteration with
  * deflation on the covariance matrix, no randomness anywhere — then
  * writes the row-major 8×864 tensor as f32le to the committed fixture
  * path. Re-running the tool reproduces the committed bytes exactly.
  *
  * Centered PCA + Euclidean retrieval: [[graft.ops.Multimodal.
  * linearImageDecoder]] applies `z = Wx` with no bias, so the mean
  * contributes only a CONSTANT offset `Wμ` to every embedding —
  * Euclidean distances are unaffected (`z_a − z_b = W(x_a − x_b)`),
  * which is why the retrieval gate ranks by Euclidean distance, where
  * the centered fit is optimal, rather than cosine.
  *
  * Usage: Test/runMain graft.PatchEncoderFitTool <documentsDir> <out>
  */
object PatchEncoderFitTool {
  def main(args: Array[String]): Unit = {
    val docsDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1)
      else "src/test/resources/fixtures/patch_encoder_fitted_8x864.f32le"
    val spark = TestSpark.spark
    val texts = spark.read.parquet(s"$docsDir/documents.parquet")
      .select("doc_id", "text").collect()
      .sortBy(_.getLong(0)) // deterministic corpus order
      .map(_.getString(1))
    println(s"[fit] corpus: ${texts.length} documents from $docsDir")

    val n = texts.length
    val dIn = DocPatchRenderer.LEN
    val dim = 8
    val x = texts.map(t => DocPatchRenderer.render(t).map(b => (b & 0xFF).toDouble))
    val mu = new Array[Double](dIn)
    x.foreach(r => { var i = 0; while (i < dIn) { mu(i) += r(i); i += 1 } })
    var i = 0
    while (i < dIn) { mu(i) /= n; i += 1 }
    // covariance (upper triangle mirrored), double precision
    val cov = Array.ofDim[Double](dIn, dIn)
    x.foreach { r =>
      val d = new Array[Double](dIn)
      var a = 0
      while (a < dIn) { d(a) = r(a) - mu(a); a += 1 }
      a = 0
      while (a < dIn) {
        val da = d(a)
        var b = a
        while (b < dIn) { cov(a)(b) += da * d(b); b += 1 }
        a += 1
      }
    }
    i = 0
    while (i < dIn) {
      var j = i
      while (j < dIn) {
        cov(i)(j) /= n; cov(j)(i) = cov(i)(j); j += 1
      }
      i += 1
    }
    val trace = (0 until dIn).map(k => cov(k)(k)).sum

    // top-`dim` eigenpairs: power iteration with Gram-Schmidt deflation.
    // Deterministic init (basis vector + flat component); 500 iterations
    // is far past convergence for the well-separated spectrum this
    // corpus has (amplitudes decay 1/(1+f)).
    val vecs = Array.ofDim[Double](dim, dIn)
    val vals = new Array[Double](dim)
    for (k <- 0 until dim) {
      var v = Array.tabulate(dIn)(j => 1.0 + (if (j == k) 1.0 else 0.0))
      def orth(u: Array[Double]): Unit = {
        for (p <- 0 until k) {
          var dot = 0.0
          var j = 0
          while (j < dIn) { dot += u(j) * vecs(p)(j); j += 1 }
          j = 0
          while (j < dIn) { u(j) -= dot * vecs(p)(j); j += 1 }
        }
      }
      def normalize(u: Array[Double]): Double = {
        var s = 0.0
        var j = 0
        while (j < dIn) { s += u(j) * u(j); j += 1 }
        val nrm = math.sqrt(s)
        j = 0
        while (j < dIn) { u(j) /= nrm; j += 1 }
        nrm
      }
      orth(v); normalize(v)
      var lambda = 0.0
      for (_ <- 0 until 500) {
        val w = new Array[Double](dIn)
        var a = 0
        while (a < dIn) {
          val row = cov(a)
          var s = 0.0
          var b = 0
          while (b < dIn) { s += row(b) * v(b); b += 1 }
          w(a) = s
          a += 1
        }
        orth(w)
        lambda = normalize(w)
        v = w
      }
      // sign convention: first nonzero-largest-|component| positive, so
      // re-runs are byte-identical
      val pivot = v.indices.maxBy(j => math.abs(v(j)))
      if (v(pivot) < 0) { var j = 0; while (j < dIn) { v(j) = -v(j); j += 1 } }
      vecs(k) = v
      vals(k) = lambda
    }
    val explained = vals.sum / trace
    println(s"[fit] eigenvalues: ${vals.map(v => f"$v%.1f").mkString(", ")}")
    println(f"[fit] explained variance: ${explained * 100}%.1f%% of trace $trace%.1f")

    val buf = java.nio.ByteBuffer.allocate(dim * dIn * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (k <- 0 until dim; j <- 0 until dIn) buf.putFloat(vecs(k)(j).toFloat)
    java.nio.file.Files.write(java.nio.file.Path.of(out), buf.array())
    println(s"[fit] wrote $out (${dim}x$dIn f32le)")
  }
}
