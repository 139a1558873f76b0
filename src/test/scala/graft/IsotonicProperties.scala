package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property armor for q273's isotonic calibrator: the query computes the
  * fit through the minimax identity iso(i) = max_{j<=i} min_{k>=i}
  * rate(j..k) (pure joins/aggregates, engine-portable); the classic
  * reference is the sequential pool-adjacent-violators stack. The two
  * must agree on every input — and the fit must be monotone and
  * mean-preserving over each pooled block, the defining PAV invariants.
  */
object IsotonicProperties extends Properties("graft.isotonic") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val binsGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 20).flatMap { m =>
      Gen.listOfN(m, for {
        n <- Gen.choose(1L, 50L)
        pos <- Gen.choose(0L, n)
      } yield (n, pos))
    }

  /** The query's closed form, mirrored in plain Scala. */
  private def minimax(bins: List[(Long, Long)]): Vector[Double] = {
    val n = bins.map(_._1).toVector
    val p = bins.map(_._2).toVector
    val cn = n.scanLeft(0L)(_ + _)
    val cp = p.scanLeft(0L)(_ + _)
    def rate(j: Int, k: Int): Double =
      (cp(k + 1) - cp(j)).toDouble / (cn(k + 1) - cn(j)).toDouble
    Vector.tabulate(bins.size) { i =>
      (0 to i).map(j => (i until bins.size).map(k => rate(j, k)).min).max
    }
  }

  /** Sequential pool-adjacent-violators: blocks of (n, pos, binCount),
    * merged while the left block's rate exceeds the right's — rates
    * compared as cross-multiplied longs so the reference itself is
    * exact. Each block's fitted value repeats for every bin it pooled. */
  private def pav(bins: List[(Long, Long)]): Vector[Double] = {
    val st = scala.collection.mutable.Stack.empty[(Long, Long, Int)]
    bins.foreach { case (n, pos) =>
      var cur = (n, pos, 1)
      while (st.nonEmpty && st.top._2 * cur._1 >= cur._2 * st.top._1) {
        val t = st.pop(); cur = (t._1 + cur._1, t._2 + cur._2, t._3 + cur._3)
      }
      st.push(cur)
    }
    st.toVector.reverse.flatMap { case (bn, bp, cnt) =>
      Vector.fill(cnt)(bp.toDouble / bn.toDouble)
    }
  }

  property("minimax identity equals sequential PAV") =
    Prop.forAll(binsGen) { bins =>
      val a = minimax(bins)
      val b = pav(bins)
      a.size == b.size && a.zip(b).forall { case (x, y) =>
        math.abs(x - y) <= 1e-12 * math.max(1.0, math.abs(y)) }
    }

  property("fit is monotone non-decreasing") =
    Prop.forAll(binsGen) { bins =>
      val f = minimax(bins)
      f.zip(f.drop(1)).forall { case (a, b) => a <= b + 1e-12 }
    }

  property("fit preserves the global weighted mean") =
    Prop.forAll(binsGen) { bins =>
      val f = minimax(bins)
      val fitted = bins.zip(f).map { case ((n, _), r) => n.toDouble * r }.sum
      val actual = bins.map(_._2).sum.toDouble
      math.abs(fitted - actual) <= 1e-6 * math.max(1.0, actual)
    }
}
