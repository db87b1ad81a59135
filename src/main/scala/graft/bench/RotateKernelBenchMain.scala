package graft.bench

import graft.operators.{Opq, RabitQ}

/** The rotation-kernel ladder, measured interleaved in one JVM (the
  * BASELINE same-run convention): scalar [[Opq.rotate]] (round-10
  * loop-interchanged form) vs the widened single-row kernel vs the
  * 4-row blocked kernel, on the same data, alternating rounds — plus a
  * bit-identity assert over every row so the speed claim and the
  * exactness claim come from the same run. Pure driver-side loop: this
  * prices the per-core encode flops the ingest mapPartitions sites pay,
  * with no Spark scheduling in the number.
  *
  * `sbt "runMain graft.bench.RotateKernelBenchMain 768 4000 5"`
  */
object RotateKernelBenchMain {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0).toInt else 768
    val n = if (args.length > 1) args(1).toInt else 4000
    val rounds = if (args.length > 2) args(2).toInt else 5
    val r = RabitQ.randomRotation(d, 42L)
    val rd = Opq.widen(r)
    val rnd = new scala.util.Random(7)
    val vs = Array.fill(n)(Array.fill(d)((rnd.nextGaussian() * 2).toFloat))

    // bit-identity across all three forms, full corpus, before timing
    val scalar = vs.map(Opq.rotate(r, _))
    vs.indices.foreach { i =>
      assert(Opq.rotateWide(rd, vs(i)).sameElements(scalar(i)), s"wide@$i")
    }
    vs.grouped(4).zipWithIndex.foreach { case (blk, b) =>
      val out = Opq.rotateBlock4(rd, blk)
      blk.indices.foreach { i =>
        assert(out(i).sameElements(scalar(b * 4 + i)), s"block@${b * 4 + i}")
      }
    }
    println(s"ROTKERN bit-identity OK over $n rows (d=$d)")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var sink = 0f
    val walls = Array.fill(3)(List.empty[Double])
    (1 to rounds).foreach { rIx =>
      val wScalar = timed {
        var i = 0
        while (i < n) { sink += Opq.rotate(r, vs(i))(0); i += 1 }
      }
      val wWide = timed {
        var i = 0
        while (i < n) { sink += Opq.rotateWide(rd, vs(i))(0); i += 1 }
      }
      val wBlock = timed {
        vs.grouped(4).foreach { blk =>
          sink += Opq.rotateBlock4(rd, blk)(0)(0)
        }
      }
      walls(0) ::= wScalar; walls(1) ::= wWide; walls(2) ::= wBlock
      println(f"ROTKERN r$rIx scalar=$wScalar%.2fs wide=$wWide%.2fs " +
        f"block4=$wBlock%.2fs")
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.length / 2)
    val (ms, mw, mb) = (med(walls(0)), med(walls(1)), med(walls(2)))
    println(f"ROTKERN medians d=$d n=$n scalar=$ms%.2fs " +
      f"wide=$mw%.2fs (${ms / mw}%.2fx) block4=$mb%.2fs (${ms / mb}%.2fx) " +
      f"rows/s scalar=${n / ms}%.0f block4=${n / mb}%.0f sink=$sink%.1f")
  }
}
