package graft

/** Ad-hoc: run the live-store epoch-delivery bench N times in ONE
  * process/window (not part of CI) — the r13 verdict's #1: the pinned
  * series degraded 3× in the driver's reboot-window run while the
  * builder-window row of the same round was healthy; two back-to-back
  * samples in one window adjudicate window-noise vs. protocol
  * regression. Usage: Test/runMain graft.LiveEpochProbe [sfDir] [reps]
  */
object LiveEpochProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    (1 to reps).foreach { rep =>
      val (n, rps, cSecs, a, marginal, state) =
        Bench.liveStoreThroughput(spark, dir)
      println(f"live-rep$rep records=$n rps=$rps%.1f compact=$cSecs%.2f " +
        f"overhead=$a%.2f marginal=$marginal%.1f state=$state")
    }
    spark.stop()
  }
}
