package graft.tools

/** Standalone window-probe runner (calibration + live window checks):
  * prints the serial/parallel probe walls graft.Bench uses for window
  * normalization. args: [threads] [reps]
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val reps = if (args.length > 1) args(1).toInt else 3
    (1 to reps).foreach { r =>
      val (ser, par) = graft.Bench.windowProbe(threads)
      println(f"PROBE rep=$r threads=$threads serial=$ser%.3f parallel=$par%.3f " +
        f"ser_over=${ser / graft.Bench.ProbeSerModel}%.2f " +
        f"par_over=${par / graft.Bench.ProbeParModel}%.2f")
    }
  }
}
