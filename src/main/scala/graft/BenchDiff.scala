package graft

/** Per-query bench regression diff — turns the judge's manual
  * round-over-round comparison into a one-command artifact (the
  * `ClosingState` pattern: generated, never hand-written).
  *
  * Usage:
  *   sbt "runMain graft.BenchDiff BENCH_r04_builder.json bench_out.json [ratio]"
  *
  * Reads two bench JSON lines (`{"queries":{"q":sec,...},...}`), prints
  * every query whose current/previous ratio exceeds the threshold
  * (default 1.5), plus the common-query total ratio the verdict tracks.
  * Sub-0.2 s queries are reported but tagged `noise` — at that scale the
  * per-query jitter on a busy machine exceeds the threshold (see the
  * verify skill's bench-noise note); re-run suspects isolated with
  * SPARK_GRAFT_ONLY/SPARK_GRAFT_REPS before treating them as real.
  */
object BenchDiff {

  /** Parse the flat `"queries":{...}` object of a bench line. */
  private[graft] def queryTimes(path: String): Map[String, Double] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val obj = """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(text)
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no \"queries\" object — not a bench JSON line?"))
      .group(1)
    """"(q_[A-Za-z0-9_]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(obj)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def report(prevPath: String, curPath: String, threshold: Double): String = {
    val prev = queryTimes(prevPath)
    val cur = queryTimes(curPath)
    val common = prev.keySet & cur.keySet
    require(common.nonEmpty, "no common queries between the two bench files")
    val prevTot = common.toSeq.map(prev).sum
    val curTot = common.toSeq.map(cur).sum
    val sb = new StringBuilder
    sb.append(f"bench diff ${new java.io.File(curPath).getName} vs " +
      f"${new java.io.File(prevPath).getName}: ${common.size} common queries, " +
      f"total $curTot%.1f s vs $prevTot%.1f s (ratio ${curTot / prevTot}%.3f); " +
      f"${(cur.keySet -- prev.keySet).size} new, ${(prev.keySet -- cur.keySet).size} dropped\n")
    // every over-threshold query is REPORTED (the scaladoc contract);
    // the sub-0.2 s ones are tagged noise rather than dropped — a
    // filter here would let a real plan regression on a tiny query
    // hide behind "no query over threshold"
    val regressed = common.toSeq
      .map(q => (q, prev(q), cur(q), cur(q) / prev(q)))
      .filter { case (_, _, _, r) => r > threshold }
      .sortBy(-_._4)
    if (regressed.isEmpty)
      sb.append(s"no query over ${threshold}x\n")
    else regressed.foreach { case (q, p, c, r) =>
      val tag = if ((c max p) < 0.2) "  [noise: sub-0.2s]" else ""
      sb.append(f"  $q%-28s $p%8.3f -> $c%8.3f  (${r}%.2fx)$tag\n")
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.BenchDiff <prev.json> <current.json> [ratioThreshold]")
    val threshold = args.lift(2).map(_.toDouble).getOrElse(1.5)
    print(report(args(0), args(1), threshold))
  }
}
