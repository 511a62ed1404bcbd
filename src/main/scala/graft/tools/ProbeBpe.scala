package graft.tools

import graft.Sessions
import graft.ops.{Tables, TextStats}

/** Production-merge-count probe for the batched BPE trainer (t32):
  * one recorded run at m=64 over the sf0.1 vocabulary targeting a
  * ≥512-merge vocab, printing the driver round-trip count next to the
  * merge count — the empirical form of the "driver cost scales with
  * ROUNDS, not merges" claim the m=8 gate can only spec. Also prints
  * the sequential-agreement check on round 1: the batched trainer's
  * first round must start with the exact merge sequential BPE picks
  * first (same argmax, same tie-break).
  */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-probe-bpe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir)

    val rounds = args.headOption.map(_.toInt).getOrElse(12)
    val m = 64
    val t0 = System.nanoTime()
    val (df, jobs, roundSizes) = TextStats.bpeMergesBatchedWithJobs(docs, rounds, m)
    val merges = df.collect()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"PROBE t32 m=$m rounds=$rounds: merges=${merges.length} jobs=$jobs wall=$wall%.1f s")
    println(s"PROBE roundSizes=${roundSizes.mkString(",")}")
    // jobs must track rounds (one pair-count collect per round), never merges
    assert(jobs <= rounds, s"jobs $jobs exceeded rounds $rounds")
    // sequential-agreement: the first batched merge is sequential BPE's
    // first merge (the round-1 argmax is the same selection rule)
    val seqFirst = TextStats.bpeMerges(docs, k = 1).collect().head
    val batFirst = merges.head
    assert(seqFirst.getString(1) == batFirst.getString(1) &&
           seqFirst.getString(2) == batFirst.getString(2),
      s"round-1 argmax diverged: seq=$seqFirst bat=$batFirst")
    println(s"PROBE first merge agrees with sequential: " +
      s"(${batFirst.getString(1)},${batFirst.getString(2)})")
    if (args.contains("seq")) {
      // the comparison row: the same merge budget trained sequentially —
      // one pair-count collect per MERGE
      val t1 = System.nanoTime()
      val seq = TextStats.bpeMerges(docs, k = merges.length).collect()
      val wallSeq = (System.nanoTime() - t1) / 1e9
      println(f"PROBE sequential k=${merges.length}: jobs=${merges.length} wall=$wallSeq%.1f s")
      println(s"PROBE seq==batched merge SET: " +
        s"${seq.map(r => (r.getString(1), r.getString(2))).toSet ==
            merges.map(r => (r.getString(1), r.getString(2))).toSet}")
    }
    spark.stop()
  }
}
