package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Randomized-property pinning for the CDC pillar: Spark's applyLog /
  * snapshotAsOf / compactLog against a straight-line Scala reference
  * fold over seeded random change logs — the seams (delete, revive,
  * checkpoint position) get swept by volume instead of hand-picked
  * fixtures. Deterministic seed, so a failure replays.
  */
class CdcPropertySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private type Row4 = (Long, Long, String, String)

  /** Reference semantics: last-write-wins per key at `asOf`, tombstones
    * drop — the spec applyLog must satisfy by construction.
    */
  private def refSnapshot(rows: Seq[Row4], asOf: Long): Map[Long, String] =
    rows.filter(_._2 <= asOf).groupBy(_._1).flatMap { case (k, vs) =>
      val last = vs.maxBy(_._2)
      if (last._3 == "D") None else Some(k -> last._4)
    }

  private def randomLog(rng: scala.util.Random): Seq[Row4] = {
    val n = 3 + rng.nextInt(20)
    val seqs = rng.shuffle((1L to n.toLong).toList)
    (0 until n).map { i =>
      val k = 1L + rng.nextInt(5)
      val seq = seqs(i)
      val op = "IUD".charAt(rng.nextInt(3)).toString
      val payload = if (op == "D") null else s"v$k-$seq"
      (k, seq, op, payload)
    }
  }

  test("random logs: applyLog / snapshotAsOf / compactLog == reference fold") {
    val rng = new scala.util.Random(2026)
    (1 to 12).foreach { trial =>
      val rows = randomLog(rng)
      val df = rows.toDF("k", "seq", "op", "payload")
      val maxSeq = rows.map(_._2).max
      def toMap(d: org.apache.spark.sql.DataFrame): Map[Long, String] =
        d.select("k", "payload").as[(Long, String)].collect().toMap
      // applyLog == reference at the head
      assert(toMap(Cdc.applyLog(df, "k", "seq", "op")) ==
        refSnapshot(rows, maxSeq), s"applyLog diverged, trial $trial: $rows")
      // snapshotAsOf == reference at two random cuts
      (1 to 2).foreach { _ =>
        val cut = 1L + rng.nextInt(maxSeq.toInt).toLong
        assert(toMap(Cdc.snapshotAsOf(df, "k", "seq", "op", cut)) ==
          refSnapshot(rows, cut), s"asOf($cut) diverged, trial $trial: $rows")
      }
      // compactLog at a random checkpoint: snapshot invariant, and
      // above-checkpoint time travel invariant
      val ckpt = rng.nextInt(maxSeq.toInt + 1).toLong
      val compacted = Cdc.compactLog(df, "k", "seq", "op", ckpt)
      assert(toMap(Cdc.applyLog(compacted, "k", "seq", "op")) ==
        refSnapshot(rows, maxSeq),
        s"compact($ckpt) changed the snapshot, trial $trial: $rows")
      val cut2 = ckpt + rng.nextInt((maxSeq - ckpt).toInt + 1)
      assert(toMap(Cdc.snapshotAsOf(compacted, "k", "seq", "op", cut2)) ==
        refSnapshot(rows, cut2),
        s"compact($ckpt) broke asOf($cut2), trial $trial: $rows")
      // tombstones == reference dead-key set
      val dead = rows.groupBy(_._1).collect {
        case (k, vs) if vs.maxBy(_._2)._3 == "D" => k
      }.toSet
      val got = Cdc.tombstones(df, "k", "seq", "op")
        .as[Long].collect().toSet
      assert(got == dead, s"tombstones diverged, trial $trial: $rows")
    }
  }
}
