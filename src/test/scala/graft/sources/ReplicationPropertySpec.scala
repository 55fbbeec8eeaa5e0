package graft.sources

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Model-based property for the replication data plane
  * (quickwit-ingest/src/ingest_v2/replication.rs semantics): a random op
  * sequence — persist / truncate / close-replica-shard / failover — runs
  * against both the real leader/follower pair and a trivial in-memory model
  * of "what was acked". Invariants, checked after every sequence:
  *
  *  - `ackedPosition` equals the model's last acked position exactly;
  *  - every record either WAL retains sits at the model's position with
  *    the model's doc (both WALs share segment layout, so truncation —
  *    segment-granular on both — keeps them identical for healthy shards);
  *  - a persist that fails (replica shard closed) never acks, kills the
  *    shard, and later persists to it keep failing;
  *  - failover (promote the follower, resync a brand-new replica) preserves
  *    every acked doc and the chain keeps accepting persists.
  */
class ReplicationPropertySpec extends AnyFunSuite {

  private sealed trait Op
  private case class Persist(shard: Int, n: Int) extends Op
  private case class Truncate(shard: Int, frac: Double) extends Op
  private case class CloseReplica(shard: Int) extends Op
  private case object Failover extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> (for { s <- Gen.choose(0, 2); n <- Gen.choose(1, 20) } yield Persist(s, n)),
    2 -> (for { s <- Gen.choose(0, 2); f <- Gen.choose(0.0, 1.0) } yield Truncate(s, f)),
    1 -> Gen.choose(0, 2).map(CloseReplica(_)),
    1 -> Gen.const(Failover))

  private def wal(): IngestQueue =
    new IngestQueue(java.nio.file.Files.createTempDirectory("repl-prop").toString)

  test("property: random persist/truncate/close/failover keeps both WALs ack-consistent") {
    val prop = Prop.forAll(Gen.listOfN(40, genOp)) { ops =>
      var nodeGen = 1
      var follower = new Replication.Follower(wal(), "n0", "n1")
      var leader = new Replication.Leader(wal(), "n0", follower)
      val shardIds = Array("s0", "s1", "s2")
      shardIds.foreach(leader.openShard)
      val acked = scala.collection.mutable.Map(shardIds.map(_ -> Vector.empty[String]).toSeq: _*)
      val alive = scala.collection.mutable.Map(shardIds.map(_ -> true).toSeq: _*)
      var next = 0
      var ok = true

      def checkInvariants(): Unit = shardIds.foreach { q =>
        if (alive(q)) {
          ok &= leader.ackedPosition(q) == acked(q).size - 1
          val onLeader = leader.wal.fetch(q, -1L, Int.MaxValue)
          val onFollower = follower.wal.fetch(q, -1L, Int.MaxValue)
          ok &= onLeader == onFollower // identical segment layout + truncation
        }
        // the FOLLOWER never holds anything beyond (or different from) acked
        follower.wal.fetch(q, -1L, Int.MaxValue).foreach { case (pos, doc) =>
          ok &= pos < acked(q).size && acked(q)(pos.toInt) == doc
        }
      }

      ops.foreach {
        case Persist(s, n) =>
          val q = shardIds(s)
          val docs = (0 until n).map { _ => next += 1; s"doc$next" }
          if (alive(q)) {
            try { leader.persist(q, docs); acked(q) ++= docs }
            catch { case _: IllegalStateException => alive(q) = false } // replica closed
          } else ok &= scala.util.Try(leader.persist(q, docs)).isFailure
        case Truncate(s, f) =>
          val q = shardIds(s)
          if (alive(q)) {
            val upTo = (acked(q).size * f).toLong - 1
            if (upTo >= 0) leader.suggestTruncate(q, upTo)
          }
        case CloseReplica(s) =>
          if (alive(shardIds(s))) follower.closeShard(shardIds(s))
        case Failover =>
          val nf = new Replication.Follower(wal(), s"n$nodeGen", s"n${nodeGen + 1}")
          leader = follower.promote(nf)
          follower = nf
          nodeGen += 1
          // shards whose replica was closed (but never hit by a failed
          // persist) stay closed on the new replica: the next persist to
          // them fails and kills the shard, which the model tracks lazily
      }
      checkInvariants()
      // the surviving chain still accepts persists on every healthy shard
      shardIds.foreach { q =>
        if (alive(q)) {
          // a pre-promoted CloseReplica may only surface at this persist
          try { leader.persist(q, Seq("tail")); acked(q) :+= "tail" }
          catch { case _: IllegalStateException => alive(q) = false }
        }
      }
      checkInvariants()
      ok
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
