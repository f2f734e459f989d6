package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Kafka
import org.scalatest.funsuite.AnyFunSuite

/** Kafka consumer-group coordination (JoinGroup/SyncGroup/Heartbeat/
  * Leave + OffsetCommit/Fetch, v0): client-side range assignment by the
  * generation leader, disjoint-and-complete partition splits, committed
  * offset resume, and heartbeat-driven rebalances. */
class KafkaGroupSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  private def withKafka[T](f: (Kafka.MiniKafka, String) => T): T = {
    val srv = new Kafka.MiniKafka(numPartitions = 4).start()
    try f(srv, srv.bootstrap) finally srv.stop()
  }

  private def seed(bootstrap: String, topic: String, n: Int): Unit = {
    val c = new Kafka.Client(bootstrap)
    try (0 until n).foreach(i => c.produce(topic, i % 4, Seq((b(s"k$i"), b(s"v$i")))))
    finally c.close()
  }

  test("a lone consumer is its own leader and range-assigns itself every partition") {
    withKafka { (_, bootstrap) =>
      seed(bootstrap, "t", 20)
      val c = new Kafka.GroupConsumer(bootstrap, "g1", "t")
      try {
        assert(c.join().sorted == Seq(0, 1, 2, 3))
        val got = c.poll()
        assert(got.size == 20)
        assert(got.map(x => new String(x._2.value, UTF_8)).toSet == (0 until 20).map(i => s"v$i").toSet)
      } finally c.close()
    }
  }

  test("two concurrent joiners split the partitions disjointly and completely") {
    withKafka { (_, bootstrap) =>
      seed(bootstrap, "t2", 40)
      val c1 = new Kafka.GroupConsumer(bootstrap, "g2", "t2")
      val c2 = new Kafka.GroupConsumer(bootstrap, "g2", "t2")
      try {
        // join concurrently so they land in one generation
        var a1: Seq[Int] = Nil; var a2: Seq[Int] = Nil
        val t1 = new Thread(() => a1 = c1.join())
        val t2 = new Thread(() => a2 = c2.join())
        t1.start(); t2.start(); t1.join(); t2.join()
        assert(a1.size == 2 && a2.size == 2, s"range split, got $a1 / $a2")
        assert((a1 ++ a2).sorted == Seq(0, 1, 2, 3), "disjoint and complete")
        val all = c1.poll() ++ c2.poll()
        assert(all.size == 40, "each message consumed exactly once across the group")
      } finally { c1.close(); c2.close() }
    }
  }

  test("a join during AwaitingSync opens a new round; the stale sync gets 27 and the client rejoins") {
    withKafka { (_, bootstrap) =>
      seed(bootstrap, "t27", 8)
      val raw = new Kafka.Client(bootstrap)
      try {
        // m1 completes a JoinGroup round alone: the group is AwaitingSync
        val j1 = raw.joinGroup("g27", "", "range",
          Kafka.ConsumerProtocol.subscription(Seq("t27")))
        assert(j1.memberId == j1.leaderId)
        // a second member joins BEFORE m1 syncs — the coordinator must
        // move the group back to PreparingRebalance (new round), so
        // m1's gen-1 sync comes back 27 instead of silently succeeding
        val late = new Kafka.GroupConsumer(bootstrap, "g27", "t27")
        val lateAssigned = new java.util.concurrent.atomic.AtomicReference[Seq[Int]](Nil)
        val t = new Thread(() => lateAssigned.set(late.join()))
        t.start()
        Thread.sleep(100) // let the late join open the new round
        val (err, _) = raw.syncGroup("g27", j1.generationId, j1.memberId,
          Seq(j1.memberId -> Kafka.ConsumerProtocol.assignment(Map("t27" -> Seq(0, 1, 2, 3)))))
        assert(err == 27, s"stale sync must return REBALANCE_IN_PROGRESS, got $err")
        // m1 rejoins (the real client's path); both land in one generation
        val j2 = raw.joinGroup("g27", j1.memberId, "range",
          Kafka.ConsumerProtocol.subscription(Seq("t27")))
        val (err2, mine) =
          if (j2.memberId == j2.leaderId) {
            val plan = Kafka.ConsumerProtocol.rangeAssign(j2.members.map(_._1), "t27", 4)
            raw.syncGroup("g27", j2.generationId, j2.memberId,
              plan.toSeq.map { case (m, a) => m -> Kafka.ConsumerProtocol.assignment(a) })
          } else raw.syncGroup("g27", j2.generationId, j2.memberId, Nil)
        t.join(8000)
        assert(err2 == 0, s"post-rejoin sync failed: $err2")
        val myParts = Kafka.ConsumerProtocol.parseAssignment(mine).getOrElse("t27", Nil)
        assert((myParts ++ lateAssigned.get).sorted == Seq(0, 1, 2, 3),
          "the new generation splits disjointly and completely across both members")
        late.close()
      } finally raw.close()
    }
  }

  test("committed offsets resume a new consumer where the group left off") {
    withKafka { (_, bootstrap) =>
      seed(bootstrap, "t3", 12)
      val c1 = new Kafka.GroupConsumer(bootstrap, "g3", "t3")
      c1.join()
      assert(c1.poll().size == 12)
      c1.commitSync()
      c1.close() // leaves the group
      seed(bootstrap, "t3", 8) // 8 new messages after the commit
      val c2 = new Kafka.GroupConsumer(bootstrap, "g3", "t3")
      try {
        c2.join()
        val got = c2.poll()
        assert(got.size == 8, "only post-commit messages are re-read")
      } finally c2.close()
    }
  }

  test("a new joiner triggers REBALANCE_IN_PROGRESS on heartbeat; the incumbent rejoins to a split") {
    withKafka { (_, bootstrap) =>
      seed(bootstrap, "t4", 4)
      val c1 = new Kafka.GroupConsumer(bootstrap, "g4", "t4")
      assert(c1.join().size == 4)
      assert(!c1.heartbeatAndMaybeRejoin(), "stable group heartbeats clean")
      val c2 = new Kafka.GroupConsumer(bootstrap, "g4", "t4")
      val joiner = new Thread(() => c2.join())
      joiner.start()
      Thread.sleep(100) // let the new join open the rebalance round
      assert(c1.heartbeatAndMaybeRejoin(), "heartbeat saw the rebalance and rejoined")
      joiner.join()
      assert(c1.assignment.size == 2 && c2.assignment.size == 2)
      assert((c1.assignment ++ c2.assignment).sorted == Seq(0, 1, 2, 3))
      c1.close(); c2.close()
    }
  }
}
