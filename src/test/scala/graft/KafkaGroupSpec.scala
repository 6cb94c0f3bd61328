package graft

import graft.sources.EmbeddedBroker
import graft.sources.EmbeddedBroker.{ManualCommitManager, ProducerRecord}

/** Consumer-group semantics on the embedded broker: range assignment,
  * generation-fenced commits, committed-offset resume across rebalances
  * and broker restarts, and the per-entity ManualCommitManager mirror
  * (monotonic skip + tracked-entry cleanup). The at-least-once contract
  * under test: uncommitted progress REPLAYS after a rebalance; committed
  * progress never does.
  *
  * ref: src/Messaging/Consumers/ManualCommitManager.cs (commit skip
  * :84-96, cleanup :163-186), src/Messaging/Consumers/KafkaConsumerManager.cs.
  */
class KafkaGroupSpec extends SparkSpec {

  private def newBroker() = {
    val dir = java.nio.file.Files.createTempDirectory("graft_grp").toString
    (dir, new EmbeddedBroker(dir))
  }

  private def rec(i: Int) =
    ProducerRecord(s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"), 1000L + i)

  test("range assignment: contiguous split, first members take the remainder") {
    val (_, broker) = newBroker()
    broker.createTopic("t", 5)
    val g = broker.group("g1", "t")
    g.join("c-a")
    assert(g.assignment("c-a") == (0 until 5))
    g.join("c-b")
    // 5 partitions / 2 members: sorted ids, first gets 3, second gets 2
    assert(g.assignment("c-a") == Seq(0, 1, 2))
    assert(g.assignment("c-b") == Seq(3, 4))
    g.join("c-c")
    assert(g.assignment("c-a") == Seq(0, 1))
    assert(g.assignment("c-b") == Seq(2, 3))
    assert(g.assignment("c-c") == Seq(4))
    intercept[IllegalArgumentException](g.assignment("stranger"))
  }

  test("commit-replay: uncommitted records replay after rebalance; committed never do") {
    val (_, broker) = newBroker()
    broker.createTopic("t", 1)
    broker.produce("t", (0 until 5).map(rec))
    val g = broker.group("g1", "t")
    g.join("c-a")
    val first = g.poll("c-a")
    assert(first.map(_.offset) == (0L until 5L))
    // the consumer dies after processing 3 records (committed next=3)
    assert(g.commitSync("c-a", 0, 3L))
    g.leave("c-a")
    // a replacement joins (rebalance): it resumes from the COMMITTED
    // offset, replaying the two uncommitted records — at-least-once
    g.join("c-b")
    val replay = g.poll("c-b")
    assert(replay.map(_.offset) == Seq(3L, 4L))
    assert(new String(replay.head.value, "UTF-8") == "v3")
    // a second poll without new data returns nothing (position advanced)
    assert(g.poll("c-b").isEmpty)
  }

  test("monotonic commit: an offset at or below the stored one is skipped") {
    val (_, broker) = newBroker()
    broker.createTopic("t", 1)
    broker.produce("t", (0 until 3).map(rec))
    val g = broker.group("g1", "t")
    g.join("c-a")
    assert(g.commitSync("c-a", 0, 2L))
    assert(!g.commitSync("c-a", 0, 2L)) // duplicate
    assert(!g.commitSync("c-a", 0, 1L)) // regression
    assert(g.commitSync("c-a", 0, 3L)) // progress
    assert(broker.committedOffset("g1", "t", 0).contains(3L))
  }

  test("generation fence: committing a partition lost in a rebalance throws") {
    val (_, broker) = newBroker()
    broker.createTopic("t", 2)
    val g = broker.group("g1", "t")
    g.join("c-b")
    assert(g.assignment("c-b") == Seq(0, 1))
    g.join("c-a") // rebalance: sorted ids put c-a first; c-b keeps only p1
    assert(g.assignment("c-b") == Seq(1))
    val e = intercept[IllegalArgumentException](g.commitSync("c-b", 0, 1L))
    assert(e.getMessage.contains("CommitFailed"))
    // the new owner commits fine
    assert(g.commitSync("c-a", 0, 1L))
  }

  test("committed offsets are durable: a restarted broker serves the same resume point") {
    val (dir, broker) = newBroker()
    broker.createTopic("t", 1)
    broker.produce("t", (0 until 4).map(rec))
    val g = broker.group("g1", "t")
    g.join("c-a")
    assert(g.commitSync("c-a", 0, 2L))

    val again = new EmbeddedBroker(dir) // restart onto the same root
    assert(again.committedOffset("g1", "t", 0).contains(2L))
    val g2 = again.group("g1", "t")
    g2.join("c-new")
    assert(g2.poll("c-new").map(_.offset) == Seq(2L, 3L))
  }

  test("ManualCommitManager: commit covers earlier tracked entities, skips replays") {
    val (_, broker) = newBroker()
    broker.createTopic("t", 1)
    broker.produce("t", (0 until 4).map(rec))
    val g = broker.group("g1", "t")
    g.join("c-a")
    val mgr = new ManualCommitManager(g, "c-a")

    // consume → decode to entities, track each by reference
    val entities = g.poll("c-a").map { r =>
      val e = new String(r.value, "UTF-8") // the "POCO"
      val boxed: AnyRef = new String(e)    // distinct reference per record
      mgr.track(boxed, r.partition, r.offset)
      boxed
    }
    assert(mgr.trackedCount == 4)

    // committing the THIRD entity (offset 2) commits next=3 and cleans
    // every tracked entry at or below offset 2 (ManualCommitManager
    // cleanup :163-186)
    assert(mgr.commit(entities(2)))
    assert(mgr.trackedCount == 1)
    assert(broker.committedOffset("g1", "t", 0).contains(3L))

    // a replayed entity below the watermark is skipped (:84-96) — the
    // commit neither throws nor regresses the offset
    val replayed: AnyRef = new String("v0")
    mgr.track(replayed, 0, 0L)
    assert(!mgr.commit(replayed))
    assert(broker.committedOffset("g1", "t", 0).contains(3L))

    // the last entity commits forward
    assert(mgr.commit(entities(3)))
    assert(broker.committedOffset("g1", "t", 0).contains(4L))
    assert(mgr.trackedCount == 0)
  }
}
