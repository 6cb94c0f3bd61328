package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

/** An embedded, file-backed mini-broker implementing the slice of the
  * Kafka storage contract graft's binding depends on — so the full
  * produce → consume loop can RUN in this no-network, no-kafka-jar
  * sandbox instead of stopping at codec golden fixtures. The pieces a
  * real broker would own, re-implemented from the public Kafka
  * protocol/storage semantics:
  *
  *   - topics split into numbered partitions, each an APPEND-ONLY log
  *     with dense monotonic offsets;
  *   - the default partitioner: murmur2 over the serialized key bytes,
  *     `(hash & 0x7fffffff) % numPartitions` (null keys round-robin) —
  *     so records land on the SAME partition a real producer would
  *     send them to, which is what makes per-key ordering hold;
  *   - record shape (timestamp, key bytes, value bytes, headers) —
  *     the frames are carried verbatim, so the bytes a consumer fetches
  *     are byte-identical to what [[KafkaAvroCodec]] encoded (the
  *     golden-fixture contract, KafkaBindingSpec);
  *   - tombstones (null value) and log COMPACTION: retain the newest
  *     record per key; a compacted tombstone is itself retained only
  *     while `retainTombstones` (Kafka's `delete.retention.ms` gate);
  *   - offset-based fetch (`fetch(topic, partition, fromOffset)`) —
  *     the consumer resume loop.
  *
  * Scope: a DEV/TEST transport, deliberately driver-side and
  * single-JVM — production deployments bind through
  * `spark.readStream.format("kafka")` with [[KafkaBinding]]'s options,
  * and swapping this harness for a real broker changes CONFIG, not
  * code: the same frames, subjects and wire bytes flow either way
  * (KafkaLoopSpec pins that property end-to-end). Logs persist across
  * broker instances pointed at the same dir (restart survival is part
  * of the contract under test).
  *
  * ref: src/Messaging/Producers/KafkaProducerManager.cs,
  * src/Messaging/Consumers/KafkaConsumerManager.cs (the reference's
  * broker-facing managers whose loop this makes runnable here).
  */
final class EmbeddedBroker(rootDir: String) {

  import EmbeddedBroker._

  private val topics = scala.collection.mutable.Map.empty[String, Int]
  private val roundRobin = scala.collection.mutable.Map.empty[String, Int]
  // next offset per (topic, partition): initialized lazily from ONE log
  // read, then incremented on append — produce is O(1) per record, not
  // O(log length) (re-deserializing the partition on every append made
  // produce O(n²)). Authoritative once warm: compaction may remove the
  // highest-offset record (an expired tombstone), and a disk re-read
  // would then REGRESS the end offset and re-issue a taken offset.
  private val endOffsets = scala.collection.mutable.Map.empty[(String, Int), Long]
  Files.createDirectories(Paths.get(rootDir))

  def createTopic(name: String, partitions: Int): Unit = synchronized {
    require(partitions > 0, "partitions must be positive")
    require(!topics.contains(name) || topics(name) == partitions,
      s"topic $name already exists with ${topics(name)} partitions")
    topics(name) = partitions
    (0 until partitions).foreach { p =>
      Files.createDirectories(Paths.get(partDir(name, p)))
    }
  }

  /** Partition count, recovering from disk for a broker restarted onto
    * an existing root.
    */
  def partitionsOf(topic: String): Int = synchronized {
    topics.getOrElse(topic, {
      val dirs = Option(new java.io.File(s"$rootDir/$topic").listFiles())
        .getOrElse(Array.empty).count(_.isDirectory)
      require(dirs > 0, s"unknown topic $topic")
      topics(topic) = dirs
      dirs
    })
  }

  /** Append records; returns (partition, offset) per record in input
    * order. Partitioning is the producer's job in Kafka — done here so
    * callers hand over plain frames.
    */
  def produce(topic: String, records: Seq[ProducerRecord]): Seq[(Int, Long)] = synchronized {
    val n = partitionsOf(topic)
    records.map { r =>
      val p = r.key match {
        case null =>
          val next = roundRobin.getOrElse(topic, 0)
          roundRobin(topic) = next + 1
          next % n
        case k => (murmur2(k) & 0x7fffffff) % n
      }
      val off = appendOne(topic, p, r)
      (p, off)
    }
  }

  /** All records of a partition with offset >= fromOffset, in offset
    * order — the consumer fetch loop's unit.
    */
  def fetch(topic: String, partition: Int, fromOffset: Long = 0L): Seq[ConsumerRecord] =
    synchronized {
      readLog(topic, partition).filter(_.offset >= fromOffset)
    }

  /** Next offset to be assigned (== current log end). */
  def endOffset(topic: String, partition: Int): Long = synchronized {
    endOffsets.getOrElseUpdate(
      (topic, partition),
      readLog(topic, partition).lastOption.map(_.offset + 1).getOrElse(0L))
  }

  /** Log compaction: newest record per key wins; null-key records are
    * never compacted away (Kafka keeps them — no key to collapse on);
    * tombstones survive only while `retainTombstones` (the
    * delete.retention.ms gate). Offsets of surviving records are
    * PRESERVED — compaction removes records, it does not renumber.
    */
  def compact(topic: String, retainTombstones: Boolean = false): Unit = synchronized {
    (0 until partitionsOf(topic)).foreach { p =>
      val log = readLog(topic, p)
      val newestPerKey = log.filter(_.key != null)
        .groupBy(r => ByteKey(r.key)).map { case (_, rs) => rs.maxBy(_.offset).offset }
        .toSet
      val kept = log.filter { r =>
        if (r.key == null) true
        else if (!newestPerKey.contains(r.offset)) false
        else r.value != null || retainTombstones
      }
      val f = logFile(topic, p)
      val tmp = new java.io.File(f.getPath + ".tmp")
      writeAll(tmp, kept)
      require(f.delete() || !f.exists(), s"compact: cannot remove ${f.getPath}")
      require(tmp.renameTo(f), s"compact: cannot swap ${tmp.getPath}")
    }
  }

  // ---- consumer groups ----------------------------------------------------

  private val groups = scala.collection.mutable.Map.empty[(String, String), ConsumerGroup]

  /** The group coordinator handle for (groupId, topic). Membership is
    * RUNTIME state (ephemeral, like a real group's session-bound
    * membership); committed offsets are DURABLE (__consumer_offsets
    * files under the broker root) and survive broker restarts.
    */
  def group(groupId: String, topic: String): ConsumerGroup = synchronized {
    groups.getOrElseUpdate((groupId, topic), new ConsumerGroup(this, groupId, topic))
  }

  /** Durably commit the NEXT offset to consume for (group, topic,
    * partition) — Kafka's offset-commit contract (a committed offset of
    * n means records < n are done). MONOTONIC: a commit at or below the
    * stored offset is skipped and returns false — the
    * ManualCommitManager duplicate-commit guard (ref
    * src/Messaging/Consumers/ManualCommitManager.cs:84-96, offsets
    * already committed are logged and dropped, never re-sent).
    * Atomic write (tmp + rename) so a torn commit can't corrupt the
    * resume point.
    */
  def commitOffset(groupId: String, topic: String, partition: Int, next: Long): Boolean =
    synchronized {
      val cur = committedOffset(groupId, topic, partition).getOrElse(-1L)
      if (next <= cur) false
      else {
        val f = offsetFile(groupId, topic, partition)
        Files.createDirectories(f.toPath.getParent)
        val tmp = new java.io.File(f.getPath + ".tmp")
        Files.writeString(tmp.toPath, next.toString)
        require(tmp.renameTo(f) || (f.delete() && tmp.renameTo(f)),
          s"commitOffset: cannot swap ${tmp.getPath}")
        true
      }
    }

  /** The committed NEXT offset for (group, topic, partition), if any. */
  def committedOffset(groupId: String, topic: String, partition: Int): Option[Long] =
    synchronized {
      val f = offsetFile(groupId, topic, partition)
      if (f.exists()) Some(Files.readString(f.toPath).trim.toLong) else None
    }

  private def offsetFile(groupId: String, topic: String, p: Int) =
    new java.io.File(s"$rootDir/__consumer_offsets/$groupId/$topic/$p")

  // ---- log file I/O -------------------------------------------------------

  private def partDir(topic: String, p: Int) = s"$rootDir/$topic/$p"
  private def logFile(topic: String, p: Int) = new java.io.File(s"${partDir(topic, p)}/00000.log")

  private def appendOne(topic: String, p: Int, r: ProducerRecord): Long = {
    val off = endOffset(topic, p)
    // fail FAST with the unreachable resource named (the Connectivity
    // service-down contract: produce while the broker storage is gone
    // throws an indicative error immediately, it does not hang)
    val out =
      try new DataOutputStream(new FileOutputStream(logFile(topic, p), true))
      catch {
        case e: java.io.FileNotFoundException =>
          throw new java.io.IOException(
            s"broker unavailable: cannot append to $topic/$p under $rootDir", e)
      }
    try writeRecord(out, ConsumerRecord(topic, p, off, r.timestamp, r.key, r.value, r.headers))
    finally out.close()
    endOffsets((topic, p)) = off + 1
    off
  }

  private def writeAll(f: java.io.File, rs: Seq[ConsumerRecord]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(f, false))
    try rs.foreach(writeRecord(out, _))
    finally out.close()
  }

  private def writeRecord(out: DataOutputStream, r: ConsumerRecord): Unit = {
    out.writeLong(r.offset)
    out.writeLong(r.timestamp)
    writeBytes(out, r.key)
    writeBytes(out, r.value)
    out.writeInt(r.headers.size)
    r.headers.foreach { case (k, v) =>
      writeBytes(out, k.getBytes("UTF-8"))
      writeBytes(out, v)
    }
  }

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1)
    else { out.writeInt(b.length); out.write(b) }

  private def readLog(topic: String, p: Int): Seq[ConsumerRecord] = {
    val f = logFile(topic, p)
    if (!f.exists()) return Nil
    val in = new DataInputStream(new FileInputStream(f))
    val buf = Seq.newBuilder[ConsumerRecord]
    try {
      while (true) {
        val off =
          try in.readLong()
          catch { case _: EOFException => return buf.result() }
        val ts = in.readLong()
        val key = readBytes(in)
        val value = readBytes(in)
        val nh = in.readInt()
        val headers = (0 until nh).map { _ =>
          val name = new String(readBytes(in), "UTF-8")
          name -> readBytes(in)
        }
        buf += ConsumerRecord(topic, p, off, ts, key, value, headers)
      }
      buf.result()
    } finally in.close()
  }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else {
      val b = new Array[Byte](n)
      in.readFully(b)
      b
    }
  }
}

object EmbeddedBroker {

  /** Consumer-group coordinator for one (group, topic): membership,
    * the RangeAssignor, generation fencing, and committed-offset
    * resume — the slice of the Kafka group protocol the reference's
    * consume loop depends on (ref
    * src/Messaging/Consumers/KafkaConsumerManager.cs subscription +
    * ManualCommitManager.cs commits).
    *
    *   - join/leave REBALANCE the group: the generation bumps and every
    *     member's fetch position resets to the group's COMMITTED offset
    *     for its (possibly different) new partitions — uncommitted
    *     progress is replayed, the at-least-once contract;
    *   - assignment is Kafka's range strategy over member ids in sorted
    *     order: n/m partitions each, the first n mod m members take one
    *     extra — deterministic, so a restarted member set maps back to
    *     identical ownership;
    *   - commitSync is fenced: committing a partition the member does
    *     not own at the current generation throws (Kafka's
    *     CommitFailedException after a rebalance), so a zombie consumer
    *     can never move another member's resume point.
    */
  final class ConsumerGroup private[sources] (
      broker: EmbeddedBroker, val id: String, val topic: String) {

    private val members = scala.collection.mutable.SortedSet.empty[String]
    private var gen = 0
    // (member, partition) -> next fetch position; cleared on rebalance
    private val positions = scala.collection.mutable.Map.empty[(String, Int), Long]

    def generation: Int = synchronized(gen)

    def join(member: String): Int = synchronized {
      members += member; gen += 1; positions.clear(); gen
    }

    def leave(member: String): Int = synchronized {
      members -= member; gen += 1; positions.clear(); gen
    }

    /** RangeAssignor partitions for `member` at the current generation. */
    def assignment(member: String): Seq[Int] = synchronized {
      require(members.contains(member), s"member $member is not in group $id")
      val ms = members.toSeq // SortedSet: already by member id
      val n = broker.partitionsOf(topic)
      val idx = ms.indexOf(member)
      val per = n / ms.size
      val extra = n % ms.size
      val start = idx * per + math.min(idx, extra)
      start until (start + per + (if (idx < extra) 1 else 0))
    }

    /** Fetch the next records from the member's assigned partitions.
      * First fetch after join/rebalance resumes from the group's
      * committed offsets (or the log start); subsequent polls continue
      * from the last returned position.
      */
    def poll(member: String, maxPerPartition: Int = Int.MaxValue): Seq[ConsumerRecord] =
      synchronized {
        assignment(member).flatMap { p =>
          val pos = positions.getOrElseUpdate(
            (member, p), broker.committedOffset(id, topic, p).getOrElse(0L))
          val recs = broker.fetch(topic, p, pos).take(maxPerPartition)
          recs.lastOption.foreach(r => positions((member, p)) = r.offset + 1)
          recs
        }
      }

    /** Commit `next` as the group's resume point for `partition` —
      * fenced to the member's current assignment. Returns false when
      * the monotonic guard skipped an already-committed offset.
      */
    def commitSync(member: String, partition: Int, next: Long): Boolean = synchronized {
      require(assignment(member).contains(partition),
        s"CommitFailed: partition $partition not assigned to $member " +
          s"in group $id at generation $gen (rebalanced?)")
      broker.commitOffset(id, topic, partition, next)
    }
  }

  /** Per-entity manual commit tracking — the reference's
    * ManualCommitManager re-expressed (ref
    * src/Messaging/Consumers/ManualCommitManager.cs): `track` records
    * the (topic, partition, offset) coordinate of a consumed entity by
    * REFERENCE identity; `commit(entity)` sends offset+1 to the group
    * store, skipping monotonically (an entity at or below the last
    * committed offset is dropped, :84-96) and cleaning every tracked
    * entry the commit covered (:163-186) so acknowledged entities
    * don't accumulate.
    */
  final class ManualCommitManager(group: ConsumerGroup, member: String) {
    private final case class Coord(partition: Int, offset: Long)
    private val meta = new java.util.IdentityHashMap[AnyRef, Coord]()

    def track(entity: AnyRef, partition: Int, offset: Long): Unit = synchronized {
      meta.put(entity, Coord(partition, offset))
    }

    /** Commit through the entity's coordinate; false = untracked or
      * already covered by a prior commit.
      */
    def commit(entity: AnyRef): Boolean = synchronized {
      Option(meta.remove(entity)).exists { c =>
        val sent = group.commitSync(member, c.partition, c.offset + 1)
        if (sent) { // drop every tracked entity the new watermark covers
          val it = meta.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue.partition == c.partition && e.getValue.offset <= c.offset)
              it.remove()
          }
        }
        sent
      }
    }

    def trackedCount: Int = synchronized(meta.size())
  }

  /** What a producer hands the broker (partition decided broker-side
    * here, producer-side in real Kafka — same function either way).
    */
  final case class ProducerRecord(
      key: Array[Byte],
      value: Array[Byte],
      timestamp: Long,
      headers: Seq[(String, Array[Byte])] = Nil
  )

  /** What a consumer fetch returns — the Kafka source's column set
    * (topic/partition/offset/timestamp/key/value/headers).
    */
  final case class ConsumerRecord(
      topic: String,
      partition: Int,
      offset: Long,
      timestamp: Long,
      key: Array[Byte],
      value: Array[Byte],
      headers: Seq[(String, Array[Byte])]
  )

  private final case class ByteKey(bytes: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case ByteKey(b) => java.util.Arrays.equals(bytes, b)
      case _          => false
    }
  }

  /** Kafka's murmur2 (org.apache.kafka.common.utils.Utils#murmur2 —
    * public Apache code, re-implemented): the DefaultPartitioner hash,
    * so keyed records land exactly where a real producer puts them.
    */
  private[graft] def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4 + 0) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val tail = length & ~3
    if ((length % 4) >= 3) h ^= (data(tail + 2) & 0xff) << 16
    if ((length % 4) >= 2) h ^= (data(tail + 1) & 0xff) << 8
    if ((length % 4) >= 1) { h ^= data(tail) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }
}
