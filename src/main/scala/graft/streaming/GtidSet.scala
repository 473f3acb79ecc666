package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}

/** Executed-GTID set — the production-standard MySQL resume token
  * (`gtid_executed`): a map of source-server UUID → committed transaction
  * intervals. Unlike (file, position) offsets, a GTID set survives primary
  * failover and binlog renames: the new primary serves exactly the
  * transactions NOT in the set, whatever its files are called.
  *
  * Text format is MySQL's (`server_uuid:1-5:7,other_uuid:1-3`, intervals
  * inclusive); binary format is the COM_BINLOG_DUMP_GTID payload encoding
  * (n_sids, then per sid: 16-byte UUID, n_intervals, per interval start +
  * end with the END EXCLUSIVE — `rpl_gtid_set.cc Gtid_set::encode`). */
final case class GtidSet(intervals: Map[String, Vector[(Long, Long)]]) {

  /** Add one committed transaction, merging/extending intervals. */
  def add(sid: String, gno: Long): GtidSet = {
    val key = sid.toLowerCase
    val cur = intervals.getOrElse(key, Vector.empty)
    if (cur.exists { case (a, b) => gno >= a && gno <= b }) this
    else {
      val merged = ((gno, gno) +: cur).sortBy(_._1)
        .foldLeft(Vector.empty[(Long, Long)]) {
          case (acc :+ ((a, b)), (c, d)) if c <= b + 1 =>
            acc :+ ((a, math.max(b, d)))
          case (acc, iv) => acc :+ iv
        }
      GtidSet(intervals.updated(key, merged))
    }
  }

  def contains(sid: String, gno: Long): Boolean =
    intervals.getOrElse(sid.toLowerCase, Vector.empty)
      .exists { case (a, b) => gno >= a && gno <= b }

  def isEmpty: Boolean = intervals.isEmpty

  /** MySQL text form, sids sorted for determinism. */
  def format: String =
    intervals.toSeq.sortBy(_._1).map { case (sid, ivs) =>
      sid + ":" + ivs.map { case (a, b) =>
        if (a == b) a.toString else s"$a-$b" }.mkString(":")
    }.mkString(",")

  /** COM_BINLOG_DUMP_GTID binary encoding (interval end exclusive). */
  def encoded: Array[Byte] = {
    val sids = intervals.toSeq.sortBy(_._1)
    val size = 8 + sids.map(s => 16 + 8 + s._2.length * 16).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(sids.length.toLong)
    sids.foreach { case (sid, ivs) =>
      b.put(GtidSet.sidBytes(sid))
      b.putLong(ivs.length.toLong)
      ivs.foreach { case (a, e) => b.putLong(a).putLong(e + 1) }
    }
    b.array()
  }
}

object GtidSet {
  val Empty: GtidSet = GtidSet(Map.empty)

  /** Parse MySQL text form; blank → empty set. */
  def parse(s: String): GtidSet =
    if (s == null || s.trim.isEmpty) Empty
    else GtidSet(s.split(',').map(_.trim).filter(_.nonEmpty).map { part =>
      val fields = part.split(':')
      require(fields.length >= 2, s"malformed GTID set entry: $part")
      val ivs = fields.drop(1).map { iv =>
        iv.split('-') match {
          case Array(a) => (a.trim.toLong, a.trim.toLong)
          case Array(a, b) => (a.trim.toLong, b.trim.toLong)
          case _ => throw new IllegalArgumentException(s"bad interval: $iv")
        }
      }.toVector.sortBy(_._1)
      fields(0).toLowerCase -> ivs
    }.toMap)

  /** Decode the COM_BINLOG_DUMP_GTID binary form (loopback servers and
    * tests; end exclusive on the wire → inclusive here). */
  def decode(bytes: Array[Byte]): GtidSet = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nSids = b.getLong()
    GtidSet((0L until nSids).map { _ =>
      val sid = new Array[Byte](16); b.get(sid)
      val nIv = b.getLong()
      val ivs = (0L until nIv).map { _ =>
        val a = b.getLong(); val e = b.getLong(); (a, e - 1)
      }.toVector
      sidString(sid) -> ivs
    }.toMap)
  }

  /** 16-byte SID of a textual server UUID (8-4-4-4-12). */
  def sidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    require(hex.length == 32, s"bad server uuid: $uuid")
    Array.tabulate(16)(i =>
      Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16).toByte)
  }

  /** Textual UUID of a 16-byte SID. */
  def sidString(sid: Array[Byte]): String = {
    val hex = sid.map(b => f"${b & 0xFF}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }
}
