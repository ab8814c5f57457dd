package graft.runner

import java.nio.file.{Files, Paths}

/** Kernel block-device read counters from `/sys/block/<disk>/stat`
  * (Linux). Re-expresses the reference's disk accounting
  * (/root/reference/iostats.h:44-77: read_ios, read_sectors, read_ticks
  * snapshot + delta reporting, /root/reference/main.cc:338-363) as plain
  * JVM file reads — no Spark involvement; this is driver-side observability.
  */
final case class DiskStats(readIos: Long, readSectors: Long, readTicks: Long) {
  def -(o: DiskStats): DiskStats =
    DiskStats(readIos - o.readIos, readSectors - o.readSectors,
      readTicks - o.readTicks)
  def +(o: DiskStats): DiskStats =
    DiskStats(readIos + o.readIos, readSectors + o.readSectors,
      readTicks + o.readTicks)
}

object DiskStats {
  /** Parse `/sys/block/<disk>/stat`: fields 1,3,4 (1-based) are
    * read I/Os, read sectors, read ticks. Returns None if unreadable. */
  def read(disk: String): Option[DiskStats] = {
    val p = Paths.get(s"/sys/block/$disk/stat")
    if (!Files.isReadable(p)) None
    else {
      val f = new String(Files.readAllBytes(p)).trim.split("\\s+")
      if (f.length < 4) None
      else Some(DiskStats(f(0).toLong, f(2).toLong, f(3).toLong))
    }
  }

  /** Snapshot a comma-separated disk list (the `Env_mon_disks` format,
    * /root/reference/main.cc:386-404). */
  def snapshot(disks: Seq[String]): Map[String, DiskStats] =
    disks.flatMap(d => read(d).map(d -> _)).toMap
}
