package graft

/** Scratch-root policy for the verification-harness roundtrips (the io,
  * v and st query families stage inputs, export shards, and host
  * snapshot-store lifecycles under a throwaway directory that every run
  * wipes and rebuilds). These are one-shot scratch trees, not durable
  * outputs, so they follow the same placement rule
  * [[graft.streaming.Replay]] has always used for streaming checkpoints:
  * tmpfs when the host has one — the trees are hundreds of SMALL files
  * whose create/rename/delete metadata ops dominate on a disk-backed
  * java.io.tmpdir — else the JVM's tmpdir. Production exports point at
  * real durable storage; this policy only chooses where the HARNESS
  * scratch lives.
  *
  * Guard rails (round-15): tmpfs is RAM-backed and commonly size-capped
  * (64 MB default in containers), so /dev/shm is only preferred when it
  * reports comfortable free space — a capped tmpfs would otherwise fail
  * queries mid-write with ENOSPC. `GRAFT_SCRATCH_DIR` overrides the whole
  * policy for hosts where neither default is right.
  */
object Scratch {
  /** Minimum usable bytes for /dev/shm to be trusted: the sf0.1 harness
    * trees peak well under 256 MB; a tmpfs with 1 GB free clears every
    * scratch lifecycle with headroom, and anything smaller falls back to
    * the disk-backed tmpdir, which is merely slower, never wrong.
    */
  private val MinShmFreeBytes = 1L << 30

  private[graft] def choose(override_ : Option[String],
      shmUsable: java.nio.file.Path => Boolean): String =
    override_.map(_.trim).filter(_.nonEmpty).getOrElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (shmUsable(shm)) shm.toString
      else sys.props("java.io.tmpdir")
    }

  private def shmOk(p: java.nio.file.Path): Boolean =
    try {
      java.nio.file.Files.isDirectory(p) &&
        java.nio.file.Files.isWritable(p) &&
        java.nio.file.Files.getFileStore(p).getUsableSpace >= MinShmFreeBytes
    } catch { case _: java.io.IOException => false }

  lazy val dir: String = choose(sys.env.get("GRAFT_SCRATCH_DIR"), shmOk)
}
