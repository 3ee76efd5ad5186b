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
  */
object Scratch {
  lazy val dir: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) shm.toString
    else sys.props("java.io.tmpdir")
  }
}
