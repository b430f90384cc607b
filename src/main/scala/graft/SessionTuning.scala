package graft

/** Session-level tuning shared by the driver-facing mains (r14
  * optimization round). */
object SessionTuning {

  /** Scratch directory for shuffle files and spills
    * (`spark.local.dir`). Local-mode default: RAM-backed tmpfs when
    * the sandbox has one — measured on this host, shuffle-file I/O on
    * the virtio disk is a large share of every small stage's wall
    * time (run ≫ cpu in task metrics; moving local dirs to /dev/shm
    * cut multi-stage query rows 20–40%). On a real cluster the
    * analogue is instance NVMe — set `SPARK_GRAFT_LOCAL_DIR` (or the
    * cluster's own `spark.local.dir`/`SPARK_LOCAL_DIRS`, which Spark
    * prefers when set) to the fast device; RAM-backed scratch is NOT
    * the production recommendation for 100 TB shuffles, it is the
    * right spelling for a memory-rich single node whose shuffles are
    * far smaller than RAM. */
  def localDir: String = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/spark-graft-local"
    else System.getProperty("java.io.tmpdir")
  })
}
