package graft.streaming

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** Fault-injecting Hadoop FileSystem for the store's crash matrix
  * (FaultInjectionSpec): a local filesystem whose creates / renames /
  * deletes / mkdirs can be armed to throw (or to tear a stream after
  * N bytes) on paths matching a substring — simulating a writer crash
  * at EACH step of stage → promote → manifest-CAS → prune. Register as
  * the `faulty` scheme (`fs.faulty.impl`), address the store with
  * `faulty:///...` paths; everything (Spark parquet task I/O included)
  * then routes through the trap. Create interception sits on
  * RawLocalFileSystem's single stream funnel
  * (`createOutputStreamWithMode`), so every create overload — the
  * store's manifest writes and the parquet writer's task files alike —
  * hits it.
  */
class FaultyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: URI = URI.create("faulty:///")

  override protected def createOutputStreamWithMode(f: Path, append: Boolean,
      permission: FsPermission): java.io.OutputStream = {
    FaultyFs.hit("create", f)
    val out = super.createOutputStreamWithMode(f, append, permission)
    FaultyFs.tornBudget(f) match {
      case Some(n) => new FaultyFs.TornStream(out, n)
      case None => out
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    FaultyFs.hit("rename", src)
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    FaultyFs.hit("delete", p)
    super.delete(p, recursive)
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    FaultyFs.hit("mkdirs", p)
    super.mkdirs(p, permission)
  }
}

object FaultyFs {

  /** One armed fault: `op` + path-substring match (minus an optional
    * exclude — task-attempt I/O under `_temporary/` shares the staging
    * prefix with the store's own promote rename). Once armed, EVERY
    * match throws until [[disarm]] — a crashed process stays crashed; a
    * one-shot fault would let a later task of the same doomed job
    * "succeed" past the kill point. `tornAfterBytes` arms a stream tear
    * instead of an up-front throw.
    */
  private final case class Trap(op: String, pathContains: String,
      pathExcludes: String, tornAfterBytes: Option[Int])

  @volatile private var trap: Option[Trap] = None

  def arm(op: String, pathContains: String, pathExcludes: String = ""): Unit =
    trap = Some(Trap(op, pathContains, pathExcludes, None))

  /** Arm a TORN WRITE: create succeeds, but the stream persists only
    * `bytes` bytes and then throws — the partial-file crash remnant.
    */
  def armTorn(pathContains: String, bytes: Int): Unit =
    trap = Some(Trap("create", pathContains, "", Some(bytes)))

  def disarm(): Unit = trap = None

  private def matches(t: Trap, op: String, path: Path): Boolean = {
    val s = path.toString
    t.op == op && s.contains(t.pathContains) &&
      (t.pathExcludes.isEmpty || !s.contains(t.pathExcludes))
  }

  private[streaming] def hit(op: String, path: Path): Unit =
    trap.foreach { t =>
      if (t.tornAfterBytes.isEmpty && matches(t, op, path))
        throw new java.io.IOException(s"injected fault: $op $path")
    }

  private[streaming] def tornBudget(path: Path): Option[Int] =
    trap.filter(t => matches(t, "create", path)).flatMap(_.tornAfterBytes)

  /** Delegating stream that persists only the first `budget` bytes and
    * then throws — what a crash mid-write leaves on a local disk.
    */
  private final class TornStream(out: java.io.OutputStream, budget: Int)
      extends java.io.OutputStream {
    private var written = 0
    override def write(b: Int): Unit = {
      if (written >= budget) throw new java.io.IOException("injected torn write")
      out.write(b); written += 1
    }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      val allowed = math.min(len, budget - written)
      if (allowed > 0) { out.write(b, off, allowed); written += allowed }
      if (allowed < len) {
        out.flush()
        throw new java.io.IOException("injected torn write")
      }
    }
    override def flush(): Unit = out.flush()
    override def close(): Unit = out.close()
  }
}
