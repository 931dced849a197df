package graft.util

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Exclusive-writer lease for the persisted incremental stores (the
  * dedup signature/substring/image stores, the KMV/quantile/LM sketch
  * stores, the IVF index). Every store's absorb is a
  * read-merge-rewrite (or check-then-append) cycle, so two CONCURRENT
  * writers can silently lose one side's delta; until now the contract
  * was advisory scaladoc ("single writer — serialize in the
  * orchestrator"). This makes it ENFORCED: every write verb runs under
  * [[StoreLease.withLease]], which refuses loudly when another writer
  * holds a live lease instead of corrupting state.
  *
  * Mechanics: one marker file per store — `__writer.lease` inside a
  * path-based store's directory, `<warehouse>/__graft_leases/<name>
  * .lease` for catalog-table stores (one lease per table FAMILY
  * prefix, so the paired tables a crash-consistent absorb must move
  * together — `_bands`+`_shingles` — are guarded as a unit). Acquire
  * is `FileSystem.create(overwrite = false)` — atomic on HDFS;
  * check-then-create on local FS and object stores, a microsecond
  * race window that still deterministically catches the real failure
  * mode (orchestrator bugs overlapping absorbs that run for seconds
  * to minutes). On a store backed by an object store with a
  * conditional-put primitive, mount that instead.
  *
  * Crash posture: a writer that dies leaves its lease behind; a lease
  * older than `spark.graft.store.leaseTtlMs` (default 30 min) is
  * STALE and the next writer breaks it with a loud log — so a crashed
  * absorb blocks the store for at most the TTL, never forever. Size
  * the TTL above the longest expected absorb at your scale: breaking
  * a lease whose writer is merely slow re-creates exactly the
  * concurrent-writer hazard the lease exists to prevent.
  *
  * Release verifies the lease file still carries this writer's token:
  * if another writer broke the lease mid-flight (TTL set too low),
  * release refuses loudly — the two writers' changes may have
  * interleaved and the store needs an audit, which must not be
  * silent. Release runs in `finally`, so a FAILED absorb frees the
  * store immediately (every store's crash posture is already
  * self-healing: idempotent re-absorb, `openCells` swap recovery);
  * only a writer that loses its JVM leaves the lease to the TTL. */
object StoreLease {

  /** Session conf key for the stale-lease TTL in milliseconds. */
  val TtlConf = "spark.graft.store.leaseTtlMs"
  val DefaultTtlMs: Long = 30L * 60 * 1000

  /** Grace budget for an EMPTY-but-present lease file (a competing
    * writer caught inside tryCreate's create→payload gap): probe for
    * this long before judging it a torn write and entering the break
    * path. A live writer stuck longer than this between creating the
    * file and writing ~100 bytes is indistinguishable from a crash. */
  private val EmptyGraceMs: Long = 10000L

  /** An acquired lease: the marker path plus this writer's token. */
  final case class Lease(path: Path, token: String)

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.lease")

  private def ttlMs(spark: SparkSession): Long =
    spark.conf.get(TtlConf, DefaultTtlMs.toString).toLong

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Lease path for a PATH-BASED store (IVF index, KMV store): a
    * SIBLING of the store directory (`<dir>__writer.lease`), never
    * inside it — an overwrite-mode rewrite deletes the store dir
    * wholesale, and the lease must survive the very write it guards. */
  def forDir(storeDir: String): Path = {
    val p = new Path(storeDir)
    new Path(p.getParent, p.getName + "__writer.lease")
  }

  /** Lease path for a CATALOG-TABLE store: `name` is the table name or
    * the family prefix (one lease guards every table of the family —
    * paired tables move together or not at all).
    *
    * The name is CANONICALIZED before keying the lease path: Spark
    * catalog identifiers are case-insensitive and may be
    * db-qualified, so 'MyStore', 'mystore' and 'default.mystore'
    * must all map to ONE lease file — distinct paths would let two
    * writers of the same store proceed concurrently, silently
    * bypassing the single-writer enforcement. Canonical form:
    * lowercase, qualified with the session's current database when
    * the caller passed a bare name. */
  def forTable(spark: SparkSession, name: String): Path = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val lc = name.toLowerCase(java.util.Locale.ROOT)
    val parts = lc.split('.').filter(_.nonEmpty)
    val canonical =
      if (parts.length >= 2) parts.takeRight(2).mkString(".")
      else spark.catalog.currentDatabase
        .toLowerCase(java.util.Locale.ROOT) + "." + lc
    new Path(new Path(warehouse), s"__graft_leases/$canonical.lease")
  }

  /** Age of the lease at `path` in ms, None if absent. The WRITER's
    * `epochMs=` stamp in the file content is authoritative — it is
    * rename-invariant (an object store's copy-based rename refreshes
    * mtime, which would make a tombstoned stale lease look fresh and
    * brick the break path forever). READABLE content WITHOUT a
    * parseable stamp judges infinitely stale: only a torn write
    * (crash between create and payload) or corruption produces it,
    * neither of which is a live writer worth blocking a store for —
    * and mtime can't be trusted for it on copy-rename stores (every
    * break attempt would refresh it and re-brick). FS mtime is the
    * fallback ONLY for a transiently UNREADABLE file (an IO hiccup
    * must not mass-judge live leases stale). Writer clocks must be
    * sane within the TTL (the standard lease assumption). */
  private def leaseAgeMs(fs: FileSystem, path: Path): Option[Long] = {
    val mtime =
      try Some(fs.getFileStatus(path).getModificationTime)
      catch { case _: java.io.FileNotFoundException => None }
    mtime.map { m =>
      readHolder(fs, path) match {
        case "<unreadable>" => System.currentTimeMillis() - m
        case content =>
          // bounded digit run WITH a trailing boundary (a 19+-digit
          // corrupt run must not truncate to a far-future epoch that
          // reads fresh-forever and bricks the break path) + Try +
          // future-clamp (an epoch beyond any sane clock skew is
          // corruption, not a writer): corrupt content must never
          // throw out of heldFresh (a serving-read probe) and must
          // always judge STALE, never fresh
          "epochMs=(\\d{1,18})(?!\\d)".r.findFirstMatchIn(content)
            .flatMap(g => scala.util.Try(g.group(1).toLong).toOption)
            .filter(_ <= System.currentTimeMillis() +
              7L * 24 * 3600 * 1000)
            .map(System.currentTimeMillis() - _)
            .getOrElse(Long.MaxValue)
      }
    }
  }

  /** True iff a lease file exists and is younger than the TTL — the
    * read-side probe ([[graft.similarity.Ann]]'s `healCells` uses it
    * to distinguish "compaction in flight, retry" from "crashed swap,
    * safe to heal"). */
  def heldFresh(spark: SparkSession, leasePath: Path): Boolean =
    leaseAgeMs(fsOf(spark, leasePath), leasePath)
      .exists(_ <= ttlMs(spark))

  private def readHolder(fs: FileSystem, leasePath: Path): String =
    try {
      val in = fs.open(leasePath)
      try {
        // read to EOF — a single read() may legally return a prefix,
        // and a truncated trailing "epochMs=<digits>" would parse as
        // a tiny epoch and judge a LIVE lease stale (double-writer)
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0 && bos.size() < (1 << 20)) {
          bos.write(buf, 0, n); n = in.read(buf)
        }
        new String(bos.toByteArray, UTF_8).trim
      } finally in.close()
    } catch { case _: java.io.IOException => "<unreadable>" }

  private def tryCreate(fs: FileSystem, leasePath: Path,
                        content: String, token: String): Boolean = {
    // phase 1 — the atomic claim. create(overwrite=false) signals
    // "already exists" as an IOException subtype that varies by FS;
    // only THAT means "held". A failure with no lease file present is
    // a genuine IO problem (permissions, quota, dead FS) and must
    // surface as itself, not as a phantom concurrent writer.
    val out =
      try fs.create(leasePath, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException => return false
        case e: java.io.IOException =>
          // typed exceptions above cover HDFS/local; for FSes that
          // throw generic IOException, the narrow "already exists"
          // message (NOT a broad "exist" match — "Mkdirs failed
          // (exists=false)" is a PERMISSIONS error) or a probe decides
          val msg = Option(e.getMessage).getOrElse("").toLowerCase
          if (msg.contains("already exists") || fs.exists(leasePath))
            return false
          else throw e
      }
    // phase 2 — the payload. A write/close failure here is normally
    // OURS (we hold the just-created file): leaving a partial lease
    // behind would block every writer for the TTL on a phantom
    // holder, so clean up and surface the real IO error. BUT our torn
    // (still-empty) file reads as infinitely stale, so a racing
    // breaker may have already tombstoned it and claimed the path —
    // deleting then would remove the USURPER'S live lease and mint a
    // free slot under a live writer. The guard below NARROWS that
    // hazard (the read-then-delete pair has no atomic form on these
    // primitives; a breaker landing inside it is caught by its own
    // release audit): delete only a PRESENT, READABLE file that
    // carries no foreign token, after closing our stream (an open
    // handle makes both the read and the delete FS-dependent), and
    // leave a persistently-unreadable file to the TTL — an
    // availability delay, never a live-lease deletion.
    try { out.write(content.getBytes(UTF_8)); out.close(); true }
    catch {
      case e: java.io.IOException =>
        try out.close()
        catch { case t: java.io.IOException => e.addSuppressed(t) }
        try {
          val cur = Iterator.continually(readHolder(fs, leasePath))
            .take(2).find(_ != "<unreadable>")
          val foreign = cur.exists(c =>
            c.contains("token=") && !c.contains(s"token=$token"))
          if (cur.isDefined && !foreign && fs.exists(leasePath))
            fs.delete(leasePath, false)
        } catch {
          case t: java.io.IOException => e.addSuppressed(t)
        }
        throw e
    }
  }

  /** Acquire the exclusive writer lease or refuse loudly. A stale
    * lease (older than the TTL — a crashed writer) is broken with a
    * loud log and re-acquired.
    *
    * Break protocol (no delete of live state, ever): the breaker
    * RENAMES the stale file to a private tombstone — so a racing
    * breaker's rename fails (source gone) instead of deleting the
    * winner's fresh lease — then verifies by the moved file's AGE
    * ([[leaseAgeMs]]: the content's writer-stamped epoch, which
    * renames cannot refresh even on copy-based object-store renames)
    * that what it moved really was the stale file; a fresh victim
    * (the losing side of a rename race) is renamed straight back —
    * only into an EMPTY slot, never over a newer lease — and the
    * breaker refuses, naming the tombstone if the restore could not
    * land. This NARROWS (it cannot close — these FS primitives have
    * no compare-and-swap) the double-writer window to breakers
    * interleaving stat/rename within milliseconds on the same
    * TTL-expired lease; the age check, each acquirer's read-back
    * below, and release's token audit detect what slips through. On
    * a store backed by a filesystem with conditional puts, mount
    * that instead (object-store note in the class doc). */
  def acquire(spark: SparkSession, leasePath: Path,
              verb: String): Lease = {
    val fs = fsOf(spark, leasePath)
    val token = java.util.UUID.randomUUID().toString
    val content = s"verb=$verb token=$token " +
      s"epochMs=${System.currentTimeMillis()}"
    def refuse(): Nothing = throw new IllegalStateException(
      s"$verb: another writer holds the store lease at $leasePath " +
        s"(${readHolder(fs, leasePath)}) — the store contract is " +
        "SINGLE WRITER; serialize absorbs/compactions in the " +
        "orchestrator. A crashed writer's lease expires after " +
        s"$TtlConf=${ttlMs(spark)} ms.")
    if (!tryCreate(fs, leasePath, content, token)) {
      val ttl = ttlMs(spark)
      // a JUST-created lease is briefly empty (tryCreate's
      // create→payload gap) and empty content judges infinitely
      // stale — grace-probe an empty-but-present file until either
      // the payload lands (→ the normal fresh check refuses) or the
      // bounded budget runs out (→ it is a torn write from a crashed
      // writer; the break path below heals it). r21 used one 200 ms
      // probe; under a loaded JVM a GC pause can stretch the
      // create→payload gap past that, sending a second writer into
      // the break path against a LIVE writer (the r21 driver-run
      // StoreLeaseSpec flake). The budget only burns when the file is
      // actually empty, so healthy refusals pay nothing.
      val graceDeadline = System.currentTimeMillis() + EmptyGraceMs
      while (readHolder(fs, leasePath).isEmpty &&
             leaseAgeMs(fs, leasePath).isDefined &&
             System.currentTimeMillis() < graceDeadline) {
        Thread.sleep(100)
      }
      if (leaseAgeMs(fs, leasePath).exists(_ <= ttl)) refuse()
      log.warn(
        s"$verb: BREAKING stale writer lease at $leasePath " +
          s"(${readHolder(fs, leasePath)}) — older than " +
          s"$ttl ms; its writer is presumed crashed. If it " +
          "was merely slow, raise " + TtlConf + ".")
      // opportunistic sweep: tombstones of breakers that died between
      // their rename and delete would otherwise accumulate forever
      try fs.listStatus(leasePath.getParent)
        .filter(_.getPath.getName.startsWith(s"${leasePath.getName}" +
          ".broken."))
        .filter(s => System.currentTimeMillis() -
          s.getModificationTime > ttl)
        .foreach(s => fs.delete(s.getPath, false))
      catch { case _: java.io.IOException => () }
      val tomb = new Path(leasePath.getParent,
        s"${leasePath.getName}.broken.$token")
      val renamed =
        try fs.rename(leasePath, tomb)
        catch { case _: java.io.IOException => false }
      if (renamed) {
        // age check on what we MOVED (writer-epoch clock — see
        // leaseAgeMs): did we move the STALE file, or a racer's fresh
        // lease that replaced it between our stat and rename?
        leaseAgeMs(fs, tomb) match {
          case None =>
            // tombstone vanished: a racing breaker's sweep collected
            // it (a stale lease's tombstone inherits the stale age
            // and is immediately sweep-eligible) — benign; nothing to
            // clean up, FALL THROUGH to the claim attempt below (the
            // slot may be free right now, and refuse() here would
            // hard-fail a write that the atomic create can simply win)
            ()
          case Some(age) if age <= ttl =>
            // fresh victim: put it back and step aside. Restore ONLY
            // into a currently-empty slot; the exists-then-rename
            // pair is NOT atomic (POSIX rename overwrites), so a
            // third writer claiming the slot inside that window is
            // evicted undetected here — its release audit catches it.
            val restored = !fs.exists(leasePath) &&
              (try fs.rename(tomb, leasePath)
               catch { case _: java.io.IOException => false })
            if (!restored && fs.exists(tomb))
              throw new IllegalStateException(
                s"$verb: lease break at $leasePath raced a live " +
                  s"writer whose fresh lease is now parked at $tomb " +
                  "and could not be restored (the slot was " +
                  "re-taken). That writer will fail its release " +
                  "audit; restore or remove the tombstone after " +
                  "auditing the store.")
            refuse()
          case Some(_) =>
            fs.delete(tomb, false) // confirmed stale: discard
        }
      }
      // slot may now be free (our break, a racer's break, or a clean
      // release) — claim it the atomic way; losing the create = refuse
      if (!tryCreate(fs, leasePath, content, token)) refuse()
    }
    // read-back guard: if a racing breaker moved our just-created
    // lease aside in the interim, the live file no longer carries OUR
    // token — refuse instead of running as a double writer. One retry
    // for a transient read hiccup; if the file is persistently
    // unreadable it can only be our own just-created one (a breaker
    // never moves a fresh lease, and ours is milliseconds old), so
    // remove it rather than strand a phantom holder for the TTL.
    val own = Iterator.continually(readHolder(fs, leasePath)).take(2)
      .find(_ != "<unreadable>")
    own match {
      case Some(h) if h.contains(s"token=$token") => Lease(leasePath, token)
      case Some(_) => refuse()
      case None =>
        try fs.delete(leasePath, false)
        catch { case _: java.io.IOException => () }
        throw new IllegalStateException(
          s"$verb: transient read failures verifying the fresh lease " +
            s"at $leasePath — removed it; retry the write")
    }
  }

  /** Release an acquired lease; refuses loudly if the file no longer
    * carries this writer's token (a concurrent writer broke the lease
    * mid-flight — the store may hold interleaved writes and needs an
    * audit, which must not be silent). */
  def release(spark: SparkSession, lease: Lease): Unit = {
    val fs = fsOf(spark, lease.path)
    // a transient read hiccup must not masquerade as a broken lease
    // (that exception tells the caller to AUDIT THE STORE) — probe
    // existence separately and give an unreadable-but-present file one
    // more read before concluding anything
    def holder(): Option[String] =
      if (!fs.exists(lease.path)) None else Some(readHolder(fs, lease.path))
    val h = holder() match {
      case Some("<unreadable>") => holder()
      case other => other
    }
    h match {
      case Some(s) if s.contains(s"token=${lease.token}") =>
        fs.delete(lease.path, false)
      case other => throw new IllegalStateException(
        s"store lease at ${lease.path} was broken while this writer " +
          s"held it (now: ${other.getOrElse("<missing>")}) — another " +
          "writer may have interleaved with this one; audit the " +
          s"store. Raise $TtlConf above the longest expected write.")
    }
  }

  /** Run `f` under the exclusive writer lease: refuse loudly if held,
    * release in `finally` (a failed write frees the store for the
    * retry; only a lost JVM leaves the lease to the TTL). */
  def withLease[T](spark: SparkSession, leasePath: Path, verb: String)
                  (f: Lease => T): T = {
    val lease = acquire(spark, leasePath, verb)
    var thrown: Throwable = null
    try f(lease)
    catch { case t: Throwable => thrown = t; throw t }
    finally {
      try release(spark, lease)
      catch {
        case t: Throwable =>
          if (thrown != null) thrown.addSuppressed(t) else throw t
      }
    }
  }
}
