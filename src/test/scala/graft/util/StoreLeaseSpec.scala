package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Sketches
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextAnalysis

/** The single-writer contract of every persisted incremental store,
  * ENFORCED: each write verb runs under [[StoreLease]] and refuses
  * loudly when another writer holds the store — previously the
  * contract was advisory scaladoc, and two interleaved absorbs could
  * silently lose a delta (read-merge-rewrite) or double-insert
  * (check-then-append). Also pins the lease-vs-heal interplay on the
  * IVF index: a read landing inside a HEALTHY compaction's swap
  * window must fail retryably, never rename the backup back under the
  * compactor's feet. */
class StoreLeaseSpec extends SparkSpec {

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def held[T](leasePath: Path)(body: => T): T = {
    val lease = StoreLease.acquire(spark, leasePath, "spec-foreign-writer")
    try body
    finally StoreLease.release(spark, lease)
  }

  private def refuses(body: => Unit): Unit = {
    val e = intercept[IllegalStateException](body)
    e.getMessage should include("SINGLE WRITER")
  }

  test("acquire refuses a second writer; release frees; a stale lease " +
    "is broken and re-acquired") {
    val lp = new Path("/tmp/graft_test_sinks/lease/core.lease")
    fs(lp).delete(lp, false)
    val a = StoreLease.acquire(spark, lp, "writerA")
    refuses(StoreLease.acquire(spark, lp, "writerB"))
    StoreLease.release(spark, a)
    // freed: B acquires cleanly
    val b = StoreLease.acquire(spark, lp, "writerB")
    StoreLease.heldFresh(spark, lp) shouldBe true
    // age B's lease past the TTL: a crashed writer's lease must not
    // block the store forever — the next writer breaks it loudly.
    // Staleness reads the WRITER-STAMPED epoch in the content (the
    // clock a copy-based object-store rename cannot refresh), so age
    // the stamp itself; mtime is only the unreadable-file fallback.
    val old = System.currentTimeMillis() - StoreLease.DefaultTtlMs - 1000
    val fsys = fs(lp)
    val aged = {
      val in = fsys.open(lp)
      val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      s.replaceAll("epochMs=\\d+", s"epochMs=$old")
    }
    val out = fsys.create(lp, true)
    out.write(aged.getBytes("UTF-8")); out.close()
    StoreLease.heldFresh(spark, lp) shouldBe false
    val c = StoreLease.acquire(spark, lp, "writerC")
    // B's handle is now invalid: release must refuse, not delete C's
    // lease (the broken writer learns its writes may have interleaved)
    intercept[IllegalStateException](StoreLease.release(spark, b))
      .getMessage should include("broken")
    StoreLease.release(spark, c)
    fs(lp).exists(lp) shouldBe false
  }

  test("withLease releases on failure (the retry is not blocked) and " +
    "surfaces the body's exception, not the release's") {
    val lp = new Path("/tmp/graft_test_sinks/lease/fail.lease")
    fs(lp).delete(lp, false)
    val e = intercept[RuntimeException] {
      StoreLease.withLease(spark, lp, "failingWriter") { _ =>
        throw new RuntimeException("body failed")
      }
    }
    e.getMessage shouldBe "body failed"
    fs(lp).exists(lp) shouldBe false // freed for the retry
  }

  test("every store family's write verbs refuse under a foreign lease " +
    "and succeed once it is released") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "web", 40L),
      (2L, "iota kappa lambda mu nu xi omicron pi rho sigma", "web", 48L),
      (3L, "tau upsilon phi chi psi omega alef bet gimel", "books", 44L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val sinks = "/tmp/graft_test_sinks/lease"

    // ---- substring store (d25) --------------------------------------
    val subPfx = "graft_lease_sub"
    try {
      refuses(held(StoreLease.forTable(spark, subPfx)) {
        Dedup.writeSubstringStore(docs, "doc_id", "text", subPfx,
          s"$sinks/sub", seedN = 4)
      })
      Dedup.writeSubstringStore(docs, "doc_id", "text", subPfx,
        s"$sinks/sub", seedN = 4)
      refuses(held(StoreLease.forTable(spark, subPfx)) {
        Dedup.absorbIntoSubstringStore(docs, "doc_id", "text", subPfx,
          seedN = 4)
      })
      Dedup.absorbIntoSubstringStore(docs, "doc_id", "text", subPfx,
        seedN = 4) // released: the same call now proceeds
    } finally spark.sql(s"DROP TABLE IF EXISTS ${subPfx}_seeds")

    // ---- signature store (d15) --------------------------------------
    val sigPfx = "graft_lease_sig"
    try {
      Dedup.writeSignatureStore(docs, "doc_id", "text", sigPfx,
        s"$sinks/sig")
      refuses(held(StoreLease.forTable(spark, sigPfx)) {
        Dedup.absorbIntoSignatureStore(docs, "doc_id", "text", sigPfx)
      })
      Dedup.absorbIntoSignatureStore(docs, "doc_id", "text", sigPfx)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${sigPfx}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${sigPfx}_shingles")
    }

    // ---- image signature store (d17) --------------------------------
    val imgPfx = "graft_lease_img"
    val hashes = Seq((1L, 0x1234L), (2L, 0x5678L)).toDF("doc_id", "ph")
    try {
      Dedup.writeImageSignatureStore(hashes, "doc_id", "ph", imgPfx,
        s"$sinks/img")
      refuses(held(StoreLease.forTable(spark, imgPfx)) {
        Dedup.absorbIntoImageSignatureStore(hashes, "doc_id", "ph",
          imgPfx)
      })
      Dedup.absorbIntoImageSignatureStore(hashes, "doc_id", "ph", imgPfx)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${imgPfx}_ibands")
      spark.sql(s"DROP TABLE IF EXISTS ${imgPfx}_ihashes")
    }

    // ---- quantile store (m21) ---------------------------------------
    val qTable = "graft_lease_qsk"
    try {
      Sketches.writeQuantileStore(docs, "source", "doc_id", "n_chars",
        k = 8, qTable, s"$sinks/qsk")
      refuses(held(StoreLease.forTable(spark, qTable)) {
        Sketches.absorbIntoQuantileStore(docs, "source", "doc_id",
          "n_chars", k = 8, qTable)
      })
      Sketches.absorbIntoQuantileStore(docs, "source", "doc_id",
        "n_chars", k = 8, qTable)
    } finally spark.sql(s"DROP TABLE IF EXISTS $qTable")

    // ---- KMV store (m19; path-based, overwrite-rewrite) -------------
    val kmvPath = s"$sinks/kmv"
    val items = docs.select(col("source"),
      explode(split(col("text"), " ")).as("item"))
    refuses(held(StoreLease.forDir(kmvPath)) {
      Sketches.writeKmvStore(items, "source", "item", k = 8, kmvPath)
    })
    Sketches.writeKmvStore(items, "source", "item", k = 8, kmvPath)
    // the lease is a SIBLING of the store dir: the overwrite it guards
    // deletes the dir itself, and must not take the lease with it
    spark.read.parquet(kmvPath).count() should be > 0L

    // ---- LM store (m16; full-rewrite refresh) ------------------------
    val lmTable = "graft_lease_lm"
    try {
      refuses(held(StoreLease.forTable(spark, lmTable)) {
        TextAnalysis.writeLmStore(docs, "text", lmTable, s"$sinks/lm")
      })
      TextAnalysis.writeLmStore(docs, "text", lmTable, s"$sinks/lm")
    } finally spark.sql(s"DROP TABLE IF EXISTS $lmTable")
  }

  test("IVF index (n11): write/absorb/compact refuse under a foreign " +
    "lease; interleaved absorbs serialize to the same state") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(60).localCheckpoint()
    val path = "/tmp/graft_test_sinks/lease/ivf"
    val lp = StoreLease.forDir(path)
    refuses(held(lp) {
      Ann.writeIvfIndex(emb, "vec_id", "embedding", 4, path)
    })
    Ann.writeIvfIndex(emb.filter(col("vec_id") < 30), "vec_id",
      "embedding", 4, path)
    val batch = emb.filter(col("vec_id") >= 30)
    refuses(held(lp) {
      Ann.absorbIvfIndex(spark, path, batch, "vec_id", "embedding")
    })
    refuses(held(lp) { Ann.compactIvfIndex(spark, path, "vec_id") })
    // writer A absorbed nothing (refused before any job) — the retry
    // after release lands the batch exactly once: state ≡ serialized
    Ann.absorbIvfIndex(spark, path, batch, "vec_id", "embedding")
    spark.read.parquet(s"$path/cells").count() shouldBe emb.count()
    Ann.compactIvfIndex(spark, path, "vec_id")
    spark.read.parquet(s"$path/cells").count() shouldBe emb.count()
  }

  test("TRUE concurrency: two threads absorb into the same IVF index " +
    "simultaneously — at most one proceeds per attempt, and retrying " +
    "refusals until both land yields exactly the serialized state") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(80).localCheckpoint()
    val path = "/tmp/graft_test_sinks/lease/ivfrace"
    Ann.writeIvfIndex(emb.filter(col("vec_id") < 20), "vec_id",
      "embedding", 4, path)
    val batches = Seq(
      emb.filter(col("vec_id") >= 20 && col("vec_id") < 50),
      emb.filter(col("vec_id") >= 50))
    val refusals = new java.util.concurrent.atomic.AtomicInteger
    // both threads hammer their absorb until it lands; the lease turns
    // every overlap into a loud refusal (counted), never interleaved
    // writes — so the final state must equal the serialized result
    val threads = batches.map { b =>
      new Thread(() => {
        var done = false
        while (!done) {
          try { Ann.absorbIvfIndex(spark, path, b, "vec_id", "embedding")
                done = true }
          catch {
            // both of acquire's deliberate retryable outcomes: a held
            // lease, and the transient-read self-cleanup path
            case e: IllegalStateException
              if e.getMessage.contains("SINGLE WRITER") ||
                 e.getMessage.contains("retry the write") =>
                refusals.incrementAndGet(); Thread.sleep(50)
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    threads.foreach(_.isAlive shouldBe false)
    spark.read.parquet(s"$path/cells").count() shouldBe emb.count()
    spark.read.parquet(s"$path/cells").select("vec_id").distinct()
      .count() shouldBe emb.count() // no double-insert from any retry
    info(s"refusals observed under contention: ${refusals.get()}")
  }

  test("IVF swap-window heal: a read under a LIVE foreign lease fails " +
    "retryably ('compaction in flight'); with the lease gone (crashed " +
    "writer) the read self-heals and serves") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(40).localCheckpoint()
    val path = "/tmp/graft_test_sinks/lease/ivfheal"
    Ann.writeIvfIndex(emb, "vec_id", "embedding", 4, path)
    val q = emb.filter(col("vec_id") === emb.select(min("vec_id"))
      .head.getLong(0))
    def serve(): Long = Ann.ivfTopKFromIndex(spark, path, "vec_id",
      "embedding", q, "embedding", k = 3).count()
    serve() should be > 0L
    // simulate the swap window: live gone, backup present
    val live = new Path(s"$path/cells")
    val bak = new Path(s"$path/cells__precompact")
    fs(live).rename(live, bak) shouldBe true
    held(StoreLease.forDir(path)) {
      // a HEALTHY compaction holds the lease across this window — the
      // read must not "heal" (it would corrupt the compactor's swap)
      intercept[IllegalStateException](serve())
        .getMessage should include("compaction is in flight")
      fs(live).exists(bak) shouldBe true // untouched
    }
    // lease released (or expired): the window was a CRASH — self-heal
    serve() should be > 0L
    fs(live).exists(live) shouldBe true
    fs(live).exists(bak) shouldBe false
  }
}
