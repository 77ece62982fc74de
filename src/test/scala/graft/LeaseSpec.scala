package graft

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._

import graft.sources.Lease
import graft.text.TextIndex

/** Pins the enforced single-writer contract of the persisted stores: a
  * second concurrent writer REFUSES loudly (round 6 documented the slot;
  * round 7 enforces it), a crashed holder's expired lease is broken and
  * recovered, and every exit path releases. */
class LeaseSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-lease-spec").toString

  test("second concurrent writer refuses while the lease is held") {
    val dir = freshDir()
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() =>
      Lease.withLease(spark, dir, "writer-a") {
        entered.countDown()
        release.await()
      })
    holder.start()
    entered.await()
    val e = intercept[Lease.HeldException] {
      Lease.withLease(spark, dir, "writer-b") { fail("must not enter") }
    }
    assert(e.getMessage.contains("writer-a"),
      s"refusal must name the holder: ${e.getMessage}")
    release.countDown()
    holder.join()
    // after release the slot is free again
    Lease.withLease(spark, dir, "writer-b") { () }
  }

  test("crashed holder recovery: an expired lease is broken, a live one is not") {
    val dir = freshDir()
    val p = new org.apache.hadoop.fs.Path(dir, "_LEASE")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // a crash leaks the file; its deadline is in the past
    val out = fs.create(p, false)
    out.write(s"dead-writer|${System.currentTimeMillis() - 1000}".getBytes("UTF-8"))
    out.close()
    var ran = false
    Lease.withLease(spark, dir, "recoverer") { ran = true }
    assert(ran, "expired lease was not broken")
    assert(!fs.exists(p), "lease not released after the recovered run")
    // a live leak (deadline ahead) still refuses
    val out2 = fs.create(p, false)
    out2.write(s"slow-writer|${System.currentTimeMillis() + 3600000}".getBytes("UTF-8"))
    out2.close()
    intercept[Lease.HeldException] {
      Lease.withLease(spark, dir, "impatient") { () }
    }
    fs.delete(p, false)
  }

  test("the lease is released on an exception exit") {
    val dir = freshDir()
    intercept[RuntimeException] {
      Lease.withLease(spark, dir, "thrower") {
        throw new RuntimeException("body failed")
      }
    }
    Lease.withLease(spark, dir, "next") { () } // slot must be free
  }

  test("handle: stillHeld sees a break-and-reacquire, and release never deletes a successor's lease") {
    val dir = freshDir()
    val p = new org.apache.hadoop.fs.Path(dir, "_LEASE")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    Lease.withLeaseHandle(spark, dir, "owner") { h =>
      assert(h.stillHeld(), "a fresh full-TTL lease must read as held")
      // simulate a breaker that judged our lease expired: delete + its
      // own exclusive create (a different acquisition nonce)
      fs.delete(p, false)
      val out = fs.create(p, false)
      out.write(("takeover|" + (System.currentTimeMillis() + 3600000L) +
        "|other-nonce").getBytes("UTF-8"))
      out.close()
      assert(!h.stillHeld(),
        "a broken-and-reacquired lease must not read as held — the old " +
          "holder would commit over the takeover (the r11 advisor's " +
          "double-rollforward window)")
    }
    // release must be acquisition-scoped: the successor's file survives
    assert(fs.exists(p),
      "release deleted a successor's lease — a third writer could enter " +
        "while the second still runs")
    fs.delete(p, false)
  }

  test("release inside the expiry margin leaves the file for the break path (read-then-delete must not race a breaker)") {
    // the r12 advisor's narrowed race: a lease that EXPIRED during body
    // could be broken+reacquired between release's nonce read and its
    // delete, deleting the successor's file. Release therefore deletes
    // only while the deadline is comfortably ahead (margin =
    // min(ExpiryMarginMs, ttl/2), so short TTLs stay usable); a
    // near-expired lease is left for the next acquirer's break path.
    val dir = freshDir()
    val p = new org.apache.hadoop.fs.Path(dir, "_LEASE")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // a QUICK release on a short TTL deletes normally (back-to-back
    // single-writer ops must not serialize on TTL expiry)
    Lease.withLeaseHandle(spark, dir, "quick", ttlMs = 1000L) { _ => () }
    assert(!fs.exists(p),
      "a quick release well before the deadline must delete the lease")
    // a release LANDING inside the margin (body ran past ttl/2) leaves
    // the file for the break path
    Lease.withLeaseHandle(spark, dir, "short", ttlMs = 1000L) { _ =>
      Thread.sleep(650)
    }
    assert(fs.exists(p),
      "a release inside the expiry margin must leave the lease file")
    Thread.sleep(500) // past the deadline: the break path takes over
    var ran = false
    Lease.withLease(spark, dir, "next") { ran = true }
    assert(ran, "the leftover expired lease must be breakable")
    assert(!fs.exists(p), "a full-TTL release must delete normally")
  }

  test("handle: stillHeld refuses commits inside the expiry margin of the TTL") {
    // a 5 s TTL is entirely inside the 30 s commit margin: the handle
    // must refuse from the start — commits this close to the deadline
    // could still be in flight when a breaker legitimately acts
    Lease.withLeaseHandle(spark, freshDir(), "short", ttlMs = 5000L) { h =>
      assert(!h.stillHeld(),
        "a lease inside the expiry margin must refuse commits")
    }
    Lease.withLeaseHandle(spark, freshDir(), "long") { h =>
      assert(h.stillHeld())
    }
  }

  test("store appends really run under the lease (end-to-end planted positive)") {
    val dir = freshDir()
    TextIndex.write(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        .limit(50), dir)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() =>
      Lease.withLease(spark, dir, "long-compaction") {
        entered.countDown()
        release.await()
      })
    holder.start()
    entered.await()
    intercept[Lease.HeldException] {
      TextIndex.append(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
          .limit(10), dir, "b1")
    }
    release.countDown()
    holder.join()
  }
}
