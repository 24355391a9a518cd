package graft

import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of [[graft.sources.Staging.ensureDir]] (round-7
  * verdict #7): the old check-marker-then-write-in-place ensures could
  * interleave between two JVMs sharing target/ (a Bench and a Verify run),
  * one overwriting files the other was mid-read. The staged-temp +
  * atomic-rename protocol must leave exactly one complete published copy,
  * clean up the losing writer's temp, and make later ensures no-ops.
  */
class StagingSpec extends AnyFunSuite {
  import java.nio.file._
  import java.util.concurrent.{CountDownLatch, TimeUnit}

  test("two concurrent ensures publish exactly one complete fixture") {
    val base = Files.createTempDirectory(
      Files.createDirectories(Paths.get("target")), "staging-spec-")
    val dir = base.resolve("fixture").toString
    val writes = new java.util.concurrent.atomic.AtomicInteger
    // both writers held inside write() at once, so the publish genuinely
    // races (if scheduling serializes them anyway, the await times out and
    // the test still checks idempotence)
    val gate = new CountDownLatch(2)
    def ensure(): String = graft.sources.Staging.ensureDir(dir) { tmp =>
      writes.incrementAndGet()
      gate.countDown()
      gate.await(10, TimeUnit.SECONDS)
      val p = Paths.get(tmp)
      Files.writeString(p.resolve("data"), "payload")
      Files.writeString(p.resolve("_SUCCESS"), "")
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    Seq(Future(ensure()), Future(ensure()))
      .foreach(f => Await.result(f, 60.seconds))
    // one complete copy is in place
    assert(Files.exists(Paths.get(dir, "_SUCCESS")))
    assert(Files.readString(Paths.get(dir, "data")) === "payload")
    // the losing writer's temp sibling was discarded
    val entries = Files.list(base)
    val names = try {
      import scala.jdk.CollectionConverters._
      entries.iterator().asScala.map(_.getFileName.toString).toList.sorted
    } finally entries.close()
    assert(names === List("fixture"), s"leftover temp dirs: $names")
    // a later ensure sees the marker and never re-invokes the writer
    val before = writes.get
    ensure()
    assert(writes.get === before)
  }

  test("a fresh build sweeps superseded fingerprint keys, spares the rest") {
    // round-12 ADVICE: fixture regeneration re-keys every staged path;
    // the old keys' copies leaked forever. A successful ensure under a
    // new key must delete siblings with the same basename but another
    // fingerprint — and ONLY those.
    val base = Files.createTempDirectory(
      Files.createDirectories(Paths.get("target")), "staging-sweep-")
    def mk(rel: String): Unit = {
      val p = base.resolve(rel)
      Files.createDirectories(p)
      Files.writeString(p.resolve("_SUCCESS"), "")
    }
    mk("sf0.01-aaaa1111/points")   // superseded key, same basename
    mk("sf0.01-bbbb2222/points")   // another superseded key
    mk("sf0.1-cccc3333/points")    // DIFFERENT basename — must survive
    mk("plaindir/points")          // unkeyed — must survive
    val fresh = base.resolve("sf0.01-dddd4444/points").toString
    graft.sources.Staging.ensureDir(fresh) { tmp =>
      Files.writeString(Paths.get(tmp).resolve("_SUCCESS"), "")
    }
    def alive(rel: String) = Files.exists(base.resolve(rel))
    assert(!alive("sf0.01-aaaa1111"), "superseded key not swept")
    assert(!alive("sf0.01-bbbb2222"), "superseded key not swept")
    assert(alive("sf0.1-cccc3333/points/_SUCCESS"), "other basename swept")
    assert(alive("plaindir/points/_SUCCESS"), "unkeyed dir swept")
    assert(alive("sf0.01-dddd4444/points/_SUCCESS"))
    // steady-state re-ensure (marker hit) must not list/delete anything:
    // plant a new stale sibling and confirm it survives a no-op ensure
    mk("sf0.01-eeee5555/points")
    graft.sources.Staging.ensureDir(fresh) { _ =>
      fail("writer must not run on a marker hit")
    }
    assert(alive("sf0.01-eeee5555/points/_SUCCESS"),
      "marker-hit ensure must not sweep")
    graft.sources.Staging.deleteRecursively(base)
  }

  test("clearUnmarked restores a marked dir instead of deleting it") {
    // round-8 ADVICE TOCTOU: a concurrent JVM can publish a complete copy
    // between the caller's marker check and the clearing step. Calling
    // clearUnmarked on a dir whose marker IS present simulates exactly the
    // caller-saw-stale/now-marked race window: the dir must survive intact
    // (restored via the move-aside round trip), never be deleted.
    val base = Files.createTempDirectory(Paths.get("target"), "staging-spec-")
    val dir = base.resolve("fixture")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("data"), "published payload")
    Files.writeString(dir.resolve("_SUCCESS"), "")
    assert(graft.sources.Staging.clearUnmarked(dir, "_SUCCESS"),
      "must report a complete copy in place")
    assert(Files.readString(dir.resolve("data")) === "published payload")
    assert(Files.exists(dir.resolve("_SUCCESS")))
    // no .stale- sibling left behind
    val entries = Files.list(base)
    val names = try {
      import scala.jdk.CollectionConverters._
      entries.iterator().asScala.map(_.getFileName.toString).toList.sorted
    } finally entries.close()
    assert(names === List("fixture"), s"leftover siblings: $names")
    // and a genuinely unmarked dir is still cleared
    Files.delete(dir.resolve("_SUCCESS"))
    assert(!graft.sources.Staging.clearUnmarked(dir, "_SUCCESS"))
    assert(!Files.exists(dir))
  }

  test("scan_evolved's staged layout genuinely evolves its file schema") {
    // the evolution must live in the FILES (different parquet footers per
    // generation), not in the query: gen-1 read alone has no
    // quality_tier column, gen-2 alone does, and the merged read is the
    // union with backfilled nulls only on gen-1 rows
    val spark = SparkSpec.session
    val sf = "/root/testdata/sf0.001"
    val dir = graft.sources.TextIO.ensureDocsEvolved(spark, sf)
    val g1 = spark.read.parquet(s"$dir/gen1")
    val g2 = spark.read.parquet(s"$dir/gen2")
    assert(!g1.columns.contains("quality_tier"), "gen1 already evolved")
    assert(g2.columns.contains("quality_tier"), "gen2 missing the column")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/gen1", s"$dir/gen2")
    assert(merged.columns.toSet ===
      Set("doc_id", "lang", "n_chars", "quality_tier"))
    import org.apache.spark.sql.functions._
    val nullTier = merged.where(col("quality_tier").isNull)
    assert(nullTier.count() === g1.count(), "null backfill drifted")
    assert(nullTier.where(pmod(col("doc_id"), lit(2)) =!= 0).count() === 0L,
      "a gen-2 row surfaced a null tier")
  }

  test("a pre-protocol partial dir (no marker) is rebuilt") {
    val base = Files.createTempDirectory(Paths.get("target"), "staging-spec-")
    val dir = base.resolve("fixture")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("data"), "torn half-written copy")
    graft.sources.Staging.ensureDir(dir.toString) { tmp =>
      Files.writeString(Paths.get(tmp).resolve("data"), "payload")
      Files.writeString(Paths.get(tmp).resolve("_SUCCESS"), "")
    }
    assert(Files.readString(dir.resolve("data")) === "payload")
    assert(Files.exists(dir.resolve("_SUCCESS")))
  }
}
