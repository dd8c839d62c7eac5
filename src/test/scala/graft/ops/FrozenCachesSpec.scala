package graft.ops

import graft.SparkSpec

/** The frozen-artifact invalidation contract: clearAll() drops every
  * path-keyed model/sketch/manifest/widen cache (and deletes the manifest
  * temp dirs), and a rebuild from the same data reproduces the identical
  * results — so a long-lived session that regenerates its data can
  * clearAll() and trust what comes back. */
class FrozenCachesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("clearAll invalidates the dup-cluster manifest; the rebuild is identical") {
    val before = graft.ext.Dedup.dupClusters(spark, dir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    FrozenCaches.clearAll()
    val after = graft.ext.Dedup.dupClusters(spark, dir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    assert(before.nonEmpty && before === after)
  }

  test("memo: content fingerprint invalidates when data changes under the path") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_test").toString
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "one")
      var builds = 0
      val memo = new FrozenCaches.Memo[Unit, Int]()
      assert(memo.get(tmp, ()) { builds += 1; builds } === 1)
      assert(memo.get(tmp, ()) { builds += 1; builds } === 1) // unchanged data: cached
      // size change (mtime granularity can be coarse; size alone must trip it)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "twoo")
      assert(memo.get(tmp, ()) { builds += 1; builds } === 2) // changed data: rebuilt
      assert(builds === 2)
    } finally FrozenCaches.deleteTree(tmp)
  }

  test("memo: a stale generation is evicted (beforeClear runs) when data changes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_evict").toString
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "one")
      val dropped = new java.util.ArrayList[Int]()
      val memo = new FrozenCaches.Memo[Unit, Int](beforeClear = vs => dropped.addAll(vs))
      assert(memo.get(tmp, ())(1) === 1)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "twoo")
      assert(memo.get(tmp, ())(2) === 2)
      assert(dropped.size === 1 && dropped.get(0) === 1)
    } finally FrozenCaches.deleteTree(tmp)
  }

  test("memo: a null-returning builder is cached, not silently rebuilt per call") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_null").toString
    try {
      var builds = 0
      val memo = new FrozenCaches.Memo[Unit, String]()
      assert(memo.get(tmp, ()) { builds += 1; null } === null)
      assert(memo.get(tmp, ()) { builds += 1; null } === null)
      assert(builds === 1)
    } finally FrozenCaches.deleteTree(tmp)
  }

  test("swapping the corpus under a path retrains the dup-cluster manifest") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_corpus").toString
    try {
      val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val full = graft.ext.Dedup.dupClusters(spark, tmp).collect().map(_.toSeq).toSeq
      // swap a half-size corpus under the SAME path — no clearAll
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      spark.catalog.clearCache()
      val half = graft.ext.Dedup.dupClusters(spark, tmp).collect().map(_.toSeq).toSeq
      assert(full.nonEmpty && half.nonEmpty && full != half,
        "manifest served stale frozen artifact after the corpus changed")
    } finally {
      FrozenCaches.deleteTree(tmp)
      spark.catalog.clearCache()
    }
  }

  test("build ledger: nested labeled builds log EXCLUSIVE time (order-independent attribution)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_ledger").toString
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "x")
      val child = new FrozenCaches.Memo[Unit, Int](label = "spec_child")
      val parent = new FrozenCaches.Memo[Unit, Int](label = "spec_parent")
      FrozenCaches.drainBuildLog()
      parent.get(tmp, ()) {
        Thread.sleep(60)
        child.get(tmp, ()) { Thread.sleep(120); 1 } + 1
      }
      val events = FrozenCaches.drainBuildLog()
        .filter(e => e.artifact.startsWith("spec_"))
        .map(e => e.artifact -> e.sec).toMap
      // child logs its full 120ms; parent logs ONLY its own ~60ms — the
      // nested child time is subtracted, so the two entries are additive
      // and the parent's number is the same whether or not the child was
      // prebuilt (the round-13 ledger-migration watch item)
      assert(events("spec_child") >= 0.10, s"child ${events("spec_child")}")
      assert(events("spec_parent") >= 0.05 && events("spec_parent") < 0.11,
        s"parent logged ${events("spec_parent")} — nested time not excluded")
      // prebuilt-child control: a second parent build over fresh data with
      // the child already cached logs the same-sized parent entry
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "yy")
      child.get(tmp, ()) { Thread.sleep(120); 1 }
      FrozenCaches.drainBuildLog()
      parent.get(tmp, ()) { Thread.sleep(60); child.get(tmp, ())(99) + 1 }
      val events2 = FrozenCaches.drainBuildLog()
        .filter(_.artifact == "spec_parent").map(_.sec)
      assert(events2.nonEmpty && events2.head >= 0.05 && events2.head < 0.11,
        s"prebuilt-child parent logged ${events2.headOption}")
      // a thrown builder logs nothing and caches nothing, but the parent
      // accounting stack must still unwind cleanly
      val boom = new FrozenCaches.Memo[Unit, Int](label = "spec_boom")
      intercept[RuntimeException](boom.get(tmp, ())(throw new RuntimeException("nope")))
      assert(!FrozenCaches.drainBuildLog().exists(_.artifact == "spec_boom"))
      assert(boom.get(tmp, ())(7) === 7) // rebuild after failure works
    } finally FrozenCaches.deleteTree(tmp)
  }

  test("store: a fresh memo instance (new-JVM stand-in) loads from disk — no build, no ledger event") {
    assume(FrozenCaches.storeRoot.isDefined, "frozen store disabled in this env")
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_store").toString
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "one")
      var builds = 0
      val first = new FrozenCaches.Memo[Int, Seq[(String, Long)]](label = "spec_store_plain")
      val v1 = first.get(tmp, 7) { builds += 1; Seq(("tok", 42L), ("en", 9L)) }
      FrozenCaches.drainBuildLog()
      // a fresh Memo instance shares no in-memory state with `first` —
      // the only way it can answer without building is the disk store
      val second = new FrozenCaches.Memo[Int, Seq[(String, Long)]](label = "spec_store_plain")
      val v2 = second.get(tmp, 7) { builds += 1; Seq(("never", 0L)) }
      assert(builds === 1 && v2 === v1)
      assert(!FrozenCaches.drainBuildLog().exists(_.artifact == "spec_store_plain"),
        "a disk load must not log a build event")
      // knob key participates: k=8 is a different artifact
      assert(second.get(tmp, 8) { builds += 1; Seq(("other", 1L)) } === Seq(("other", 1L)))
      assert(builds === 2)
    } finally FrozenCaches.deleteTree(tmp)
  }

  test("store: corpus change under the path invalidates the on-disk artifact too") {
    assume(FrozenCaches.storeRoot.isDefined, "frozen store disabled in this env")
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_store_inv").toString
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "one")
      var builds = 0
      new FrozenCaches.Memo[Unit, Long](label = "spec_store_inv").get(tmp, ()) { builds += 1; 1L }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "twoo")
      val fresh = new FrozenCaches.Memo[Unit, Long](label = "spec_store_inv")
      assert(fresh.get(tmp, ()) { builds += 1; 2L } === 2L, "stale store artifact served")
      assert(builds === 2)
    } finally FrozenCaches.deleteTree(tmp)
  }

  test("store: a parquet-backed value is relocated into the store and survives a new memo") {
    assume(FrozenCaches.storeRoot.isDefined, "frozen store disabled in this env")
    val corpus = java.nio.file.Files.createTempDirectory("graft_fp_store_pq").toString
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(corpus, "a.txt"), "data")
      val storeRoot = FrozenCaches.storeRoot.get.toString
      var tempRoot: String = null
      val first = new FrozenCaches.Memo[Unit, String](
        beforeClear = _.forEach(p => FrozenCaches.deleteTree(
          java.nio.file.Paths.get(p).getParent.toString)),
        label = "spec_store_pq")
      val path1 = first.get(corpus, ()) {
        tempRoot = java.nio.file.Files.createTempDirectory("graft_spec_pq").toString
        val p = tempRoot + "/t.parquet"
        spark.range(5).write.parquet(p)
        p
      }
      // the value was remapped into the store; the temp root moved away
      assert(path1.startsWith(storeRoot), s"value not relocated: $path1")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tempRoot)),
        "temp root must MOVE into the store, not linger in tmpdir")
      assert(spark.read.parquet(path1).count() === 5)
      // fresh memo (new-JVM stand-in): same path from disk, still readable
      val second = new FrozenCaches.Memo[Unit, String](label = "spec_store_pq")
      val path2 = second.get(corpus, ())(fail("must load, not build"))
      assert(path2 === path1 && spark.read.parquet(path2).count() === 5)
      // clearAll must NOT delete store-owned state (the beforeClear hook
      // deletes temp parents — store-backed values are excluded from it)
      FrozenCaches.clearAll()
      assert(spark.read.parquet(path1).count() === 5)
    } finally FrozenCaches.deleteTree(corpus)
  }

  test("store: unlabeled memos and unwalkable corpora never persist") {
    assume(FrozenCaches.storeRoot.isDefined, "frozen store disabled in this env")
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp_store_no").toString
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "a.txt"), "x")
      var builds = 0
      new FrozenCaches.Memo[Unit, Int]().get(tmp, ()) { builds += 1; 1 }
      new FrozenCaches.Memo[Unit, Int]().get(tmp, ()) { builds += 1; 1 }
      assert(builds === 2, "unlabeled memo must stay in-JVM only")
      // sig==0 (nonexistent dir) is the remote-FS degradation: no persist
      val gone = tmp + "/does-not-exist"
      new FrozenCaches.Memo[Unit, Int](label = "spec_store_sig0").get(gone, ()) { builds += 1; 1 }
      new FrozenCaches.Memo[Unit, Int](label = "spec_store_sig0").get(gone, ()) { builds += 1; 1 }
      assert(builds === 4, "sig==0 must never hit the store")
    } finally FrozenCaches.deleteTree(tmp)
  }

  test("clearAll invalidates the frozen census/sketch/model caches; rebuilds are identical") {
    val fluencyBefore = graft.ext.Text.lmFluency(spark, dir).collect().map(_.toSeq).toSeq
    val hhBefore = graft.ext.Text.heavyHitters(spark, dir).collect().map(_.toSeq).toSeq
    val ivfBefore = graft.ext.Similarity.knnIvfKmeans(spark, dir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    FrozenCaches.clearAll()
    assert(fluencyBefore === graft.ext.Text.lmFluency(spark, dir).collect().map(_.toSeq).toSeq)
    assert(hhBefore === graft.ext.Text.heavyHitters(spark, dir).collect().map(_.toSeq).toSeq)
    assert(ivfBefore === graft.ext.Similarity.knnIvfKmeans(spark, dir).collect().map(_.toSeq).toSeq)
    spark.catalog.clearCache()
  }
}
