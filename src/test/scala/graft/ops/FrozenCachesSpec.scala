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
