package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.DatasetFetch

/** Acquisition contract (reference S2 kagglehub analog): stage + checksum
  * manifest, cache-hit idempotence, corruption detection. */
class DatasetFetchSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft_fetch_").toString

  test("staging copies files, writes a verifiable manifest, then cache-hits") {
    val cache = tmp()
    val s1 = DatasetFetch.fetch(sfDir, cache, "tpch_sf0001")
    assert(!s1.cacheHit)
    assert(s1.files.keySet.contains("lineitem.parquet"))
    assert(DatasetFetch.verify(s1.dir).isEmpty)
    // staged data is readable through the normal seam
    val n = spark.read.parquet(s"${s1.dir}/lineitem.parquet").count()
    assert(n > 0)
    val s2 = DatasetFetch.fetch(sfDir, cache, "tpch_sf0001")
    assert(s2.cacheHit && s2.files == s1.files)
  }

  test("corruption is detected by verify and repaired by re-fetch") {
    val cache = tmp()
    val s1 = DatasetFetch.fetch(sfDir, cache, "ds")
    val victim = Paths.get(s1.dir, "region.parquet")
    Files.write(victim, "corrupt".getBytes(StandardCharsets.UTF_8))
    assert(DatasetFetch.verify(s1.dir) == Seq("region.parquet"))
    val s2 = DatasetFetch.fetch(sfDir, cache, "ds")
    assert(!s2.cacheHit) // manifest mismatch forces re-stage
    assert(DatasetFetch.verify(s2.dir).isEmpty)
  }
}
