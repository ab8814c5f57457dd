package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.runner.{DiskStats, ScanRunner}

class RunnerSpec extends AnyFunSuite {
  import SparkTestSession._

  test("driver contract: oracles ⊆ queries; rows-only set is exactly the documented two") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without a query: ${o -- q}")
    // every query is oracle-checked except the two inherently
    // engine-specific rows (HLL++ sketch internals, engine-seeded RNG) —
    // adding a query without an oracle must be a conscious decision here
    assert((q -- o) == Set("q_agg_approx", "q_sample_stratified"),
      s"rows-only queries drifted: ${q -- o}")
    assert(q.forall(_.startsWith("q_")), "query naming convention")
  }

  test("per-file fan-out scans all files, fail-soft on schema mismatch") {
    val r = ScanRunner.run(spark, Seq(sf), "l_extendedprice",
      threshold = 30000.0, jobs = 8)
    assert(r.files == 10)              // one per fixture table
    assert(r.failedFiles == 9)         // only lineitem has the column
    assert(r.totalRows > 0)
    assert(r.readOps > 0, "monitored FS must count read calls")
    assert(r.readBytes > 0, "listener must observe input bytes")
    assert(r.seconds > 0)
    assert(r.predicate == "l_extendedprice > 30000.0")
  }

  test("arrow sink round-trips the filter scan") {
    val buf = new java.io.ByteArrayOutputStream()
    ScanRunner.runArrow(spark, Seq(s"$sf/lineitem.parquet"), "l_quantity",
      25.0, buf)
    val expected = ScanRunner.runMerged(spark,
      Seq(s"$sf/lineitem.parquet"), "l_quantity", 25.0)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(buf.toByteArray), alloc)
    try {
      var rows = 0L
      while (reader.loadNextBatch()) {
        rows += reader.getVectorSchemaRoot.getRowCount
      }
      assert(reader.getVectorSchemaRoot.getSchema.getFields.size == 11,
        "all lineitem columns must survive the stream")
      assert(rows == expected, s"arrow stream carried $rows of $expected rows")
    } finally { reader.close(); alloc.close() }
  }

  test("merged single-job scan agrees with per-file fan-out row count") {
    val fanout = ScanRunner.run(spark, Seq(sf), "l_quantity", 25.0, jobs = 4)
    val merged = ScanRunner.runMerged(spark,
      Seq(s"$sf/lineitem.parquet"), "l_quantity", 25.0)
    assert(fanout.totalRows == merged)
  }

  test("disk stats snapshot parses /sys/block when disks exist") {
    val disks = new java.io.File("/sys/block").list()
    if (disks != null && disks.nonEmpty) {
      val snap = DiskStats.snapshot(disks.toSeq.take(1))
      snap.values.foreach { s =>
        assert(s.readIos >= 0 && s.readSectors >= 0 && s.readTicks >= 0)
      }
    }
    assert(DiskStats.read("no_such_disk_xyz").isEmpty)
  }
}
