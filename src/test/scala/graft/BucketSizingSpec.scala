package graft

import graft.sources.Bucketing
import org.scalatest.funsuite.AnyFunSuite

/** Spec-pins [[Bucketing.pickBucketsFor]] — the shared bucket-count
  * sizing rule (r17 verdict #5: the fixed 256 clamp made the 10,000×
  * write-side sort volume and read parallelism a standing watch item;
  * the ceiling is now cluster-proportional while every local/test
  * configuration keeps its historical value exactly).
  */
class BucketSizingSpec extends AnyFunSuite {

  test("rows rule: ceil power of two of rows/1M, exact powers stay put, floor 8") {
    assert(Bucketing.pickBucketsFor(32, 1L) == 8)
    assert(Bucketing.pickBucketsFor(32, 900000L) == 8)
    assert(Bucketing.pickBucketsFor(32, 9000000L) == 16, "9M rows → ceil pow2 of 9 = 16")
    assert(Bucketing.pickBucketsFor(32, 64000000L) == 64, "exact power stays put")
    assert(Bucketing.pickBucketsFor(32, 65000000L) == 128)
  }

  test("local[32] and the test JVMs keep the historical 256 ceiling unchanged") {
    // 600M rows (the 1000× lineitem) → unclamped 1024, ceiling 256 at
    // 32 threads AND at tiny test parallelism (the floor of the ceiling
    // is the historical clamp — no behavior change below 32 cores)
    assert(Bucketing.pickBucketsFor(32, 600000000L) == 256)
    assert(Bucketing.pickBucketsFor(4, 600000000L) == 256)
  }

  test("the ceiling grows with the cluster: 10,000× lineitem on 8000 cores gets 8192") {
    // 6B rows → rows rule 8192; ceiling = pow2(8 × 8000) = 32768 → the
    // rows rule wins: ~0.73M rows per bucket file (streams in a task
    // sort buffer), one file per core instead of 256 files for 8000
    // cores (BASELINE §3k arithmetic)
    assert(Bucketing.pickBucketsFor(8000, 6000000000L) == 8192)
    // a corpus far past the rows rule is still bounded by the machine
    assert(Bucketing.pickBucketsFor(8000, 600000000000L) == 32768)
    // degenerate parallelism never drops the ceiling below the floor
    assert(Bucketing.pickBucketsFor(1, 600000000000L) == 256)
  }

  test("no Int overflow at absurd volumes: the ceil-pow2 runs in Long (r18 advice)") {
    // 3e15 exploded rows: the old Int narrowing of rows/1M wrapped
    // negative here; the Long path must stay positive and machine-clamped
    assert(Bucketing.pickBucketsFor(32, 3_000_000_000_000_000L) == 256)
    assert(Bucketing.pickBucketsFor(8000, 3_000_000_000_000_000L) == 32768)
    // Long.MaxValue rows and a million-core "cluster" still clamp sanely
    assert(Bucketing.pickBucketsFor(32, Long.MaxValue) == 256)
    val huge = Bucketing.pickBucketsFor(Int.MaxValue, Long.MaxValue)
    assert(huge > 0 && Integer.bitCount(huge) == 1 && huge <= (1 << 30))
  }
}
