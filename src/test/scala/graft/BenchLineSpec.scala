package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the last 2000 characters of Bench stdout and
  * parses that tail's final line as JSON — a line that outgrows the tail
  * is truncated mid-JSON and the round's bench artifact records
  * `parsed: null` (the r3/r4 failure mode). These tests pin the bound
  * with headroom: worst-case ≤ 1600 chars at 100+ registered queries.
  */
class BenchLineSpec extends AnyFunSuite {

  // worst-case registry: 120 queries, names at the repo's realistic
  // maximum length (longest real name is vec_postfilter_ladder, 21 chars),
  // three-digit-second timings
  private val worst: Seq[(String, Double)] =
    (0 until 120).map(i => (f"a_very_long_query_name_$i%03d", 123.456 + i))

  // the real setup phases Bench.main clocks, worst-case three-digit values
  private val worstSetup: Seq[(String, Double)] =
    Seq("session", "entry_warm", "ivf_build", "ram_tier", "pq_build",
      "ivfpq_build", "sq_build", "append_models", "band_table",
      "pair_table", "bucketed_build", "npy_artifact", "code_warm",
      "harness").map(_ -> 123.456)

  // worst-case warm_sec map: the MaxWarmReps cap PLUS the standing
  // WarmWatch set, every rep CONTENDED (raw rep above its cold number)
  // so the contended marker is at its own worst case too
  private val worstWarm: Seq[(String, Double)] =
    (0 until Bench.MaxWarmReps + Bench.WarmWatch.length)
      .map(i => (f"a_very_long_query_name_$i%03d", 999.456))

  test("worst-case line stays under 1900 chars at 120 queries + setup + warm + contended") {
    // bound re-pinned 1830 → 1900 when the WarmWatch entries (+2 rows)
    // and the contended marker (capped names + count) joined the line
    // (r17 verdict #2/#6), paid for by TopN 30 → 27; 1900 keeps 100
    // chars of headroom under the driver's 2000-char tail
    val line = Bench.formatLine(worst, "0.1", worstSetup, worstWarm)
    assert(line.length <= 1900, s"line ${line.length} chars")
  }

  test("warm_sec is emitted between setup_sec and sf, omitted when empty") {
    val line = Bench.formatLine(worst, "0.1", worstSetup, worstWarm)
    // warm rep 999.46 > cold 123.46 → the MIN (the cold number) is the
    // emitted comparable, never the contended raw rep
    assert(line.contains(""""warm_sec":{"a_very_long_query_name_000":123.46"""))
    assert(line.matches(""".*"setup_sec":\{[^}]*\},"warm_sec":\{[^}]*\},"contended":.*"sf":0\.1\}"""))
    assert(!Bench.formatLine(worst, "0.1", worstSetup).contains("warm_sec"))
  }

  test("contended marker: warm > cold rows are named worst-ratio-first, capped, counted") {
    // cold: a=10, b=10, c=10, d=10; warm reps: a=30 (3×), b=15 (1.5×),
    // c=9 (fine), d=40 (4×), e=50 (no cold row — skipped)
    val cold = Seq(("qa", 10.0), ("qb", 10.0), ("qc", 10.0), ("qd", 10.0))
    val reps = Seq(("qa", 30.0), ("qb", 15.0), ("qc", 9.0), ("qd", 40.0))
    val line = Bench.formatLine(cold, "0.1", Nil, reps)
    // warm_sec carries min(cold, rep) for every repped row
    assert(line.contains(""""warm_sec":{"qa":10.00,"qb":10.00,"qc":9.00,"qd":10.00}"""))
    // contended = the three warm>cold rows, worst ratio first
    assert(line.contains(""""contended":{"n":3,"rows":["qd","qa","qb"]}"""))
    // no contention → no marker
    val calm = Bench.formatLine(cold, "0.1", Nil, Seq(("qa", 9.0)))
    assert(!calm.contains("contended"))
  }

  test("contended marker has a noise floor: small deltas are weather, not contention (r18 #2)") {
    // BENCH_r18's own false positive: 9.82 vs 9.75 s (0.7%) must NOT flag
    val cold = Seq(("spans", 9.75), ("short", 0.30), ("real", 8.15))
    val reps = Seq(("spans", 9.82), ("short", 0.70), ("real", 10.12))
    val line = Bench.formatLine(cold, "0.1", Nil, reps)
    // only the genuinely contended row (10.12 vs 8.15: +24%, +1.97 s) flags;
    // the 0.7% delta and the +0.4 s short-row jitter stay off the marker
    assert(line.contains(""""contended":{"n":1,"rows":["real"]}"""))
    // both gates must hold: 10%+ but under 0.5 s absolute → no flag
    assert(!Bench.formatLine(Seq(("s", 0.30)), "0.1", Nil, Seq(("s", 0.70))).contains("contended"))
    // 0.5 s+ but under 10% relative → no flag
    assert(!Bench.formatLine(Seq(("l", 20.0)), "0.1", Nil, Seq(("l", 20.8))).contains("contended"))
    // min-of-pair is still emitted for every repped row regardless
    assert(line.contains(""""warm_sec":{"real":8.15,"short":0.30,"spans":9.75}"""))
  }

  test("contended list is capped at MaxContended with the true count preserved") {
    val cold = (0 until 6).map(i => (s"q$i", 10.0))
    val reps = (0 until 6).map(i => (s"q$i", 20.0 + i))
    val line = Bench.formatLine(cold, "0.1", Nil, reps)
    assert(line.contains(""""contended":{"n":6,"rows":["q5","q4","q3"]}"""))
    assert(
      """"rows":\[([^\]]*)\]""".r.findFirstMatchIn(line)
        .get.group(1).split(",").length == Bench.MaxContended)
  }

  test("failed warm reps (-1) stay visible raw and are never counted contended") {
    val line = Bench.formatLine(Seq(("qa", 10.0)), "0.1", Nil, Seq(("qa", -1.0)))
    assert(line.contains(""""warm_sec":{"qa":-1.00}"""))
    assert(!line.contains("contended"))
  }

  test("setup_sec is itemized with a total and omitted when empty") {
    val line = Bench.formatLine(worst, "0.1", worstSetup)
    assert(line.contains(""""setup_sec":{"session":123.46"""))
    assert(line.contains(""""harness":123.46"""))
    // total = 14 × 123.456 = 1728.384 → 1728.38
    assert(line.contains(""""total":1728.38}"""))
    // setup rides between other_sec and sf so the envelope stays stable
    assert(line.matches(""".*"other_sec":[0-9.]+,"setup_sec":\{.*\},"sf":0\.1\}"""))
    assert(!Bench.formatLine(worst, "0.1").contains("setup_sec"))
  }

  test("line carries total, top-N queries, n_queries, other_sec, sf") {
    val line = Bench.formatLine(worst, "0.1")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""""n_queries":120"""))
    assert(line.contains(""""other_sec":"""))
    assert(line.endsWith(""""sf":0.1}"""))
    val nKeys = """"a_very_long_query_name_\d+":""".r.findAllIn(line).length
    assert(nKeys == Bench.TopN, s"expected ${Bench.TopN} query keys, got $nKeys")
  }

  test("top-N keeps the slowest queries and other_sec sums the rest exactly") {
    val results = (0 until 100).map(i => (f"q$i%03d", i.toDouble))
    val line = Bench.formatLine(results, "0.01")
    // slowest 26 are q074..q099
    assert(line.contains(""""q099":99.00""") && line.contains(""""q074":74.00"""))
    assert(!line.contains(""""q073":"""))
    // rest = 0+1+...+73 = 2701
    assert(line.contains(""""other_sec":2701.00"""))
    assert(line.contains(""""value":4950.00"""))
  }

  test("failed queries (-1 sentinel) are excluded from total and other_sec") {
    val results = Seq(("ok", 2.0), ("bad", -1.0))
    val line = Bench.formatLine(results, "0.001")
    assert(line.contains(""""value":2.00"""))
    assert(line.contains(""""bad":-1.00"""), "sentinel stays visible per-query")
    assert(line.contains(""""failed":1"""))
  }

  test("sentinel stays visible even when more than TopN queries succeed") {
    // 100 successes slower than the sentinel would previously push it off
    // the top-N cut AND out of other_sec — an invisible failure
    val results = (0 until 100).map(i => (f"q$i%03d", i.toDouble + 1.0)) :+ ("bad", -1.0)
    val line = Bench.formatLine(results, "0.1")
    assert(line.contains(""""bad":-1.00"""), "sentinel must survive the top-N cut")
    assert(line.contains(""""failed":1"""))
    // other_sec still sums only the non-top successes: 1+2+...+74 = 2775
    assert(line.contains(""""other_sec":2775.00"""))
  }

  test("failed:0 when everything succeeds") {
    val line = Bench.formatLine(Seq(("ok", 1.0)), "0.001")
    assert(line.contains(""""failed":0"""))
  }

  test("line is parseable JSON (balanced braces, no trailing comma)") {
    val line = Bench.formatLine(worst, "0.1")
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(!line.contains(",}") && !line.contains(",]"))
  }
}
