package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2 #37: multimodal binary-column plumbing. Since r19 the
  * production gate rows run over the MIXED corpus (Multimodal
  * .withMixedPayload): the deterministic doc_id % 7 == 3 slice carries
  * REAL PNG bytes and takes the JDK-codec branch (decoded width/height,
  * quadrant means, pixel-string sha), the rest keep the utf-8 stand-in
  * and take the byte-level stub — the DuckDB oracles CASE on the same
  * slice rule, so ONE hash-pass row value-checks BOTH branches end to
  * end (r18 verdict #2; PNG is lossless, so every decoded value derives
  * from Multimodal.cardPixel's integer formula).
  */
object MultimodalQueries {

  def mmFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.withMixedPayload(Tables.documents(s, d)))
      .orderBy("doc_id")

  val mmFeaturesSql: String =
    """WITH px AS (
      |  SELECT d.doc_id, x.x, y.y,
      |    (d.doc_id * 31 + x.x * 7 + y.y * 13) % 256 AS r,
      |    (d.doc_id * 17 + x.x * 11 + y.y * 3) % 256 AS g,
      |    (d.doc_id * 23 + x.x * 5 + y.y * 19) % 256 AS b
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 3) d
      |  CROSS JOIN (SELECT unnest(range(16)) AS x) x
      |  CROSS JOIN (SELECT unnest(range(16)) AS y) y),
      |pstr AS (
      |  SELECT doc_id,
      |         sha256(string_agg(r || ',' || g || ',' || b, ';' ORDER BY y, x)) AS sha
      |  FROM px GROUP BY doc_id),
      |quad AS (
      |  SELECT doc_id, CAST((y // 8) * 2 + (x // 8) AS INT) AS q,
      |         sum((r + g + b) // 3) AS s, count(*) AS k
      |  FROM px GROUP BY 1, 2),
      |feats AS (
      |  SELECT doc_id,
      |    round(max(CASE WHEN q = 0 THEN s END) / (max(CASE WHEN q = 0 THEN k END) * 255.0), 6) AS f0,
      |    round(max(CASE WHEN q = 1 THEN s END) / (max(CASE WHEN q = 1 THEN k END) * 255.0), 6) AS f1,
      |    round(max(CASE WHEN q = 2 THEN s END) / (max(CASE WHEN q = 2 THEN k END) * 255.0), 6) AS f2,
      |    round(max(CASE WHEN q = 3 THEN s END) / (max(CASE WHEN q = 3 THEN k END) * 255.0), 6) AS f3
      |  FROM quad GROUP BY doc_id),
      |irows AS (
      |  SELECT p.doc_id, 768 AS byte_len, p.sha, 16 AS width, 16 AS height,
      |         f.f0, f.f1, f.f2, f.f3
      |  FROM pstr p JOIN feats f USING (doc_id)),
      |h AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len,
      |             sha256(text) AS sha FROM documents WHERE doc_id % 7 <> 3),
      |trows AS (
      |  SELECT doc_id, byte_len, sha,
      |    (ascii(substr(sha,1,1)) * 256 + ascii(substr(sha,2,1))) % 1280 AS width,
      |    (ascii(substr(sha,3,1)) * 256 + ascii(substr(sha,4,1))) % 720 AS height,
      |    round(ascii(substr(sha,5,1)) / 255.0, 6) AS f0,
      |    round(ascii(substr(sha,6,1)) / 255.0, 6) AS f1,
      |    round(ascii(substr(sha,7,1)) / 255.0, 6) AS f2,
      |    round(ascii(substr(sha,8,1)) / 255.0, 6) AS f3
      |  FROM h)
      |SELECT * FROM irows UNION ALL SELECT * FROM trows ORDER BY doc_id""".stripMargin

  /** Byte-level frame sampling over the binary payload (every 64th offset,
    * 16-byte frames). The Spark side is byte-exact (length/substring on
    * BINARY); the oracle's VARCHAR substring is character-based, which
    * coincides on this corpus (verified 0 rows with octet_length <>
    * length at both sf0.01 and sf0.1 — DuckDB has no BLOB substring).
    * Stays on the TEXT payload (not withMixedPayload): the slicing is
    * container-agnostic by design, but an oracle cannot synthesize
    * encoder-dependent PNG container bytes to slice — the codec branches
    * are gate-checked through mm_features/mm_phash instead, whose image
    * outputs derive from pixels, not containers. */
  def mmFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.withPayload(Tables.documents(s, d)))
      .orderBy("doc_id", "frame_idx")

  val mmFrameSampleSql: String =
    """WITH b AS (
      |  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS nb
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, text,
      |         CAST(CASE WHEN nb >= 16 THEN (nb - 16) // 64 + 1 ELSE 0 END AS INT) AS nf
      |  FROM b),
      |idx AS (
      |  SELECT doc_id, text, unnest(range(nf)) AS frame_idx FROM f WHERE nf > 0)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |       frame_idx * 64 AS byte_off,
      |       hex(CAST(substring(text, CAST(frame_idx * 64 + 1 AS INT), 16) AS BLOB)) AS frame_hex
      |FROM idx ORDER BY doc_id, frame_idx""".stripMargin

  /** #158 mm_phash: 64-bit perceptual fingerprint of every payload —
    * image-slice docs hash the DECODED 8×8 gray grid (the real aHash,
    * derivable from the cardPixel formula), opaque docs keep the 1-D
    * byte-cell analogue; both branches integer-only, so the DuckDB twin
    * derives the identical signed long per branch and the whole mixed
    * path is hash-checked. The dedup use feeds these into the SAME
    * chunk-blocked hamming join as text SimHash (Dedup.hammingPairs —
    * planted-payload behaviour spec-pinned in MultimodalSpec; this
    * synthetic corpus has no byte-level near-dups, so the registered
    * artifact is the fingerprint table itself). */
  def mmPhash(s: SparkSession, d: String): DataFrame =
    Multimodal.withPerceptualHash(Multimodal.withMixedPayload(Tables.documents(s, d)))
      .orderBy("doc_id")

  val mmPhashSql: String =
    """WITH px AS (
      |  SELECT d.doc_id, x.x, y.y,
      |    ((d.doc_id * 31 + x.x * 7 + y.y * 13) % 256
      |     + (d.doc_id * 17 + x.x * 11 + y.y * 3) % 256
      |     + (d.doc_id * 23 + x.x * 5 + y.y * 19) % 256) // 3 AS gray
      |  FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 3) d
      |  CROSS JOIN (SELECT unnest(range(16)) AS x) x
      |  CROSS JOIN (SELECT unnest(range(16)) AS y) y),
      |icell AS (
      |  SELECT doc_id, gray,
      |         CAST(((y * 8) // 16) * 8 + (x * 8) // 16 AS INT) AS c
      |  FROM px),
      |iagg AS (SELECT doc_id, c, sum(gray) AS s, count(*) AS k FROM icell GROUP BY 1, 2),
      |itot AS (SELECT doc_id, sum(s) AS ts, sum(k) AS n FROM iagg GROUP BY 1),
      |irows AS (
      |  SELECT a.doc_id,
      |    bit_or(CASE WHEN a.s * t.n <= t.ts * a.k THEN 0::BIGINT
      |                WHEN a.c = 63 THEN (-9223372036854775807 - 1)
      |                ELSE (1::BIGINT << a.c) END) AS phash
      |  FROM iagg a JOIN itot t USING (doc_id) GROUP BY 1),
      |b AS (SELECT doc_id, text, len(text) AS n FROM documents
      |      WHERE len(text) > 0 AND doc_id % 7 <> 3),
      |e AS (SELECT doc_id, n, unnest(range(n)) AS i FROM b),
      |v AS (SELECT e.doc_id, e.n, e.i,
      |             ascii(substr(b.text, CAST(e.i + 1 AS INT), 1)) AS val
      |      FROM e JOIN b USING (doc_id)),
      |seg AS (SELECT doc_id, n, CAST((i * 64) // n AS INT) AS c, val FROM v),
      |agg AS (SELECT doc_id, n, c, sum(val) AS s, count(*) AS k FROM seg GROUP BY 1,2,3),
      |tot AS (SELECT doc_id, sum(s) AS ts FROM agg GROUP BY 1),
      |trows AS (
      |  SELECT a.doc_id,
      |    bit_or(CASE WHEN a.s * a.n <= t.ts * a.k THEN 0::BIGINT
      |                WHEN a.c = 63 THEN (-9223372036854775807 - 1)
      |                ELSE (1::BIGINT << a.c) END) AS phash
      |  FROM agg a JOIN tot t USING (doc_id) GROUP BY a.doc_id)
      |SELECT * FROM irows UNION ALL SELECT * FROM trows ORDER BY doc_id""".stripMargin

  /** #312 mm_decode: a REAL image-codec round-trip as a gate row (r17
    * verdict #7, fixture-free): each doc's deterministic RGB test card
    * (Multimodal.cardPixel — pure integer arithmetic) is encoded to
    * actual PNG bytes and decoded back through the JDK codec ON THE
    * EXECUTORS; the output is the DECODED width/height, per-channel
    * pixel sums and the decoded-grid 64-bit aHash. The oracle derives
    * the expected values from the same pixel formula — PNG is lossless,
    * so a hash-pass proves the encode→decode plumbing preserves every
    * pixel exactly (a codec bug, a channel swap, a row-order flip or a
    * grid-binning drift all flip the hash). */
  def mmDecode(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeRoundTrip(Tables.documents(s, d)).orderBy("doc_id")

  val mmDecodeSql: String =
    """WITH px AS (
      |  SELECT d.doc_id, x.x, y.y,
      |    (d.doc_id * 31 + x.x * 7 + y.y * 13) % 256 AS r,
      |    (d.doc_id * 17 + x.x * 11 + y.y * 3) % 256 AS g,
      |    (d.doc_id * 23 + x.x * 5 + y.y * 19) % 256 AS b
      |  FROM (SELECT doc_id FROM documents) d
      |  CROSS JOIN (SELECT unnest(range(16)) AS x) x
      |  CROSS JOIN (SELECT unnest(range(16)) AS y) y),
      |cell AS (
      |  SELECT doc_id, (r + g + b) // 3 AS gray,
      |         CAST(((y * 8) // 16) * 8 + (x * 8) // 16 AS INT) AS c
      |  FROM px),
      |agg AS (SELECT doc_id, c, sum(gray) AS s, count(*) AS k FROM cell GROUP BY 1, 2),
      |tot AS (SELECT doc_id, sum(s) AS ts, sum(k) AS n FROM agg GROUP BY 1),
      |sums AS (SELECT doc_id, CAST(sum(r) AS BIGINT) AS sum_r,
      |                CAST(sum(g) AS BIGINT) AS sum_g,
      |                CAST(sum(b) AS BIGINT) AS sum_b
      |         FROM px GROUP BY 1),
      |ph AS (
      |  SELECT a.doc_id,
      |    bit_or(CASE WHEN a.s * t.n <= t.ts * a.k THEN 0::BIGINT
      |                WHEN a.c = 63 THEN (-9223372036854775807 - 1)
      |                ELSE (1::BIGINT << a.c) END) AS phash
      |  FROM agg a JOIN tot t USING (doc_id) GROUP BY 1)
      |SELECT s.doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
      |       s.sum_r, s.sum_g, s.sum_b, ph.phash
      |FROM sums s JOIN ph USING (doc_id) ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] =
    Map("mm_features" -> (mmFeatures _),
        "mm_frame_sample" -> (mmFrameSample _),
        "mm_phash" -> (mmPhash _),
        "mm_decode" -> (mmDecode _))

  val oracles: Map[String, String] =
    Map("mm_features" -> mmFeaturesSql,
        "mm_frame_sample" -> mmFrameSampleSql,
        "mm_phash" -> mmPhashSql,
        "mm_decode" -> mmDecodeSql)
}
