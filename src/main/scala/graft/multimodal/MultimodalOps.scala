package graft.multimodal

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LayoutRoot

/** Graded entry for the multimodal family (VERDICT r10 "What's missing"
  * #1: the one north-star component whose correctness rested solely on
  * in-JVM specs). The fixture is REAL media bytes — deterministic PNG /
  * WAV / MP4 payloads synthesized by the same encoders MultimodalSpec
  * pins byte-exact — persisted as a parquet BLOB column, and the oracle
  * is a pure-SQL replay of every graded feature over those bytes:
  *
  *  - `n_bytes`     — octet_length
  *  - `checksum`    — the FNV-1a 64-bit fold, replayed with a
  *                    list_reduce over the payload's bytes (hugeint
  *                    arithmetic mod 2^64, then re-signed)
  *  - `format`      — the magic-byte sniff re-expressed over hex pairs
  *  - `width/height`— PNG: the IHDR big-endian u32s at fixed offsets
  *                    (PNG spec: 8-byte signature + 4 len + 'IHDR');
  *                    MP4: the tkhd 16.16 fixed-point dims located by
  *                    searching the container bytes for the box fourcc
  *  - `sample_rate/duration_ms` — WAV: the RIFF fmt/data little-endian
  *                    fields (rate at byte 24, data length at 40,
  *                    16-bit mono → frames = len/2); MP4: mvhd v0
  *                    timescale/duration
  *
  * So the javax.imageio / javax.sound / ISO-BMFF decode paths are graded
  * against an independent engine's read of the same file formats, not
  * against themselves. Scale shape: the extract is one narrow
  * mapPartitions pass over the binary column (no shuffle; decoder setup
  * amortizes per partition), exactly the contract a 100 TB media
  * pipeline needs.
  */
object MultimodalOps {

  private val mediaRoot = new LayoutRoot("spark.graft.media.root", "graft-media-")

  /** Fixture dir per input dir, written once per process (bench timed
    * runs measure the extract, not the fixture synthesis). */
  private val fixtureFor = new ConcurrentHashMap[String, String]()

  /** Fixture dir each graded query LAST ran against, keyed by query name
    * — a single shared var would cross-wire the two oracles when the
    * queries run against different dirs in one JVM. */
  private val lastAuxFor = new ConcurrentHashMap[String, String]()

  /** Synthesize-and-persist the media table for `dir`: one third each
    * real PNG / WAV / MP4 payloads keyed by doc_id. Both engines then
    * read the SAME parquet bytes — the grade is over the persisted file,
    * not over two independent syntheses. */
  def mediaFixture(spark: SparkSession, dir: String): String =
    fixtureFor.computeIfAbsent(dir, d => {
      val aux = mediaRoot.auxDir(spark, d)
      Multimodal.syntheticMedia(spark, d)
        .write.mode("overwrite").parquet(s"$aux/media")
      aux
    })

  /** q100: feature extraction over the persisted media fixture — the
    * typed-decode stage of the multimodal pipeline, graded end-to-end. */
  def q100(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val aux = mediaFixture(spark, dir)
    lastAuxFor.put("q100_media_features", aux)
    // the decode cost here was never parallelism (an explicit spread
    // measured SLOWER — the shuffle+sort of the payload bytes cost more
    // than it bought, guide §8); it was ImageIO's default DISK-backed
    // stream cache, fixed JVM-globally in [[Multimodal]]'s initializer
    // (r21: 2.5 s → 1.0 s exec in ProfileQuery)
    val media = spark.read.parquet(s"$aux/media")
      .as[MediaRecord]
    Multimodal.extractFeatures(media)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        col("format"), col("width"), col("height"), col("sample_rate"),
        col("duration_ms"))
      .orderBy(col("media_id"))
  }

  // ---- oracle SQL builders (DuckDB over the persisted BLOB column) ----

  /** Big-endian u32 read from hex string `h` at 0-based byte offset. */
  private def be32(off: String): String =
    s"('0x' || substr(h, 2*($off)+1, 8))::UBIGINT"

  /** Little-endian u32: the four hex pairs at the offset, reversed. */
  private def le32(off: String): String =
    s"""('0x' || substr(h, 2*($off)+7, 2) || substr(h, 2*($off)+5, 2) ||
       | substr(h, 2*($off)+3, 2) || substr(h, 2*($off)+1, 2))::UBIGINT"""
      .stripMargin.replaceAll("\n", "")

  /** FNV-1a 64-bit over the `len` bytes whose hex pairs are `hexExpr`:
    * fold (acc ^ byte) * prime mod 2^64 in HUGEINT (the 64×41-bit
    * product fits 128 bits; xor on the low byte only, which is all the
    * byte operand can touch). */
  private def crcSqlOver(hexExpr: String, lenExpr: String): String = {
    val byteList =
      s"""list_transform(range(0, $lenExpr), i ->
        | ((strpos('0123456789ABCDEF', substr($hexExpr, 2*i+1, 1))-1)*16
        |  + strpos('0123456789ABCDEF', substr($hexExpr, 2*i+2, 1))-1)::HUGEINT)"""
        .stripMargin.replaceAll("\n", "")
    val fold =
      s"""list_reduce(list_prepend(14695981039346656037::HUGEINT, $byteList),
         | (acc, x) -> ((acc - (acc % 256)
         |   + xor((acc % 256)::BIGINT, x::BIGINT)::HUGEINT)
         |   * 1099511628211) % 18446744073709551616::HUGEINT)"""
        .stripMargin.replaceAll("\n", "")
    s"""(CASE WHEN $fold >= 9223372036854775808::HUGEINT
       | THEN $fold - 18446744073709551616::HUGEINT
       | ELSE $fold END)::BIGINT""".stripMargin.replaceAll("\n", "")
  }

  /** The whole-payload checksum (q100's graded column). */
  private val crcSql: String = crcSqlOver("h", "octet_length(p)")

  /** The magic-byte sniff over hex pairs (hex() is uppercase). */
  private val sniffSql: String =
    """CASE WHEN substr(h, 1, 8) = '89504E47' THEN 'png'
      |     WHEN substr(h, 1, 6) = 'FFD8FF' THEN 'jpeg'
      |     WHEN substr(h, 1, 6) = '474946' THEN 'gif'
      |     WHEN substr(h, 1, 8) = '52494646'
      |          AND substr(h, 17, 8) = '57415645' THEN 'wav'
      |     WHEN substr(h, 9, 8) = '66747970' THEN 'mp4'
      |     ELSE 'unknown' END""".stripMargin

  def q100Sql(aux: String): String =
    s"""WITH m AS (
       |  SELECT media_id, kind, payload AS p, hex(payload) AS h
       |  FROM read_parquet('$aux/media/*.parquet')),
       |v AS (
       |  SELECT *,
       |         (strpos(h, '746B6864')-1)//2 + 4 AS tk,
       |         (strpos(h, '6D766864')-1)//2 + 4 AS mv
       |  FROM m)
       |SELECT media_id, kind,
       |       octet_length(p)::INT AS n_bytes,
       |       $crcSql AS checksum,
       |       $sniffSql AS format,
       |       CASE WHEN kind = 'image' THEN (${be32("16")})::INT
       |            WHEN kind = 'video' THEN ((${be32("tk+76")}) // 65536)::INT
       |            ELSE 0 END AS width,
       |       CASE WHEN kind = 'image' THEN (${be32("20")})::INT
       |            WHEN kind = 'video' THEN ((${be32("tk+80")}) // 65536)::INT
       |            ELSE 0 END AS height,
       |       CASE WHEN kind = 'audio' THEN (${le32("24")})::INT
       |            ELSE 0 END AS sample_rate,
       |       CASE WHEN kind = 'audio'
       |              THEN ((${le32("40")}) // 2) * 1000.0 / (${le32("24")})
       |            WHEN kind = 'video'
       |              THEN (${be32("mv+16")}) * 1000.0 / (${be32("mv+12")})
       |            ELSE 0.0 END AS duration_ms
       |FROM v ORDER BY media_id""".stripMargin

  // ---- q105: container-level frame sampling, graded -------------------

  private val FrameEvery = 2

  /** q105: the "sample every k-th frame" stage of a video pipeline over
    * the SAME persisted fixture as q100 — real ISO-BMFF sample-table
    * slicing (`stbl/stsz` sizes + `stbl/stco` chunk offset), no codec:
    * every 2nd frame's byte extent and FNV-1a checksum. The oracle
    * re-walks the container FROM THE BLOB — locates `stsz`/`stco` by
    * fourcc, reads the big-endian size table, prefix-sums the offsets,
    * slices the payload hex and refolds the checksum — so the JVM box
    * walk is graded against an independent parse of the same bytes.
    * Narrow per-partition flatMap on the Spark side: no shuffle, scales
    * with input. */
  def q105(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val aux = mediaFixture(spark, dir)
    lastAuxFor.put("q105_frame_samples", aux)
    val media = spark.read.parquet(s"$aux/media").as[MediaRecord]
    Multimodal.frameSamples(media, FrameEvery)
      .toDF()
      .orderBy(col("media_id"), col("frame_idx"))
  }

  def q105Sql(aux: String): String = {
    val frameHex = s"substr(h, 2*off+1, 2*sz)"
    s"""WITH m AS (
       |  SELECT media_id, hex(payload) AS h
       |  FROM read_parquet('$aux/media/*.parquet') WHERE kind = 'video'),
       |z AS (
       |  SELECT media_id, h,
       |         (strpos(h, '7374737A')-1)//2 + 4 AS sz_off,
       |         (strpos(h, '7374636F')-1)//2 + 4 AS co_off
       |  FROM m),
       |t AS (
       |  SELECT media_id, h, sz_off,
       |         (${be32("sz_off+8")})::INT AS n,
       |         ${be32("co_off+8")} AS chunk_off
       |  FROM z),
       |f AS (
       |  SELECT media_id, h, i,
       |         (${be32("sz_off+12+4*i")})::INT AS sz,
       |         (chunk_off
       |           + coalesce(list_sum(list_transform(range(i), j ->
       |               ${be32("sz_off+12+4*j")})), 0))::BIGINT AS off
       |  FROM t, unnest(range(n)) AS u(i)
       |  WHERE i % $FrameEvery = 0)
       |SELECT media_id, i::INT AS frame_idx, sz AS n_bytes,
       |       ${crcSqlOver(frameHex, "sz")} AS checksum
       |FROM f ORDER BY media_id, frame_idx""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q100_media_features" -> (q100 _),
    "q105_frame_samples" -> (q105 _))

  def oracles: Map[String, String] =
    Option(lastAuxFor.get("q100_media_features"))
      .map(a => "q100_media_features" -> q100Sql(a)).toMap ++
      Option(lastAuxFor.get("q105_frame_samples"))
        .map(a => "q105_frame_samples" -> q105Sql(a)).toMap
}
