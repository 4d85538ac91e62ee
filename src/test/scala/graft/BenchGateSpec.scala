package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** The drift-reference loader is the site of two past defects (a
  * swallowed non-local return in r15's review, and the r15 advice's
  * exact-string sf guard), so its skip/fallback behavior gets a unit
  * spec of its own: newest-first selection, sf-mismatch skip,
  * unparsable-newest skip, path-spelling equivalence, and the pinned
  * fallback when nothing qualifies. No SparkSession needed.
  */
class BenchGateSpec extends AnyFunSuite {

  private def refJson(sf: String, q01: Double = 0.4): String = {
    val qs = Bench.driftSentinelNames.map(n => s""""$n":$q01""").mkString(",")
    s"""{"value":5.0,"flagship_headline_total":10.0,"sf":"$sf","queries":{$qs}}"""
  }

  private def withDir(f: Path => Unit): Unit = {
    val d = Files.createTempDirectory("graft-benchgate")
    try f(d)
    finally {
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(Files.deleteIfExists(_))
    }
  }

  test("picks the newest prior-round file with a matching sf") {
    withDir { d =>
      Files.writeString(d.resolve("BENCH_QUERIES_r12.json"), refJson("/tmp/sfX"))
      Files.writeString(d.resolve("BENCH_QUERIES_r14.json"), refJson("/tmp/sfX", q01 = 0.8))
      val ref = Bench.loadDriftRef(d, currentRound = 16, sfDir = "/tmp/sfX")
      assert(ref.round == 14)
      assert(ref.rawHeadline == 5.0 && ref.flagshipHeadline == 10.0)
      assert(ref.sentinels.toMap.apply("q01_pricing_summary") == 0.8)
    }
  }

  test("never self-references: files at or above currentRound are ignored") {
    withDir { d =>
      Files.writeString(d.resolve("BENCH_QUERIES_r16.json"), refJson("/tmp/sfX"))
      Files.writeString(d.resolve("BENCH_QUERIES_r13.json"), refJson("/tmp/sfX"))
      val ref = Bench.loadDriftRef(d, currentRound = 16, sfDir = "/tmp/sfX")
      assert(ref.round == 13)
    }
  }

  test("sf mismatch skips to the next-newest matching file") {
    withDir { d =>
      // the newest anchor is a 25x scale A/B — must not become the
      // sf0.1 gate's reference
      Files.writeString(d.resolve("BENCH_QUERIES_r15.json"), refJson("/tmp/scale25x"))
      Files.writeString(d.resolve("BENCH_QUERIES_r14.json"), refJson("/tmp/sfX"))
      val ref = Bench.loadDriftRef(d, currentRound = 16, sfDir = "/tmp/sfX")
      assert(ref.round == 14)
    }
  }

  test("equivalent path spellings of the same sf dir still match") {
    withDir { d =>
      val sfDir = Files.createDirectory(d.resolve("sfY")).toString
      // trailing slash + a dot segment: exact string equality would
      // discard this anchor and silently regress to the r13 constants
      Files.writeString(d.resolve("BENCH_QUERIES_r15.json"),
        refJson(s"$sfDir/"))
      val ref = Bench.loadDriftRef(d, currentRound = 16,
        sfDir = s"$d/./sfY")
      assert(ref.round == 15)
    }
  }

  test("unparsable newest file skips to the next-newest, not to fallback") {
    withDir { d =>
      Files.writeString(d.resolve("BENCH_QUERIES_r15.json"), "{not json at all")
      Files.writeString(d.resolve("BENCH_QUERIES_r14.json"), refJson("/tmp/sfX"))
      val ref = Bench.loadDriftRef(d, currentRound = 16, sfDir = "/tmp/sfX")
      assert(ref.round == 14)
    }
  }

  test("fewer than 5 sentinel values disqualifies a candidate") {
    withDir { d =>
      val few = Bench.driftSentinelNames.take(3)
        .map(n => s""""$n":0.4""").mkString(",")
      Files.writeString(d.resolve("BENCH_QUERIES_r15.json"),
        s"""{"value":5.0,"sf":"/tmp/sfX","queries":{$few}}""")
      Files.writeString(d.resolve("BENCH_QUERIES_r14.json"), refJson("/tmp/sfX"))
      val ref = Bench.loadDriftRef(d, currentRound = 16, sfDir = "/tmp/sfX")
      assert(ref.round == 14)
    }
  }

  test("no qualifying candidate falls back to the pinned r13 constants") {
    withDir { d =>
      Files.writeString(d.resolve("BENCH_QUERIES_r15.json"), refJson("/tmp/other-sf"))
      val ref = Bench.loadDriftRef(d, currentRound = 16, sfDir = "/tmp/sfX")
      assert(ref.round == 13)
      assert(ref.sentinels == Bench.driftSentinelsR13)
      // the r13 file predates the raw/flagship fields: gate ratios must
      // read -1 rather than a fabricated number
      assert(ref.rawHeadline == -1.0 && ref.flagshipHeadline == -1.0)
    }
  }
}
