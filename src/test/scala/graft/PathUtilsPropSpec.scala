package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PathUtils

/** Property-based coverage of the reference path semantics
  * (upload_file.py:50-133) — the example-based PathUtilsSpec pins the
  * documented cases; these properties pin the invariants for ALL
  * inputs (raw scalacheck driven from scalatest; the scalatestplus
  * bridge isn't on the classpath).
  */
class PathUtilsPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val segment = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val rawPath = for {
    segs <- Gen.nonEmptyListOf(segment)
    lead <- Gen.oneOf("", "/", "//")
    trail <- Gen.oneOf("", "/", "//")
    sep <- Gen.oneOf("/", "//")
  } yield lead + segs.mkString(sep) + trail

  test("cleanFolderName is idempotent and never keeps edge slashes") {
    check(Prop.forAll(rawPath) { p =>
      val c = PathUtils.cleanFolderName(p)
      PathUtils.cleanFolderName(c) == c &&
        !c.startsWith("/") && !c.endsWith("/") && !c.contains("//")
    })
  }

  test("combine output ends with the file and has no double slashes") {
    check(Prop.forAll(rawPath, segment) { (folder, name) =>
      val joined = PathUtils.combine(folder, name)
      joined.endsWith(name) && !joined.contains("//")
    })
  }

  test("enumerateDestinationFileName keeps the extension and embeds N") {
    check(Prop.forAll(segment, Gen.choose(1, 999)) { (base, n) =>
      PathUtils.enumerateDestinationFileName(s"$base.csv", n) ==
        s"${base}_$n.csv" &&
        PathUtils.enumerateDestinationFileName(base, n) == s"${base}_$n"
    })
  }
}
