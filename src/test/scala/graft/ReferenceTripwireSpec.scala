package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §0 tripwire. The entire contract (SURVEY §2 + Appendix A +
  * BASELINE.json's metric) was derived while `/root/reference/` was EMPTY
  * — zero files, no network, no cached copy of ctds-usyd/scopus anywhere
  * on disk. SURVEY §0's standing instruction is: *"If a later session
  * finds `/root/reference/` populated: stop and re-verify §§1–6 against
  * it before trusting this document."*
  *
  * That instruction previously had no automated teeth — the one event
  * that could invalidate the whole contract overnight (the same class as
  * the round-7 testdata regeneration, which cost a full round) would have
  * gone unnoticed. This spec fails LOUDLY the moment any regular file
  * appears under the reference root, with a message pointing at SURVEY §0
  * so the session that trips it knows exactly what to do.
  */
class ReferenceTripwireSpec extends AnyFunSuite {

  test("/root/reference/ is still empty — SURVEY §0 contract basis holds") {
    val found = ReferenceTripwire.populatedFiles(
      java.nio.file.Paths.get("/root/reference"))
    assert(found.isEmpty, ReferenceTripwire.message(found))
  }

  test("the tripwire flips when a file is planted (self-test on a temp dir)") {
    val dir = java.nio.file.Files.createTempDirectory("tripwire_probe")
    try {
      assert(ReferenceTripwire.populatedFiles(dir).isEmpty,
        "fresh temp dir must read as empty")
      val sub = java.nio.file.Files.createDirectory(dir.resolve("src"))
      assert(ReferenceTripwire.populatedFiles(dir).isEmpty,
        "bare directories do not count as population")
      val planted = java.nio.file.Files.write(sub.resolve("main.py"),
        "print()\n".getBytes("UTF-8"))
      val found = ReferenceTripwire.populatedFiles(dir)
      assert(found.map(_.getFileName.toString) === Seq("main.py"),
        "a planted file must be detected")
      assert(ReferenceTripwire.message(found).contains("SURVEY") &&
        ReferenceTripwire.message(found).contains("re-verify"),
        "the failure message must point at the SURVEY §0 re-verification step")
      java.nio.file.Files.delete(planted)
      java.nio.file.Files.delete(sub)
    } finally java.nio.file.Files.deleteIfExists(dir)
  }
}
