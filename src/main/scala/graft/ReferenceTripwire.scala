package graft

/** SURVEY §0 tripwire helper. The whole contract (SURVEY §2 + Appendix A
  * + BASELINE.json's metric) was derived while `/root/reference/` was
  * EMPTY; SURVEY §0 requires stopping and re-verifying §§1–6 the moment
  * it becomes populated. Shared between ReferenceTripwireSpec (hard test
  * failure) and Verify's preamble (loud stderr notice on every
  * correctness run) so the one event that could invalidate the contract
  * overnight cannot pass unnoticed.
  */
object ReferenceTripwire {
  def populatedFiles(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(root)) Seq.empty
    else {
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_)).toList
      finally s.close()
    }
  }

  def message(found: Seq[java.nio.file.Path]): String =
    s"/root/reference/ is POPULATED (${found.size} file(s), first: " +
      s"${found.headOption.getOrElse("?")}). The SURVEY §2 contract was " +
      "derived while it was empty — per SURVEY §0, STOP and re-verify " +
      "SURVEY §§1-6 against the actual reference before trusting any " +
      "declared query semantics."

  /** Non-fatal check for harness mains: a populated reference must not
    * zero a correctness round by itself, but it must be impossible to
    * miss in the logs. */
  def warnIfPopulated(): Unit = {
    val found = populatedFiles(java.nio.file.Paths.get("/root/reference"))
    if (found.nonEmpty) {
      val banner = "!" * 72
      System.err.println(s"$banner\n[SURVEY §0 TRIPWIRE] ${message(found)}\n$banner")
    }
  }
}
