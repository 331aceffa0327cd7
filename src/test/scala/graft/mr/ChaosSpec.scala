package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** Drives [[graft.tools.ChaosCheck]] in its own JVM (task-retry count is
  * a SparkContext-level setting) — the port of the reference's
  * FAIL=n worker-failure validation (SURVEY.md §5.1). */
class ChaosSpec extends AnyFunSuite {
  test("job completes with identical output when every task's first attempt dies") {
    val java = s"${sys.props("java.home")}/bin/java"
    val cp = sys.props("java.class.path")
    val opens = Seq("--add-opens=java.base/java.lang=ALL-UNNAMED",
      "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
      "--add-opens=java.base/java.io=ALL-UNNAMED",
      "--add-opens=java.base/java.net=ALL-UNNAMED",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "--add-opens=java.base/java.util=ALL-UNNAMED",
      "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
      "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
      "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
      "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED")
    val out = new StringBuilder
    val rc = Process(Seq(java) ++ opens ++ Seq("-cp", cp, "graft.tools.ChaosCheck"))
      .!(ProcessLogger(l => out.append(l).append('\n'), l => ()))
    assert(rc === 0, out.toString)
    assert(out.toString.contains("CHAOS OK"), out.toString)
  }
}
