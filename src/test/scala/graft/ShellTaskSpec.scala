package graft

import graft.pipeline.ShellTask

/** O1 contract (system_worker.py run_command analog): env injection,
  * stream capture, exit codes, timeout kill. */
class ShellTaskSpec extends SparkSpec {

  test("captures stdout, stderr, and exit code with injected env") {
    val r = ShellTask.run("echo \"v=$GRAFT_X\"; echo oops >&2; exit 3",
      env = Map("GRAFT_X" -> "42"))
    assert(r.exitCode == 3 && !r.timedOut)
    assert(r.stdout.trim == "v=42")
    assert(r.stderr.trim == "oops")
    assert(!r.ok)
  }

  test("ok on clean exit") {
    val r = ShellTask.run("true")
    assert(r.ok && r.exitCode == 0)
  }

  test("timeout kills the process and reports timedOut") {
    val t0 = System.nanoTime()
    val r = ShellTask.run("sleep 30", timeout = java.time.Duration.ofMillis(500))
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(r.timedOut && !r.ok)
    assert(elapsedMs < 10000, s"kill took ${elapsedMs}ms")
  }
}
