package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

/** Driver-side shell-task execution (reference O1: the Celery
  * `run_command(command, env_vars)` task, `airflow/mycelery/
  * system_worker.py:36-67` — subprocess with injected env, captured
  * stdout/stderr/exit code, 300 s timeout). The engine keeps the same
  * contract as a plain driver utility: orchestration stages that must
  * shell out (spark-submit wrappers, hdfs dfs calls in the reference) get
  * deterministic capture + timeout semantics, usable as a [[Dag]] stage
  * body. Cluster lifecycle itself (O2 docker compose) stays out of scope.
  */
object ShellTask {

  final case class Result(exitCode: Int, stdout: String, stderr: String,
                          timedOut: Boolean) {
    def ok: Boolean = exitCode == 0 && !timedOut
  }

  /** Runs `command` via /bin/sh -c with `env` overlaid on the parent
    * environment; kills the process tree on timeout (the reference's
    * 300 s default). */
  def run(command: String, env: Map[String, String] = Map.empty,
          timeout: java.time.Duration = java.time.Duration.ofSeconds(300)): Result = {
    val pb = new ProcessBuilder("/bin/sh", "-c", command)
    pb.environment().putAll(env.asJava)
    val proc = pb.start()
    val out = new ByteArrayOutputStream
    val err = new ByteArrayOutputStream
    val tOut = new Thread(() => proc.getInputStream.transferTo(out))
    val tErr = new Thread(() => proc.getErrorStream.transferTo(err))
    tOut.start(); tErr.start()
    val finished = proc.waitFor(timeout.toMillis, TimeUnit.MILLISECONDS)
    if (!finished) {
      proc.descendants().forEach(h => { h.destroyForcibly(); () })
      proc.destroyForcibly()
      proc.waitFor(5, TimeUnit.SECONDS)
    }
    tOut.join(5000); tErr.join(5000)
    Result(
      exitCode = if (finished) proc.exitValue() else -1,
      stdout = out.toString("UTF-8"),
      stderr = err.toString("UTF-8"),
      timedOut = !finished)
  }
}
