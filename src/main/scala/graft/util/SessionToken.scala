package graft.util

import org.apache.spark.sql.SparkSession

/** A guaranteed-unique, stable token per live SparkSession, for use in
  * per-session artifact-cache keys. `System.identityHashCode` is NOT
  * unique — two sessions can collide and one would receive a
  * localCheckpointed DataFrame bound to the other (possibly stopped)
  * session. The WeakHashMap keys on the session OBJECT (SparkSession
  * does not override equals, so lookups are identity-based) and lets
  * entries vanish when a session is garbage-collected.
  */
object SessionToken {
  private val tokens = new java.util.WeakHashMap[SparkSession, String]()

  def apply(s: SparkSession): String = tokens.synchronized {
    val t = tokens.get(s)
    if (t != null) t
    else {
      val fresh = java.util.UUID.randomUUID().toString
      tokens.put(s, fresh)
      fresh
    }
  }
}
