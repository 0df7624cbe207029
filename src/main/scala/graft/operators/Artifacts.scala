package graft.operators

import org.apache.spark.sql.SparkSession

/** Naming + existence discipline shared by every persisted
  * settled-corpus artifact (dedup prefix/df tables, ANN indexes, the
  * mutual-kNN edge table): the table name carries a strong hash of the
  * FULL build key, and presence is decided by the session CATALOG, not a
  * JVM memo map.
  *
  * Both halves fix observed failure modes of the earlier per-object
  * `TrieMap` + `abs(hashCode)` pattern: a memo map goes stale when a
  * second SparkSession in the same JVM loses the first session's tables
  * (the cached name then resolves to nothing), and 32-bit `hashCode`
  * names can collide across distinct corpora, silently serving one
  * corpus's artifact to another.
  */
private[graft] object Artifacts {

  /** 96-bit hex digest of the build key — collision-safe table-name
    * suffix (and only [a-f0-9], so always a legal identifier chunk). */
  def key(parts: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(parts.getBytes("UTF-8")).take(12).map(b => f"$b%02x").mkString

  /** Build-once guard: runs `build` iff any of `tables` is absent from
    * the session catalog, serialized PER ARTIFACT (keyed on the first
    * table name) so concurrent first callers cannot race the write while
    * unrelated artifacts still build in parallel. The catalog lookup is
    * the source of truth — calling this again after a session rebuild
    * transparently re-creates the artifact. */
  def ensure(s: SparkSession, tables: Seq[String])(build: => Unit): Unit =
    locks.computeIfAbsent(tables.head, _ => new Object).synchronized {
      if (!tables.forall(s.catalog.tableExists)) build
    }

  private[this] val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}
