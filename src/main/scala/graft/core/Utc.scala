package graft.core

/** Timezone-proof timestamp literals.
  *
  * `java.sql.Timestamp.valueOf` parses wall-clock text in the JVM
  * DEFAULT timezone, but every oracle replays the same constant as a
  * naive DuckDB `TIMESTAMP` literal compared against UTC-normalized
  * event micros — so the engine/oracle agreement held only because the
  * rig's JVM happens to default to UTC. This helper constructs the
  * instant from the wall-clock text AT UTC explicitly, so the literal
  * means the same micros on any host regardless of `user.timezone`
  * (the session pins `spark.sql.session.timeZone=UTC`, which governs
  * rendering/extraction but NOT how a JVM `Timestamp` object's instant
  * was constructed).
  */
object Utc {
  def ts(wall: String): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(wall.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC))
}
