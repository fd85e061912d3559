package graft

/** Top-level row types for tests (Spark encoders cannot handle case
  * classes nested inside a test class). */
case class RawRow(matchId: String, puuid: String, timestamp: Long)
case class SilverLite(puuid: String, champion: String, win: Boolean, kda: Double)
