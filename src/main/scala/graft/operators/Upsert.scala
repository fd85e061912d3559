package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** S5 — keyed upsert semantics (`update_one({key}, {$set}, upsert=True)`,
  * api_service/main.py:151 and three sibling sites) in batch form:
  * the replace-resolution arm of [[MergeInto]] ("latest wins"). Kept
  * as a named operator for the S5 surface; the implementation is
  * MergeInto's, so every upsert in the library shares one contract.
  */
object Upsert {
  /** `tiebreak` must make (key, version, tiebreak) a total order or
    * the surviving row is nondeterministic. */
  def latestWins(base: DataFrame, updates: DataFrame,
      key: Seq[String], version: Column, tiebreak: Column): DataFrame =
    MergeInto.mergeLatestWins(base, updates, key, version, tiebreak)
}
