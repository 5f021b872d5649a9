package graft

import org.apache.spark.sql.DataFrame

/** Additive schema evolution — the constructive half of A7's drift handling.
  *
  * The reference lists ALTER TABLE support as a TODO (README.md:55-58) and
  * QUARANTINES any table whose rows disagree on the present-field
  * fingerprint (dump2csv.py:78-87) — safe, but it stalls the pipeline for
  * the most common drift in practice: a column ADDED with no default, where
  * old rows simply lack the field. This module classifies that case and
  * lets it flow: versions whose field sets form a chain under inclusion
  * compact/dump in the widest schema with NULLs for the missing tail;
  * anything else (type conflicts, renamed/removed fields) stays in the
  * quarantine class and fails fast.
  *
  * Spark shape: the union is `unionByName(allowMissingColumns = true)` —
  * pure plan surgery, no shuffle, no extra scan; the compacted/stored state
  * widens lazily (parquet `mergeSchema` on read, see
  * [[graft.streaming.CdcStream.readState]]), so evolution never rewrites
  * settled data.
  */
object Evolve {

  /** True iff the fingerprints (comma-joined field-name lists, the A7
    * drift-grouping key) form a chain under set inclusion — i.e. every
    * schema version is a prefix of the widest: purely ADDITIVE drift.
    * Disjoint or conflicting field sets (a rename, a removal alongside an
    * add) are not chains and must quarantine.
    */
  def isAdditiveChain(fps: Seq[String]): Boolean = {
    val sets = fps.map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet)
      .distinct.sortBy(_.size)
    sets.lazyZip(sets.drop(1)).forall { case (a, b) => a.subsetOf(b) }
  }

  /** Union schema versions of one logical table into the widest schema.
    * Shared columns must agree on type — a type conflict is REAL drift
    * (the quarantine class), so it fails fast with the offending column
    * instead of silently casting. Columns absent from a version fill as
    * NULL, which is exactly the semantics of an ALTER TABLE ADD COLUMN
    * with no default: pre-existing rows have no value.
    */
  def additiveUnion(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "additiveUnion of zero frames")
    val seen =
      scala.collection.mutable.LinkedHashMap[String, org.apache.spark.sql.types.DataType]()
    for (f <- frames; fld <- f.schema.fields) seen.get(fld.name) match {
      case Some(t) if t != fld.dataType =>
        throw new IllegalArgumentException(
          s"conflicting drift on column '${fld.name}': $t vs ${fld.dataType}" +
            " — not additive; quarantine this table")
      case Some(_) => ()
      case None => seen(fld.name) = fld.dataType
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
