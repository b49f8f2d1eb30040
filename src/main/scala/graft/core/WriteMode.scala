package graft.core

/** The five write modes of the reference sink
  * (`/root/reference/src/agol_pandas.py:361-363`), with the key-requirement
  * rules of `src/agol_pandas.py:398-407`:
  *
  *  - Append: add all rows, duplicates allowed.
  *  - Overwrite: truncate the target, then append (server-side truncate,
  *    `src/agol_pandas.py:395-396`).
  *  - Upsert: match on key — update matched rows, insert unmatched.
  *  - Update: match on key — update matched rows only (`skip_inserts`).
  *  - Insert: match on key — insert unmatched rows only (`skip_updates`).
  *
  * Upsert/Update/Insert require a key column (the reference's
  * `upsert_column`) and a unique index on the target.
  */
sealed abstract class WriteMode(val name: String) {
  def requiresKey: Boolean = this match {
    case WriteMode.Upsert | WriteMode.Update | WriteMode.Insert => true
    case _                                                      => false
  }
}

object WriteMode {
  case object Append    extends WriteMode("append")
  case object Overwrite extends WriteMode("overwrite")
  case object Upsert    extends WriteMode("upsert")
  case object Update    extends WriteMode("update")
  case object Insert    extends WriteMode("insert")

  val all: Seq[WriteMode] = Seq(Append, Overwrite, Upsert, Update, Insert)

  def parse(s: String): Either[String, WriteMode] =
    all.find(_.name == s.trim.toLowerCase) match {
      case Some(m) => Right(m)
      case None =>
        Left(s"invalid mode '$s': must be one of ${all.map(_.name).mkString(", ")}")
    }

  /** Mode/key validation, mirroring `src/agol_pandas.py:361-363,398-401`. */
  def validate(mode: WriteMode, key: Option[String]): Either[String, Unit] =
    if (mode.requiresKey && key.isEmpty)
      Left(s"mode '${mode.name}' requires a key column (upsert_column)")
    else Right(())
}
