package graft.dev

/** Dev-only: print PgMerge's generated SQL as JSON so dev/pgmerge_check.py
  * executes the LIBRARY's statements (not a drifting copy) against DuckDB.
  * Not part of the driver contract. */
object DumpMergeSql {
  def main(args: Array[String]): Unit = {
    val scratch = if (args.nonEmpty) args(0) else "scratch"
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    println(s"""{"table": ${q(graft.sinks.PgMerge.table)}, """ +
      s""""constraint": ${q(graft.sinks.PgMerge.constraint)}, """ +
      s""""upsert": ${q(graft.sinks.PgMerge.upsertSql(scratch))}, """ +
      s""""mark_deleted": ${q(graft.sinks.PgMerge.markDeletedSql(scratch))}}""")
  }
}
