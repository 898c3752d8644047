package graft.queries

/** One pack per SURVEY.md §2 operator family. `queries` keys and `oracle`
  * keys must line up (oracle may omit non-SQL-expressible ops — the driver
  * then records a weaker rows-only check). */
trait QueryPack {
  def queries: Map[String, QFn]
  def oracle: Map[String, String]
}
