package graft

/** REPL eval loop semantics, driven without a terminal. */
class ReplSpec extends SparkSpec {

  private lazy val session: Session = {
    val s = Session(spark)
    s.registerFixtures(sfDir)
    s
  }

  test("executes SQL and renders a header + rows") {
    val out = Repl.execute(session, "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
    val lines = out.split("\n")
    assert(lines(0) == "r_regionkey\tr_name")
    assert(lines.length == 6) // header + 5 regions
  }

  test("truncates long results with a marker") {
    val out = Repl.execute(session, "SELECT l_orderkey FROM lineitem", maxRows = 5)
    val lines = out.split("\n")
    assert(lines.length == 7 && lines.last.startsWith("..."))
  }

  test("reports errors instead of crashing the loop") {
    val out = Repl.execute(session, "SELECT FROM nothing")
    assert(out.startsWith("error:"))
  }

  test(":explain renders the formatted physical plan without executing") {
    val out = Repl.execute(session,
      ":explain SELECT r_name FROM region WHERE r_regionkey = 2")
    assert(out.contains("Physical Plan"), out.take(200))
    assert(out.contains("PushedFilters"), "formatted plan should show pushdown")
    assert(!out.contains("\tAFRICA"), "must not execute the query")
    assert(Repl.execute(session, ":explain") == "usage: :explain <sql>")
  }
}
