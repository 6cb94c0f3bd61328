package graft.examples

/** The reference's consolidation indexes
  * (`/root/reference/examples/basics/README.md`,
  * `examples/query-basics/README.md`, `examples/advanced/README.md`):
  * each gathers a set of legacy samples under one entry point. Their
  * graft mirrors are runnable tours that execute the constituent
  * examples in sequence — same grouping, live instead of a README.
  */
object BasicsTour {
  /** basics = hello-world + basic-produce-consume. */
  def main(args: Array[String]): Unit = {
    println("== basics 1/2: hello-world ==")
    HelloWorld.main(args)
    println("== basics 2/2: basic-produce-consume ==")
    BasicProduceConsume.main(args)
  }
}

object QueryBasicsTour {
  /** query-basics = query-filter + view-toquery. */
  def main(args: Array[String]): Unit = {
    println("== query-basics 1/2: query-filter ==")
    QueryFilter.main(args)
    println("== query-basics 2/2: view-toquery ==")
    ViewToQuery.main(args)
  }
}

object AdvancedTour {
  /** advanced = daily-comparison + oss-bars-verify. */
  def main(args: Array[String]): Unit = {
    println("== advanced 1/2: daily-comparison ==")
    DailyComparison.main(args)
    println("== advanced 2/2: oss-bars-verify ==")
    OssBarsVerify.main(args)
  }
}
