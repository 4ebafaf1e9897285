package graft

object Scratch {
  def main(args: Array[String]): Unit = {
    queries.Registry.all.foreach(q => println(s"${q.name}\t${q.bench}"))
  }
}
