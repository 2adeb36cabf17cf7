package graft.examples
import graft.serving.RestServer
import graft.store.VectorStore
object ServeDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4, "graft-serve-demo")
    val store = new VectorStore(spark)
    val server = new RestServer(store, 18432)
    server.start()
    println(s"[serve] listening on ${server.boundPort}")
    Thread.sleep(60000)
    server.stop(); spark.stop()
  }
}
