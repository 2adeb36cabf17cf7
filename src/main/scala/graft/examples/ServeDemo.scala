package graft.examples
import org.apache.spark.sql.SparkSession
import graft.serving.RestServer
import graft.store.VectorStore
object ServeDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new VectorStore(spark)
    val server = new RestServer(store, 18432)
    server.start()
    println(s"[serve] listening on ${server.boundPort}")
    Thread.sleep(60000)
    server.stop(); spark.stop()
  }
}
