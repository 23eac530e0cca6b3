package graft
/** One-shot probe of the three Bench calibrations (no Spark session). */
object CalibProbe {
  def xorshiftFold(seed: Long): Long = {
    var x = seed; var i = 0
    while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }
  def main(a: Array[String]): Unit = {
    val sink = new java.util.concurrent.atomic.LongAdder
    def st(): Double = { val t0=System.nanoTime(); sink.add(xorshiftFold(1L)); (System.nanoTime()-t0)/1e9 }
    def mt(n: Int): Double = {
      val t0=System.nanoTime()
      val ts=(1 to n).map(i=>new Thread(()=>sink.add(xorshiftFold(i))))
      ts.foreach(_.start()); ts.foreach(_.join()); (System.nanoTime()-t0)/1e9
    }
    val MB=64
    val arrays=(1 to 32).map(_=>Array.fill(MB*131072)(1L))
    def mem(): Double = {
      val t0=System.nanoTime()
      val ts=arrays.map{arr=>new Thread(()=>{var s=0L;var r=0;while(r<4){var i=0;while(i<arr.length){s+=arr(i);i+=1};r+=1};sink.add(s)})}
      ts.foreach(_.start()); ts.foreach(_.join())
      32.0*MB*4/1024/((System.nanoTime()-t0)/1e9)
    }
    st(); mem()
    println(f"== st=${math.min(st(),st())}%.3f mt32=${math.min(mt(32),mt(32))}%.3f mem=${math.max(mem(),mem())}%.1f GB/s")
  }
}
