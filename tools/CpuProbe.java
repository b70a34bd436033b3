public class CpuProbe {
  // pure-register xorshift loop: zero memory traffic - if N threads of THIS
  // don't scale, the vCPUs themselves are capped (hypervisor), not the bus
  static long spin(long seed, long iters) {
    long x = seed | 1;
    for (long i = 0; i < iters; i++) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; }
    return x;
  }
  public static void main(String[] a) throws Exception {
    int threads = Integer.parseInt(a[0]);
    long iters = 2_000_000_000L;
    Thread[] ts = new Thread[threads];
    long[] sink = new long[threads];
    long t0 = System.nanoTime();
    for (int i = 0; i < threads; i++) {
      final int k = i;
      ts[i] = new Thread(() -> sink[k] = spin(k + 1, iters));
      ts[i].start();
    }
    for (Thread t : ts) t.join();
    double secs = (System.nanoTime() - t0) / 1e9;
    long s = 0; for (long v : sink) s += v;
    System.out.printf("{\"threads\": %d, \"seconds\": %.2f, \"giters_per_sec\": %.2f, \"sink\": %d}%n",
      threads, secs, threads * (iters / 1e9) / secs, s);
  }
}
