// Allocation+copy bandwidth microbenchmark (BENCH/BASELINE.md §1c).
// Fixed TOTAL work split across T threads: each slice repeatedly
// allocates a fresh 1 MiB byte array and fills it — the memory profile
// of inflate/parse/String-building in an extraction kernel.
// Usage: java AllocBench <threads> <totalGiB>
// Prints: ALLOC <threads> <sec> <GBps>
public final class AllocBench {
  public static void main(String[] args) throws Exception {
    final int threads = Integer.parseInt(args[0]);
    final long totalBytes = (long) (Double.parseDouble(args[1]) * (1L << 30));
    final long perThread = totalBytes / threads;
    // warmup (JIT) on one thread, small slice
    fill(1L << 28);
    long t0 = System.nanoTime();
    Thread[] ts = new Thread[threads];
    for (int i = 0; i < threads; i++) {
      ts[i] = new Thread(() -> fill(perThread));
      ts[i].start();
    }
    for (Thread t : ts) t.join();
    double sec = (System.nanoTime() - t0) / 1e9;
    double gbps = (perThread * (double) threads) / 1e9 / sec;
    System.out.printf("ALLOC %d %.3f %.2f%n", threads, sec, gbps);
  }

  static volatile long sink;

  private static void fill(long bytes) {
    long done = 0;
    long acc = 0;
    while (done < bytes) {
      byte[] a = new byte[1 << 20];
      java.util.Arrays.fill(a, (byte) 0x5a);
      acc += a[(int) (done & 0xFFF)];
      done += a.length;
    }
    sink = acc;
  }
}
