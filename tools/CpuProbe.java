import java.util.concurrent.*;
public class CpuProbe {
  static long burn(long iters) { long x=1; for(long i=0;i<iters;i++){ x = x*6364136223846793005L + 1442695040888963407L; } return x; }
  public static void main(String[] a) throws Exception {
    for (int threads : new int[]{8, 32, 8, 32}) {
      ExecutorService ex = Executors.newFixedThreadPool(threads);
      long t0 = System.nanoTime();
      CountDownLatch l = new CountDownLatch(threads*4);
      for (int i=0;i<threads*4;i++) ex.submit(() -> { burn(400_000_000L); l.countDown(); });
      l.await();
      double sec = (System.nanoTime()-t0)/1e9;
      System.out.printf("threads=%d tasks=%d sec=%.2f work/sec=%.1f%n", threads, threads*4, sec, threads*4/sec);
      ex.shutdown();
    }
  }
}
