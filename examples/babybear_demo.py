"""BabyBear field comparison demo (examples/babybear_demo.zig port, with
actual measurements instead of printed claims): BabyBear vs Goldilocks
multiplication throughput on host, and the TPU Montgomery lanes."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zigz_tpu.core.field import BabyBear, Goldilocks


def host_throughput(F, n=200_000):
    a = F(123456789 % F.MODULUS)
    b = F(987654321 % F.MODULUS)
    t0 = time.perf_counter()
    acc = a
    for _ in range(n):
        acc = acc.mul(b)
    dt = time.perf_counter() - t0
    return n / dt, acc


def main():
    print(f"BabyBear:   p = {BabyBear.MODULUS} = 2^31 - 2^27 + 1")
    print(f"Goldilocks: p = {Goldilocks.MODULUS:#x} = 2^64 - 2^32 + 1")

    bb_rate, _ = host_throughput(BabyBear)
    gl_rate, _ = host_throughput(Goldilocks)
    print(f"\nhost scalar mul: BabyBear {bb_rate / 1e6:.2f} Mops/s, "
          f"Goldilocks {gl_rate / 1e6:.2f} Mops/s (x{bb_rate / gl_rate:.2f})")

    if "--device" in sys.argv:
        import jax, jax.numpy as jnp
        from zigz_tpu.ops import babybear as bb

        n = 1 << 22
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(0, bb.P, size=n, dtype=np.uint32))
        bv = jnp.asarray(rng.integers(0, bb.P, size=n, dtype=np.uint32))

        @jax.jit
        def chain(x, y):
            for _ in range(8):
                x = bb.mont_mul(x, y)
            return x

        out = chain(a, bv)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = chain(out, bv)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"device mont_mul ({jax.default_backend()}): "
              f"{reps * 8 * n / dt / 1e9:.2f} Gops/s")


if __name__ == "__main__":
    main()
