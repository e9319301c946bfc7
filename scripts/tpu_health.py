"""Quick TPU relay health check: times a fixed 4096^3 bf16 matmul chain
with per-call readback.  Healthy v5e via this relay: ~2-4 ms/call.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 1, (n, n)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def mm(x, i):
        return x @ x * (1.0 + i * 1e-9)

    x = mm(a, 0.0)
    _ = float(jax.device_get(x[0, 0]))
    times = []
    for i in range(5):
        t0 = time.time()
        x = mm(x, float(i))
        _ = float(jax.device_get(x[0, 0]))
        times.append(time.time() - t0)
    ms = min(times) * 1e3
    tf = 2 * n**3 / (min(times)) / 1e12
    print(f"matmul {n}^3 bf16: {ms:.1f} ms/call ({tf:.0f} TFLOPS) "
          f"{'HEALTHY' if tf > 60 else 'DEGRADED'}")


if __name__ == "__main__":
    main()
