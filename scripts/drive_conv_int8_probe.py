"""Probe: do int8 convolutions beat bf16 convs on this chip at the
SPADE render's shapes? Decides whether an int8 render engine
(serving/gan_int8) is worth building — the int8 MXU rate is 2.5x bf16
for DENSE matmuls (ops/quant.py), but conv lowering may differ.

Times y = conv3x3(x) at (B=64, 128, 128, 32->128) and
(B=64, 256, 256, 32->32), loop-carried to defeat hoisting, in bf16 and
int8(int32 accum).

Usage: python scripts/drive_conv_int8_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    K_SMALL, K_BIG = 2, 10

    def conv(x, w, acc_t):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_t)

    def bench_case(B, H, Cin, Cout, dtype, acc_t, label):
        rng = np.random.RandomState(0)
        if dtype == jnp.int8:
            x = jnp.asarray(rng.randint(-127, 127, (B, H, H, Cin)), jnp.int8)
            w = jnp.asarray(rng.randint(-127, 127, (3, 3, Cin, Cout)),
                            jnp.int8)
        else:
            x = jnp.asarray(rng.randn(B, H, H, Cin), dtype)
            w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.05, dtype)

        @jax.jit
        def run(x, w, ks, seed):
            def body(carry, _):
                y = conv((x + carry.astype(x.dtype)), w, acc_t)
                # cast back so the carry keeps the input dtype domain
                s = (y.astype(jnp.float32).mean() * 1e-6)
                return carry + s, ()

            c, _ = jax.lax.scan(body, seed, ks)
            return c

        def t(k):
            ks = jnp.zeros((k, 1))
            float(run(x, w, ks, jnp.float32(0.0)))
            best = float("inf")
            for r in range(3):
                t0 = time.time()
                float(run(x, w, ks, jnp.float32(r)))
                best = min(best, time.time() - t0)
            return best

        per = (t(K_BIG) - t(K_SMALL)) / (K_BIG - K_SMALL)
        flops = 2 * B * H * H * 9 * Cin * Cout
        print(f"{label:28s}: {per*1e3:8.3f} ms  "
              f"{flops/per/1e12:7.1f} eff-TFLOP/s", flush=True)
        return per

    for (B, H, Cin, Cout) in ((64, 128, 32, 128), (64, 256, 32, 32)):
        b = bench_case(B, H, Cin, Cout, jnp.bfloat16, jnp.float32,
                       f"bf16 conv {H}x{H} {Cin}->{Cout}")
        i = bench_case(B, H, Cin, Cout, jnp.int8, jnp.int32,
                       f"int8 conv {H}x{H} {Cin}->{Cout}")
        print(f"  int8/bf16 speedup: {b/i:.2f}x", flush=True)


if __name__ == "__main__":
    main()
