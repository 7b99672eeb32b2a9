"""Compile-and-run probe of the Pallas echo kernel on real TPU hardware."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np, math
from nis_sar_amtigmti_video_tpu.ops.pallas.echo_kernel import echo_accumulate

rng = np.random.default_rng(0)
P, B, Ns = 32, 16, 256
tau = jnp.asarray(rng.uniform(0.2e-6, 1e-6, (P, B)).astype(np.float32))
car = jnp.asarray(rng.uniform(-np.pi, np.pi, (P, B)).astype(np.float32))
amp = jnp.asarray(rng.uniform(0.5, 2.0, (P, B)).astype(np.float32))
tf = jnp.asarray((np.arange(Ns) / 60e6).astype(np.float32))
t0 = time.time()
try:
    out = echo_accumulate(tau, car, amp, tf, k_pi=math.pi * 150e6 / 2e-6,
                          shift=1e-6, half=1e-6)
    got = float(jnp.sum(jnp.abs(out)))
    # reference value from the direct formula
    arg = np.asarray(tf)[None, None, :] - np.asarray(tau)[:, :, None] - 1e-6
    gate = np.abs(arg) <= 1e-6
    ph = np.asarray(car)[:, :, None] + math.pi * 150e6 / 2e-6 * arg ** 2
    want = np.abs(np.sum(np.where(gate, np.asarray(amp)[:, :, None], 0)
                         * np.exp(1j * ph), axis=1)).sum()
    print("PALLAS ECHO OK on %s: got=%.3f want=%.3f in %.0fs"
          % (jax.devices()[0], got, want, time.time() - t0))
except Exception as e:
    print("PALLAS ECHO FAILED after %.0fs:" % (time.time() - t0),
          type(e).__name__)
    print(str(e)[-2000:])
